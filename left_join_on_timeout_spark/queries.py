"""Query registry: one named query per implemented operator (SURVEY.md §2),
each with a DuckDB-oracle SQL twin.

Contract (driver): every entry in QUERIES is ``name -> fn(spark, sf_dir) ->
DataFrame``; ORACLE[name] is ANSI SQL DuckDB runs over the same parquet
views. Column names are aliased identically on both sides; computed doubles
are rounded to a fixed scale and money aggregates use DECIMAL so the
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.timeout_join import (
    left_join_on_timeout,
    timeout_only,
    window_inner_join,
)
from left_join_on_timeout_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


def _events_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Flagship fixture (FIXTURES.md F6): views = left stream, purchases =
    right stream, keyed by user_id with event-time ts."""
    events = load_table(spark, sf_dir, "events")
    left = events.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts")
    right = events.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts")
    return left, right


def _concat_joiner(l: DataFrame, r: DataFrame) -> F.Column:
    """The reference test's ValueJoiner (O7): `lhs + "+" + rhs` on match,
    `lhs + "+"` on timeout (LeftJoinOnTimeoutTest.java:205)."""
    return F.when(
        r["event_id"].isNull(),
        F.concat(l["event_id"].cast("string"), F.lit("+")),
    ).otherwise(
        F.concat(l["event_id"].cast("string"), F.lit("+"),
                 r["event_id"].cast("string"))
    )


def _flagship_oracle(tier: str | None = None) -> str:
    """The shared flagship SQL; with ``tier`` set, a constant tier column
    joins the SELECT list so the *adjudicated execution tier* is part of
    the driver's value hash — a fallback tier silently engaging can no
    longer be attributed to the advertised one (VERDICT r5 item 4)."""
    tier_col = f",\n       '{tier}' AS tier" if tier else ""
    return f"""
SELECT l.user_id AS user_id,
       l.event_id AS event_id,
       l.ts AS ts,
       r.event_id AS r_event_id,
       CASE WHEN r.event_id IS NULL
            THEN CAST(l.event_id AS VARCHAR) || '+'
            ELSE CAST(l.event_id AS VARCHAR) || '+' || CAST(r.event_id AS VARCHAR)
       END AS joined{tier_col}
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') l
LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
"""


_FLAGSHIP_ORACLE = _flagship_oracle()


@query("timeout_left_join", _FLAGSHIP_ORACLE)
def q_timeout_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — LEFT JOIN ON TIMEOUT (flagship). view left-joins purchase per
    user within ±30 min; unmatched views are the 'timeout' emissions with
    the original left event timestamp."""
    left, right = _events_split(spark, sf_dir)
    out = left_join_on_timeout(
        left, right, on="user_id", window="30 minutes",
        joiner=_concat_joiner,
    )
    return out.select("user_id", "event_id", "ts", "r_event_id", "joined")


@query("stream_timeout_left_join", _FLAGSHIP_ORACLE)
def q_stream_timeout_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 streaming form — the same flagship semantics through the *real*
    streaming plan (file source → watermarked stream-stream leftOuter
    join → sink), drained deterministically and hash-checked against the
    identical SQL oracle as the batch form. This is the reference's
    actual operating mode (a Kafka Streams topology)."""
    from left_join_on_timeout_spark.streaming.harness import (
        run_timeout_join_stream,
    )
    left, right = _events_split(spark, sf_dir)
    out = run_timeout_join_stream(
        spark, left, right, on="user_id", window="30 minutes",
        joiner=_concat_joiner)
    return out.select("user_id", "event_id", "ts", "r_event_id", "joined")


@query("timer_timeout_left_join", _flagship_oracle("timer"))
def q_timer_timeout_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 exact-timer form (SURVEY M3) — the same flagship semantics
    through the reference's literal mechanism: per-key timer state via
    ``applyInPandasWithState`` (schedule O4 / cancel O5 / timeout-emit
    O6), run in SQL mode (cancel only the matched left) so the drained
    output hash-matches the identical oracle as the other two tiers.
    The constant ``tier`` column puts the executed tier in the value
    hash (VERDICT r5 item 4)."""
    from left_join_on_timeout_spark.streaming.harness import (
        run_timer_join_stream,
    )
    left, right = _events_split(spark, sf_dir)
    out = run_timer_join_stream(
        spark, left, right, on="user_id", window="30 minutes",
        joiner=_concat_joiner)
    return (out.select("user_id", "event_id", "ts", "r_event_id", "joined")
            .withColumn("tier", F.lit("timer")))


@query("tws_timeout_left_join", _flagship_oracle("tws"))
def q_tws_timeout_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 native-timer form — the same flagship semantics through PySpark
    4.x ``transformWithStateInPandas`` (``StatefulProcessor`` + ListState
    multimap + one native timer per scheduled left), the closest
    structural match to the reference's ``ScheduledStateStore.java``.
    Runs under RocksDBStateStoreProvider (tws needs column families);
    SQL mode so the drained output hash-matches the shared oracle.

    The constant ``tier`` column carries the tier that ACTUALLY executed
    and the oracle asserts ``'tws'`` — if the protobuf-fallback engages,
    the row emits ``tier='timer_fallback'`` and the driver's value hash
    FAILS rather than silently crediting the tws tier (VERDICT r5
    item 4)."""
    from left_join_on_timeout_spark.streaming.harness import (
        run_tws_join_stream,
    )
    from left_join_on_timeout_spark.streaming.timer_join import (
        _tws_available,
    )
    tier = "tws"
    if not _tws_available():  # no host protobuf: fall back so the
        # registry entry still adjudicates the shared semantics — but say
        # so loudly, AND stamp the fallback tier into the hashed output
        # so the driver row cannot pass attributed to tws (ADVICE r3,
        # VERDICT r5 item 4).
        import sys
        import warnings
        msg = ("tws_timeout_left_join: transformWithStateInPandas "
               "unavailable (no protobuf); adjudicating via the "
               "applyInPandasWithState fallback tier instead")
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        print(f"WARNING: {msg}", file=sys.stderr)
        from left_join_on_timeout_spark.streaming.harness import (
            run_timer_join_stream as run_tws_join_stream,  # noqa: F811
        )
        tier = "timer_fallback"
    left, right = _events_split(spark, sf_dir)
    out = run_tws_join_stream(
        spark, left, right, on="user_id", window="30 minutes",
        joiner=_concat_joiner)
    return (out.select("user_id", "event_id", "ts", "r_event_id", "joined")
            .withColumn("tier", F.lit(tier)))


@query("window_inner_join", """
SELECT l.user_id AS user_id,
       l.event_id AS event_id,
       r.event_id AS r_event_id,
       CAST(l.event_id AS VARCHAR) || '+' || CAST(r.event_id AS VARCHAR) AS joined
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') l
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
""")
def q_window_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — the windowed inner equi-join the reference delegates to Kafka
    Streams (LeftJoinOnTimeoutBuilder.java:112-115)."""
    left, right = _events_split(spark, sf_dir)
    out = window_inner_join(
        left, right, on="user_id", window="30 minutes", joiner=_concat_joiner,
    )
    return out.select("user_id", "event_id", "r_event_id", "joined")


@query("timeout_only", """
SELECT l.user_id AS user_id, l.event_id AS event_id, l.ts AS ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') l
WHERE NOT EXISTS (
  SELECT 1 FROM events r
  WHERE r.event_type = 'purchase' AND r.user_id = l.user_id
    AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
)
""")
def q_timeout_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 — just the timeout emissions, planned as LEFT ANTI (no
    null-padding shuffle amplification)."""
    left, right = _events_split(spark, sf_dir)
    return timeout_only(left, right, on="user_id", window="30 minutes")


@query("multi_match_cardinality", """
SELECT l.event_id AS event_id,
       count(r.event_id) AS n_matches
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') l
LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
GROUP BY l.event_id
""")
def q_multi_match_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12 — per-key multimap semantics: every pending left matches every
    in-window right independently (two lefts + one right ⇒ two outputs,
    LeftJoinOnTimeoutTest.java:85-91). Counts matches per left record."""
    left, right = _events_split(spark, sf_dir)
    out = left_join_on_timeout(left, right, on="user_id", window="30 minutes")
    return out.groupBy("event_id").agg(
        F.count("r_event_id").alias("n_matches"))


@query("json_extract_props", """
SELECT event_id AS event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
""")
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 — JSON deserialize as a scalar expression (reference
    JsonGenericDeserializer.java:15-30 → from_json)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.from_json("props", "k INT")["k"].alias("k"),
    )


@query("key_partition_hist", """
SELECT user_id % 32 AS bucket,
       count(*) AS n,
       count(DISTINCT user_id) AS n_keys
FROM events
GROUP BY user_id % 32
""")
def q_key_partition_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14 — key-partitioned routing: records for the same key land in the
    same partition. Deterministic modulo bucketing stands in for the hash
    partitioner so the oracle can reproduce it."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy((F.col("user_id") % 32).alias("bucket")).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_keys"),
    )


_FULL_OUTER_ORACLE = """
SELECT coalesce(l.user_id, r.user_id) AS user_id,
       l.event_id AS event_id,
       l.ts AS ts,
       r.event_id AS r_event_id,
       CASE WHEN l.event_id IS NULL
            THEN '+' || CAST(r.event_id AS VARCHAR)
            WHEN r.event_id IS NULL
            THEN CAST(l.event_id AS VARCHAR) || '+'
            ELSE CAST(l.event_id AS VARCHAR) || '+' || CAST(r.event_id AS VARCHAR)
       END AS joined
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') l
FULL JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
"""


def _full_outer_joiner(l, r) -> F.Column:
    """Side-symmetric ValueJoiner: '+r' for right-only, 'l+' for
    left-only (the reference's timeout row), 'l+r' for matches."""
    return (F.when(l["event_id"].isNull(),
                   F.concat(F.lit("+"), r["event_id"].cast("string")))
            .when(r["event_id"].isNull(),
                  F.concat(l["event_id"].cast("string"), F.lit("+")))
            .otherwise(F.concat(l["event_id"].cast("string"), F.lit("+"),
                                r["event_id"].cast("string"))))


def _full_outer_cols(out: DataFrame) -> DataFrame:
    return out.select(
        F.coalesce(F.col("user_id"), F.col("r_user_id")).alias("user_id"),
        "event_id", "ts", "r_event_id", "joined")


@query("full_outer_timeout_join", _FULL_OUTER_ORACLE)
def q_full_outer_timeout_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 symmetric extension — FULL OUTER JOIN ON TIMEOUT: both sides
    get timeout emissions (the reference only schedules timers for
    lefts, so a right with no left silently vanishes there; the
    symmetric form surfaces it null-padded on the left)."""
    from left_join_on_timeout_spark.operators.timeout_join import (
        full_outer_join_on_timeout,
    )
    left, right = _events_split(spark, sf_dir)
    out = full_outer_join_on_timeout(
        left, right, on="user_id", window="30 minutes",
        joiner=_full_outer_joiner)
    return _full_outer_cols(out)


@query("stream_full_outer_timeout_join", _FULL_OUTER_ORACLE)
def q_stream_full_outer_timeout_join(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The full-outer timeout join through the *real* streaming plan:
    watermarks on both sides, unmatched rights emit null-padded when
    the watermark passes their window end — drained and hash-checked
    against the identical batch oracle."""
    from left_join_on_timeout_spark.streaming.harness import (
        run_timeout_join_stream,
    )
    left, right = _events_split(spark, sf_dir)
    out = run_timeout_join_stream(
        spark, left, right, on="user_id", window="30 minutes",
        joiner=_full_outer_joiner, how="fullOuter")
    return _full_outer_cols(out)


# Register the rest of the surface (import side effects fill QUERIES/ORACLE).
from left_join_on_timeout_spark import (  # noqa: E402,F401
    queries_asof,
    queries_dedup,
    queries_formats,
    queries_multimodal,
    queries_nested,
    queries_pipeline,
    queries_range,
    queries_relational,
    queries_sampling,
    queries_similarity,
    queries_streaming,
    queries_text,
    queries_tpch,
    queries_tpch2,
)

# ---------------------------------------------------------------------------
# Pytest-only parameter variants (VERDICT r3 item 7).
#
# These prove the same mechanism as an in-registry sibling with a different
# parameter (Hamming radius, join direction, multiset flavor).  They keep
# their DuckDB oracles and run in tests/test_queries_oracle.py, but they do
# NOT occupy driver-window slots: the contract needs one passing entry per
# operator, not per parameter.  All five were driver-green in round 2.
# ---------------------------------------------------------------------------
_PYTEST_ONLY: list[str] = [
    "dedup_simhash_hamming1",  # sibling: dedup_simhash_hamming2 (general case)
    "dedup_simhash_hamming3",  # sibling: dedup_simhash_hamming2
    "asof_forward_join",       # sibling: asof_backward_join
    "asof_range_join",         # sibling: asof_backward_join (same oracle hash)
    "set_ops_all_multiset",    # sibling: set_ops_customers + union_all_keys
]
EXTRA_QUERIES: dict[str, QueryFn] = {n: QUERIES.pop(n) for n in _PYTEST_ONLY}
EXTRA_ORACLE: dict[str, str] = {
    n: ORACLE.pop(n) for n in _PYTEST_ONLY if n in ORACLE}

# ---------------------------------------------------------------------------
# Curated registration order.
#
# The driver's per-round correctness gate adjudicates roughly the FIRST 50
# entries of this registry (dict insertion order).  Union driver coverage
# is total (224/224 ever-adjudicated across r1..r13), so the window
# rotates by EVIDENCE STALENESS (VERDICT r6 item 4) with the ADVICE r7
# refinement: a CHANGED-CODE-PATH SENTINEL section sits ahead of the
# staleness rotation — every already-green name whose operator or oracle
# was touched this round re-adjudicates now, so a semantics change never
# ships with only local test coverage.  Round 14 order:
#   1-3    NEW queries (the unified cross-tier decontamination loop;
#          the lexical+semantic curation chain; the continuous
#          streaming curation ingest loop);
#   4-9    sentinels: the append-contract enforcement touches every
#          query that appends through text_index_append (the two
#          ingest write streams and both rebuild arcs), and the r13
#          advice fixes changed the capstone's oracle (null-safe
#          tokenizer, derived spike guard) and the decontamination
#          loop's oracle (honest n_flagged_after pin);
#   10-36  the staleness rotation: ALL 27 remaining age-6 r8 names --
#          the r8 vintage FINISHES this round;
#   37-50  the oldest 14 of the 35 r9 names alphabetically; the
#          remaining 21 carry to r15.
# The selection is mechanical -- regenerate with
#   python tools/evidence_age.py 50 --sentinel <changed names>
# after each round's CORRECTNESS_r{N}.json lands.  Everything after
# position 50 remains covered by the local type-strict gate
# (tools/check_oracle.py, tests/test_queries_oracle.py).
# ---------------------------------------------------------------------------
_PRIORITY: list[str] = [
    "curation_pipeline_semantic",  # NEW
    "decontaminate_all_tiers_saved",  # NEW
    "stream_curation_ingest",  # NEW
    "stream_text_index_append",  # r12 SENTINEL
    "contamination_rebuilt_saved",  # r13 SENTINEL
    "curation_pipeline_e2e",  # r13 SENTINEL
    "decontaminate_indexes_saved",  # r13 SENTINEL
    "stream_gram_index_append",  # r13 SENTINEL
    "text_bm25_rebuilt_saved",  # r13 SENTINEL
    "json_extract_props",  # r8
    "knn_brute_cosine",  # r8
    "label_centroids",  # r8
    "merge_upsert_orders",  # r8
    "multimodal_features",  # r8
    "q10_returned_items",  # r8
    "q11_important_parts",  # r8
    "q12_late_lines_by_flag",  # r8
    "q14_promo_revenue",  # r8
    "q15_top_supplier",  # r8
    "q16_part_supplier_cnt",  # r8
    "q18_large_volume_customer",  # r8
    "q19_discounted_revenue",  # r8
    "q20_heavy_gear_suppliers",  # r8
    "q22_idle_rich_customers",  # r8
    "q7_nation_volume",  # r8
    "q9_product_profit",  # r8
    "salted_join_revenue",  # r8
    "sample_stratified_docs",  # r8
    "stream_session_windows",  # r8
    "stream_static_enrich",  # r8
    "stream_timeout_only",  # r8
    "text_fingerprint_stats",  # r8
    "text_lang_dist",  # r8
    "tfidf_top_terms",  # r8
    "window_rolling_7d",  # r8
    "zscore_anomalies",  # r8
    "ann_recall_ivf",  # r9
    "ann_recall_ivfpq",  # r9
    "ann_top1_ivf",  # r9
    "ann_top1_ivf_probe2",  # r9
    "ann_topk_ivf",  # r9
    "cluster_aware_split",  # r9
    "cms_heavy_hitters",  # r9
    "corpus_health_dashboard",  # r9
    "daily_forward_fill",  # r9
    "dedup_prefix_jaccard",  # r9
    "doc_lm2_score",  # r9
    "doc_lm_score",  # r9
    "dow_seasonal_residuals",  # r9
    "dup_span_removal_stats",  # r9
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list names unknown queries: {_missing}"
assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate names in priority list"
assert len(_PRIORITY) <= 50, f"priority list exceeds driver window: {len(_PRIORITY)}"

_tail = [n for n in QUERIES if n not in set(_PRIORITY)]
_order = _PRIORITY + _tail
_q = {n: QUERIES[n] for n in _order}
_o = {n: ORACLE[n] for n in _order if n in ORACLE}
QUERIES.clear()
QUERIES.update(_q)
ORACLE.clear()
ORACLE.update(_o)

