"""Streaming-operator queries surfaced through the driver's correctness
gate: each runs a *real* Structured Streaming plan over the bounded
harness tables (file source → stateful operator → memory sink, drained
deterministically) and returns the sink as a batch DataFrame whose
contents an ANSI-SQL oracle can verify.

These complement ``stream_timeout_left_join`` (the flagship streaming
join in ``queries.py``) with the other stateful-streaming primitives a
100 TB pipeline runs: watermarked dedup and watermarked tumbling-window
aggregation — both with watermark-evicted (bounded) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.dedup import streaming_exact_dedup
from left_join_on_timeout_spark.queries import query
from left_join_on_timeout_spark.queries_sampling import (
    QUALITY_GATE_SQL,
    quality_gate,
)
from left_join_on_timeout_spark.sources.tables import load_table
from left_join_on_timeout_spark.streaming.harness import drain_stream

_FLUSH_TS = "2100-01-01 00:00:00"


@query("stream_dedup_keys", """
SELECT DISTINCT user_id, event_type FROM events
""")
def q_stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (``dropDuplicatesWithinWatermark``) over the
    bounded events table: one emission per distinct (user_id, event_type)
    — the key projection makes the result arrival-order-independent, so
    the batch DISTINCT is an exact oracle. State is watermark-evicted;
    at 100 TB the horizon bounds memory, unlike a plain streaming
    dropDuplicates."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type",
                                                    "ts")
    out = drain_stream(
        spark, ev,
        lambda s: streaming_exact_dedup(
            s, keys=["user_id", "event_type"], ts_col="ts",
            delay="10 seconds").select("user_id", "event_type"))
    return out


@query("stream_tumbling_counts", f"""
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       count(*) AS n
FROM events
GROUP BY 1, 2
""")
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming tumbling-window aggregation in append mode:
    windows finalize exactly when the watermark passes their end, so a
    far-future sentinel row flushes every real window through the sink
    (then filters itself out) — deterministic, no wall-clock waits. The
    batch GROUP BY date_trunc is an exact oracle for the finalized
    windows."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    sentinel = spark.range(1).select(
        F.lit(_FLUSH_TS).cast("timestamp").alias("ts"),
        F.lit("__flush__").alias("event_type"))

    def build(s: DataFrame) -> DataFrame:
        return (s.withWatermark("ts", "1 second")
                .groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count("*").alias("n"))
                .select(F.col("window.start").alias("hour_start"),
                        "event_type", "n"))

    out = drain_stream(spark, ev.unionAll(sentinel), build)
    return out.where(F.col("event_type") != "__flush__")


@query("stream_sliding_counts", """
SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS win_start,
       count(*) AS n
FROM events, unnest([0, 1, 2, 3]) AS t(k)
GROUP BY 1
""")
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming sliding windows (1 h / 15 min): each event
    feeds 4 overlapping windows; append mode finalizes each as the
    watermark passes its end, flushed by the sentinel. Oracle: the batch
    k-offset construction."""
    ev = load_table(spark, sf_dir, "events").select("ts")
    sentinel = spark.range(1).select(
        F.lit(_FLUSH_TS).cast("timestamp").alias("ts"))

    def build(s: DataFrame) -> DataFrame:
        return (s.withWatermark("ts", "1 second")
                .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
                .agg(F.count("*").alias("n"))
                .select(F.col("w.start").alias("win_start"), "n"))

    out = drain_stream(spark, ev.unionAll(sentinel), build)
    return out.where(F.col("win_start") < "2099-01-01")


@query("stream_session_windows", """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id,
       min(ts) AS session_start,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
""")
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows: the stateful merge-on-overlap operator
    under a watermark, finalized (append mode) once the watermark passes
    each session's close — flushed by the far-future sentinel, which then
    filters itself out. Oracle: the batch gaps-and-islands rewrite (>= on
    the gap — Spark merges only on strict overlap)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(_FLUSH_TS).cast("timestamp").alias("ts"))

    def build(s: DataFrame) -> DataFrame:
        return (s.withWatermark("ts", "1 second")
                .groupBy("user_id",
                         F.session_window("ts", "30 minutes").alias("w"))
                .agg(F.count("*").alias("n_events"))
                .select("user_id",
                        F.col("w.start").alias("session_start"),
                        "n_events"))

    out = drain_stream(spark, ev.unionAll(sentinel), build)
    return out.where(F.col("user_id") >= 0)


@query("stream_timeout_only", """
SELECT l.user_id AS user_id, l.event_id AS event_id, l.ts AS ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') l
WHERE NOT EXISTS (
  SELECT 1 FROM events r
  WHERE r.event_type = 'purchase' AND r.user_id = l.user_id
    AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
)
""")
def q_stream_timeout_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 streaming form: only the timeout emissions, through the real
    watermarked stream-stream plan (outer join filtered to null-padded
    rows — stream-stream LEFT ANTI isn't supported, the filter drops
    matches before the sink). Same oracle as the batch ``timeout_only``."""
    from left_join_on_timeout_spark.queries import _events_split
    from left_join_on_timeout_spark.streaming.harness import (
        drain_two_streams,
    )
    from left_join_on_timeout_spark.streaming.timeout_join import (
        timeout_only_stream,
    )
    left, right = _events_split(spark, sf_dir)
    out = drain_two_streams(
        spark, left, right, on="user_id",
        build=lambda ls, rs: timeout_only_stream(
            ls, rs, on="user_id", window="30 minutes"))
    return out.select("user_id", "event_id", "ts")


@query("stream_semi_join", """
SELECT l.user_id AS user_id, l.event_id AS event_id, l.ts AS ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') l
WHERE EXISTS (
  SELECT 1 FROM events r
  WHERE r.event_type = 'purchase' AND r.user_id = l.user_id
    AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
)
""")
def q_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matched-only complement, as a native stream-stream leftSemi
    join: each view that found an in-window purchase, once. With
    ``stream_timeout_only`` this partitions the left stream exactly —
    the reference's matched/timeout dichotomy as two driver-checked
    queries."""
    from left_join_on_timeout_spark.queries import _events_split
    from left_join_on_timeout_spark.streaming.harness import (
        drain_two_streams,
    )
    from left_join_on_timeout_spark.streaming.timeout_join import (
        semi_join_stream,
    )
    left, right = _events_split(spark, sf_dir)
    out = drain_two_streams(
        spark, left, right, on="user_id",
        build=lambda ls, rs: semi_join_stream(
            ls, rs, on="user_id", window="30 minutes"))
    return out.select("user_id", "event_id", "ts")


@query("stream_static_enrich", """
SELECT e.event_id AS event_id, e.user_id AS user_id,
       c.c_name AS c_name, c.c_mktsegment AS c_mktsegment
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
""")
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: a streaming fact joined to a batch
    dimension — the standard streaming-ETL lookup. The static side is
    re-planned per micro-batch (picking up dimension updates) and is
    broadcast, so the stream never shuffles; no watermark is needed
    because the static side holds no state."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "event_type")
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment"))
    out = drain_stream(
        spark, ev,
        lambda s: s.join(cust, s.user_id == cust.c_custkey)
        .select("event_id", "user_id", "c_name", "c_mktsegment"))
    return out


@query("stream_quality_filter", QUALITY_GATE_SQL)
def q_stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time corpus curation: the quality-tiered downsampling cut
    applied to a *stream* of documents — the filter a training pipeline
    runs as data lands. Stateless (pure per-row score + deterministic
    hash gate), so no watermark or state store; the drained output is
    row-identical to the batch cut, which is the exact oracle."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text")
    return drain_stream(spark, docs, quality_gate)


from left_join_on_timeout_spark.queries_text import (  # noqa: E402
    CHUNK_SQL,
    chunk_windows,
)


@query("stream_chunk_documents", CHUNK_SQL)
def q_stream_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time chunking: the 64-word / stride-48 embedding-prep
    chunker applied to a *stream* of documents — chunks materialize as
    data lands, ready for the embed stage. Stateless row-local array
    ops, so no watermark or state; the batch chunker is the exact
    oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return drain_stream(spark, docs, chunk_windows)


from left_join_on_timeout_spark.sql_lsh import (  # noqa: E402
    BAND_SELECTS as _BAND_SELECTS,
    DIGEST_COLS as _DIGEST_COLS,
    SHINGLES_CTE as _SHINGLES_CTE,
    SIG_COLS as _SIG_COLS,
)
from left_join_on_timeout_spark.operators.dedup import (  # noqa: E402
    DEFAULT_LSH_BUCKET_CAP,
)


@query("stream_incremental_probe", f"""
WITH {_SHINGLES_CTE},
hashed AS (SELECT doc_id, {_DIGEST_COLS} FROM sh),
sig AS (SELECT doc_id, {_SIG_COLS} FROM hashed GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
idx AS (
  SELECT doc_id, band, h FROM (
    SELECT doc_id, band, h,
           count(*) OVER (PARTITION BY band, h) AS bsz
    FROM bands WHERE doc_id % 10 != 0) t
  WHERE bsz <= {DEFAULT_LSH_BUCKET_CAP}),
prb AS (SELECT doc_id, band, h FROM bands WHERE doc_id % 10 = 0)
SELECT DISTINCT p.doc_id AS new_id, i.doc_id AS old_id
FROM prb p JOIN idx i ON p.band = i.band AND p.h = i.h
""")
def q_stream_incremental_probe(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Ingest-time near-dup screening as a STREAM: new documents arrive,
    each is MinHash-signed and banded *row-locally* (narrow ops only on
    the stream side — no streaming shuffle before the join), and probes
    the standing corpus LSH index as a static side that Spark re-plans
    per micro-batch (so overnight index rebuilds are picked up without
    restarting the query). Emits distinct (new_id, old_id) candidate
    hits — the streaming twin of ``dedup_incremental_probe``'s candidate
    stage; exact-Jaccard verify runs downstream in batch.

    The only stateful op is the candidate-level ``dropDuplicates`` (a
    doc can hit the same index doc through several bands); its state is
    bounded by live candidate pairs, and at 100 TB a deployment would
    scope it with a watermark on arrival time."""
    from left_join_on_timeout_spark.operators.dedup import (
        band_rows,
        minhash_signature,
    )
    from pyspark import StorageLevel
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    sig_old = minhash_signature(corpus, "doc_id", "text")
    w = Window.partitionBy("band", "h")
    idx = (band_rows(sig_old, "doc_id")
           .withColumn("bsz", F.count("*").over(w))
           .where(F.col("bsz") <= DEFAULT_LSH_BUCKET_CAP)
           .drop("bsz")
           .select(F.col("doc_id").alias("old_id"), "band", "h")
           .persist(StorageLevel.MEMORY_AND_DISK))
    idx.count()  # materialize the standing index before the stream runs
    batch = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")

    def probe(stream: DataFrame) -> DataFrame:
        sig = minhash_signature(stream, "doc_id", "text")
        bands = band_rows(sig, "doc_id").withColumnRenamed(
            "doc_id", "new_id")
        return (bands.join(idx, ["band", "h"])
                .select("new_id", "old_id")
                .dropDuplicates(["new_id", "old_id"]))

    return drain_stream(spark, batch, probe)


from left_join_on_timeout_spark.queries_pipeline import (  # noqa: E402
    DSIR_SQL,
)


@query("stream_dsir_score", DSIR_SQL)
def q_stream_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-batch / apply-stream: the DSIR importance model (256
    log-ratio buckets, ``queries_pipeline.dsir_tf_and_model``) is
    trained on the standing corpus, snapshotted into a 256-entry map
    LITERAL (the "ship the model to ingest" pattern — the one
    deliberate driver-side collect of a bounded model artifact, the
    broadcast-variable analog), and applied to a STREAM of documents
    as pure row-local array math: tokenize → bucket → map lookup →
    decimal ``F.aggregate`` sum. No streaming state, no watermark, no
    shuffle — per-arriving-doc scoring at ingest throughput. The
    drained rows are bit-identical to the batch scorer's (same rounded
    decimal model, same exact sums), which is the oracle."""
    from decimal import Decimal

    from left_join_on_timeout_spark.functions.text import words
    from left_join_on_timeout_spark.queries_pipeline import (
        _DSIR_HEX,
        _r6,
        dsir_tf_and_model,
    )

    import math

    from left_join_on_timeout_spark.queries_pipeline import _DSIR_B

    tf, lr = dsir_tf_and_model(spark, sf_dir)
    model = {r["b"]: r["lr"] for r in lr.collect()}  # O(256) snapshot
    pairs: list = []
    for b, v in sorted(model.items()):
        pairs.extend([F.lit(b), F.lit(v).cast("decimal(25,6)")])
    lr_map = F.create_map(*pairs)
    # Unseen-bucket floor (ADVICE r4): a bucket absent from the trained
    # model gets the smoothed zero-count log-ratio instead of NULLing
    # the whole document's score on genuinely new data. No-op on this
    # corpus (the model covers every bucket the training text produces)
    # so the oracle hash is unchanged — but the shipped pattern is now
    # safe for streams the model has never seen.
    tots = (tf.agg(
        F.sum("tf").cast("bigint").alias("tr"),
        F.coalesce(F.sum(F.when(F.col("doc_id") % 20 == 0, F.col("tf"))),
                   F.lit(0)).cast("bigint").alias("tt"))
        .collect()[0])
    floor = Decimal(math.floor(
        (math.log(1.0 / (tots["tt"] + _DSIR_B))
         - math.log(1.0 / (tots["tr"] + _DSIR_B)))
        * 1000000 + 0.5)) / Decimal(1000000)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def score(stream: DataFrame) -> DataFrame:
        toks = words("text")
        vals = F.transform(
            toks,
            lambda t: F.coalesce(
                F.element_at(
                    lr_map, F.substring(F.md5(t), 1, _DSIR_HEX)),
                F.lit(floor).cast("decimal(25,6)")))
        total = F.aggregate(
            vals,
            F.lit(Decimal(0)).cast("decimal(38,6)"),
            lambda acc, x: acc + x)
        n_tok = F.size(toks).cast("bigint")
        mean = _r6(total.cast("double") / n_tok)
        return stream.select(
            "doc_id",
            n_tok.alias("n_tok"),
            mean.alias("mean_log_iw"),
            (mean > 0.0).alias("selected"))

    return drain_stream(spark, docs, score)


_DYN_SQL = """
SELECT l.user_id AS user_id,
       l.event_id AS event_id,
       l.ts AS ts,
       r.event_id AS r_event_id,
       CAST(CASE l.user_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 30 ELSE 60 END
            AS INT) AS window_min
FROM (SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'view') l
LEFT JOIN (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts BETWEEN
     l.ts - (CASE l.user_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 30 ELSE 60 END)
            * INTERVAL 1 MINUTE
 AND l.ts + (CASE l.user_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 30 ELSE 60 END)
            * INTERVAL 1 MINUTE
"""


def _dyn_window_min(user_id) -> F.Column:
    """Per-key-class join window: 10/30/60 minutes by user segment —
    the SLA-tiered timeout a real deployment runs (premium keys wait
    longer for their match than bulk keys)."""
    return (F.when(user_id % 3 == 0, F.lit(10))
            .when(user_id % 3 == 1, F.lit(30))
            .otherwise(F.lit(60)))


@query("dynamic_timeout_left_join", _DYN_SQL)
def q_dynamic_timeout_left_join(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """O3 extension — LEFT JOIN ON TIMEOUT with a PER-KEY-CLASS window:
    the join window is a Column (10/30/60 min by user segment), not a
    constant — the reference hard-codes one ``joinWindowInMs`` for the
    whole topology (``LeftJoinOnTimeoutBuilder.java:33``), but a
    DataFrame-native operator gets data-dependent windows for free
    because the range condition is just an expression. Batch form:
    ``operators.timeout_join.dynamic_left_join_on_timeout`` — one
    equi-key join whose range bounds read the left row (fuzz-verified
    against a per-row brute-force evaluator over 200+ random
    interleavings, ``tests/test_dynamic_window_fuzz.py``)."""
    from left_join_on_timeout_spark.operators.timeout_join import (
        dynamic_left_join_on_timeout,
    )
    from left_join_on_timeout_spark.queries import _events_split

    left, right = _events_split(spark, sf_dir)
    wmin = _dyn_window_min(F.col("user_id"))
    out = dynamic_left_join_on_timeout(
        left.select("user_id", "event_id", "ts"),
        right.select("user_id", "event_id", "ts"),
        on="user_id", window_ms=wmin * 60_000)
    return out.select(
        "user_id", "event_id", "ts", "r_event_id",
        wmin.cast("int").alias("window_min"))


@query("stream_dynamic_timeout_left_join", _DYN_SQL)
def q_stream_dynamic_timeout_left_join(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """The per-key-class window through the REAL watermarked
    stream-stream leftOuter plan. State-bound analysis needs constant
    time bounds, so the join condition carries the widest class (±60
    min) as constant conjuncts — Spark derives watermark eviction from
    those — while the per-key CASE refines the match inside them;
    timeout rows for a tight-window key still emit only at its own
    window's edge because the CASE fails beyond it. Same oracle as the
    batch form."""
    from left_join_on_timeout_spark.queries import _events_split
    from left_join_on_timeout_spark.streaming.harness import (
        drain_two_streams,
    )

    left, right = _events_split(spark, sf_dir)

    def build(ls: DataFrame, rs: DataFrame) -> DataFrame:
        l = ls.withWatermark("ts", "0.1 seconds").alias("l")
        r = (rs.select(F.col("user_id"),
                       F.col("event_id").alias("r_event_id"),
                       F.col("ts").alias("r_ts"))
             .withWatermark("r_ts", "0.1 seconds").alias("r"))
        wmin = _dyn_window_min(F.col("l.user_id"))
        iv = F.make_interval(mins=wmin)
        outer = F.expr("INTERVAL 60 MINUTES")
        cond = ((F.col("l.user_id") == F.col("r.user_id"))
                & (F.col("r.r_ts") >= F.col("l.ts") - outer)
                & (F.col("r.r_ts") <= F.col("l.ts") + outer)
                & (F.col("r.r_ts") >= F.col("l.ts") - iv)
                & (F.col("r.r_ts") <= F.col("l.ts") + iv))
        return (l.join(r, cond, "leftOuter")
                .select(F.col("l.user_id").alias("user_id"),
                        F.col("l.event_id").alias("event_id"),
                        F.col("l.ts").alias("ts"),
                        F.col("r_event_id"),
                        wmin.cast("int").alias("window_min")))

    return drain_two_streams(spark, left, right, on="user_id",
                             build=build)


# Unrolled DuckDB twin of the streaming ANN ingest probe: the two-level
# quantizer TRAINED ON THE CORPUS SIDE ONLY (one Lloyd pass per level,
# same decimal-mean / (sim DESC, cell) arithmetic as
# queries_similarity._ivf2_oracle), corpus postings capped per cell,
# then the held-out batch assigned through the SAME trained anchors and
# thresholded against its cell-mates.
_ANN_PROBE_SUPER = 8
_ANN_PROBE_K2 = 8
_ANN_PROBE_CAP = 2000
_ANN_PROBE_T = 0.35

_STREAM_ANN_PROBE_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
c AS (SELECT * FROM v WHERE vec_id % 10 != 0),
bq AS (SELECT * FROM v WHERE vec_id % 10 = 0),
pa0 AS (SELECT CAST(rn - 1 AS BIGINT) AS cell, av, anrm FROM (
          SELECT v AS av, nrm AS anrm,
                 row_number() OVER (ORDER BY vec_id) AS rn
          FROM c) t WHERE rn <= {_ANN_PROBE_SUPER}),
ps1 AS (SELECT vec_id, m.v AS v, m.nrm AS nrm, cell,
               list_dot_product(m.v, av) / (m.nrm * anrm) AS sim
        FROM c m, pa0),
pg1 AS (SELECT vec_id, v, nrm, cell FROM (
          SELECT vec_id, v, nrm, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cell) AS rn
          FROM ps1) t WHERE rn = 1),
pd1 AS (SELECT cell, i,
               CAST(sum(CAST(v[i] AS DECIMAL(25,6))) AS DOUBLE) / count(*)
                 AS m
        FROM pg1, range(1, 65) t(i) GROUP BY cell, i),
pc1 AS (SELECT cell, list(m ORDER BY i) AS av FROM pd1 GROUP BY cell),
pa1 AS (SELECT cell, av, sqrt(list_dot_product(av, av)) AS anrm FROM pc1),
ss AS (SELECT vec_id, m.v AS v, m.nrm AS nrm, cell,
              list_dot_product(m.v, av) / (m.nrm * anrm) AS sim
       FROM c m, pa1),
sup AS (SELECT vec_id, v, nrm, cell AS sid FROM (
          SELECT vec_id, v, nrm, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cell) AS rn
          FROM ss) t WHERE rn = 1),
sb0 AS (SELECT sid, CAST(rn - 1 AS BIGINT) AS sub, av, anrm FROM (
          SELECT sid, v AS av, nrm AS anrm,
                 row_number() OVER (PARTITION BY sid
                                    ORDER BY vec_id) AS rn
          FROM sup) t WHERE rn <= {_ANN_PROBE_K2}),
s2 AS (SELECT m.vec_id, m.v, m.nrm, m.sid, b.sub,
              list_dot_product(m.v, b.av) / (m.nrm * b.anrm) AS sim
       FROM sup m JOIN sb0 b ON m.sid = b.sid),
g2 AS (SELECT vec_id, v, nrm, sid, sub FROM (
         SELECT vec_id, v, nrm, sid, sub,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, sub) AS rn
         FROM s2) t WHERE rn = 1),
d2 AS (SELECT sid, sub, i,
              CAST(sum(CAST(v[i] AS DECIMAL(25,6))) AS DOUBLE) / count(*)
                AS m
       FROM g2, range(1, 65) t(i) GROUP BY sid, sub, i),
c2 AS (SELECT sid, sub, list(m ORDER BY i) AS av FROM d2
       GROUP BY sid, sub),
a2 AS (SELECT sid, sub, av, sqrt(list_dot_product(av, av)) AS anrm
       FROM c2),
s3 AS (SELECT m.vec_id, m.sid, b.sub,
              list_dot_product(m.v, b.av) / (m.nrm * b.anrm) AS sim
       FROM sup m JOIN a2 b ON m.sid = b.sid),
fin AS (SELECT vec_id, sid, sub FROM (
          SELECT vec_id, sid, sub,
                 row_number() OVER (PARTITION BY vec_id, sid
                                    ORDER BY sim DESC, sub) AS rn
          FROM s3) t WHERE rn = 1),
capped AS (SELECT vec_id, sid, sub FROM (
             SELECT vec_id, sid, sub,
                    count(*) OVER (PARTITION BY sid, sub) AS csz
             FROM fin) t WHERE csz <= {_ANN_PROBE_CAP}),
bs AS (SELECT vec_id, m.v AS v, m.nrm AS nrm, cell,
              list_dot_product(m.v, av) / (m.nrm * anrm) AS sim
       FROM bq m, pa1),
bsup AS (SELECT vec_id, v, nrm, cell AS sid FROM (
           SELECT vec_id, v, nrm, cell,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cell) AS rn
           FROM bs) t WHERE rn = 1),
bs3 AS (SELECT m.vec_id, m.sid, b.sub,
               list_dot_product(m.v, b.av) / (m.nrm * b.anrm) AS sim
        FROM bsup m JOIN a2 b ON m.sid = b.sid),
bfin AS (SELECT vec_id, sid, sub FROM (
           SELECT vec_id, sid, sub,
                  row_number() OVER (PARTITION BY vec_id, sid
                                     ORDER BY sim DESC, sub) AS rn
           FROM bs3) t WHERE rn = 1)
SELECT * FROM (
  SELECT q.vec_id AS new_id, p.vec_id AS old_id,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM bfin q
  JOIN capped p ON q.sid = p.sid AND q.sub = p.sub
                AND q.vec_id != p.vec_id
  JOIN v va ON va.vec_id = q.vec_id
  JOIN v vb ON vb.vec_id = p.vec_id) t
WHERE cos_sim >= {_ANN_PROBE_T}
"""


@query("stream_ann_probe", _STREAM_ANN_PROBE_SQL)
def q_stream_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN ingest (VERDICT r6 item 3): new embedding vectors
    arrive as a STREAM and probe a STANDING two-level index — the
    embedding analog of ``stream_incremental_probe``'s LSH screen, tied
    to the index lifecycle: the standing side is the SAVED index
    (``ivf2_index_build`` → parquet → ``ivf2_index_load``), exactly
    what a daily-ingest deployment serves from.

    Per micro-batch the probe is stateless end to end (the streaming
    shape ANN ingest needs): parse (narrow) → broadcast anchor argmax
    (stream-static, map-side) → best-sub hash lookup (stream-static
    broadcast) → one equi-join of probed (sid, sub) cells against the
    postings scan → thresholded exact cosine. Zero streaming state, so
    state never grows with corpus or stream; the per-batch cost is
    bounded by batch × own-cell postings. Top-1 reduction (a stateful
    agg under streaming semantics) belongs downstream in batch, as
    with the LSH twin's exact-Jaccard verify."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_build,
        ivf2_index_probe_hits,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    batch = (emb.where(F.col("vec_id") % 10 == 0)
             .select("vec_id", "embedding"))
    root = default_index_root()
    path = os.path.join(
        root, "ivf2probe_" + os.path.basename(os.path.normpath(sf_dir)))
    index = ivf2_index_build(corpus, path, n_super=_ANN_PROBE_SUPER,
                             k2=_ANN_PROBE_K2, cell_cap=_ANN_PROBE_CAP)

    def probe(stream: DataFrame) -> DataFrame:
        return ivf2_index_probe_hits(stream, index, _ANN_PROBE_T)

    return drain_stream(spark, batch, probe)


# ---------------------------------------------------------------------------
# Streaming PQ ingest probe (VERDICT r7 item 6): the compressed-domain
# twin of stream_ann_probe — new vectors are ENCODED through the saved
# codebook per micro-batch and screened against the standing coded
# postings by SDC threshold, raw posting vectors never touching the
# stream. Oracle replays the densified corpus codebook (corpus has id
# gaps at multiples of 10), the capped coarse cells, both encode
# passes, and the LUT distance sum bit-for-bit.
# ---------------------------------------------------------------------------
_SPQ_M = 4
_SPQ_SUB = 16
_SPQ_K = 16
_SPQ_CELLS = 32
_SPQ_CAP = 2000
_SPQ_T = 0.8

_SPQ_CODE_PICK = ", ".join(
    f"max(CASE WHEN b={b} THEN code END) AS code{b}"
    for b in range(_SPQ_M))
_SPQ_D2 = ("(list_dot_product(bl.s, bl.s)"
           " - 2.0 * list_dot_product(bl.s, k.cs)"
           " + list_dot_product(k.cs, k.cs))")

_STREAM_PQ_PROBE_SQL = f"""
WITH va AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])) AS nrm
            FROM embeddings),
c AS (SELECT * FROM va WHERE vec_id % 10 != 0),
bq AS (SELECT * FROM va WHERE vec_id % 10 = 0),
anchors AS (SELECT vec_id AS cell, v AS av, nrm AS anrm
            FROM c WHERE vec_id < {_SPQ_CELLS}),
cb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS code,
              list_transform(v, x -> x / nrm) AS cv
       FROM c WHERE vec_id < {_SPQ_K}),
cblk AS MATERIALIZED (
  SELECT code, t.b, cv[t.b*{_SPQ_SUB}+1 : t.b*{_SPQ_SUB}+{_SPQ_SUB}] AS cs
  FROM cb, UNNEST(range(0, {_SPQ_M})) AS t(b)),
csims AS (SELECT vec_id, cell,
                 list_dot_product(c.v, av) / (c.nrm * anrm) AS sim
          FROM c, anchors),
cassign AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rn
    FROM csims) t WHERE rn = 1),
cblocks AS (SELECT vec_id, t.b,
                   (list_transform(v, x -> x / nrm))
                     [t.b*{_SPQ_SUB}+1 : t.b*{_SPQ_SUB}+{_SPQ_SUB}] AS s
            FROM c, UNNEST(range(0, {_SPQ_M})) AS t(b)),
cd AS MATERIALIZED (
  SELECT bl.vec_id, bl.b, k.code, {_SPQ_D2} AS d2
  FROM cblocks bl JOIN cblk k ON bl.b = k.b),
ccodes AS MATERIALIZED (
  SELECT vec_id, {_SPQ_CODE_PICK}
  FROM (SELECT vec_id, b, code,
               row_number() OVER (PARTITION BY vec_id, b
                                  ORDER BY d2, code) AS rn
        FROM cd) t WHERE rn = 1 GROUP BY vec_id),
cidx AS (SELECT a.vec_id, a.cell,
                {", ".join(f"k.code{b}" for b in range(_SPQ_M))}
         FROM cassign a JOIN ccodes k USING (vec_id)),
capped AS MATERIALIZED (
  SELECT * FROM (
    SELECT cidx.*, count(*) OVER (PARTITION BY cell) AS csz FROM cidx) t
  WHERE csz <= {_SPQ_CAP}),
bsims AS (SELECT vec_id, cell,
                 list_dot_product(bq.v, av) / (bq.nrm * anrm) AS sim
          FROM bq, anchors),
bassign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rn
    FROM bsims) t WHERE rn = 1),
bblocks AS (SELECT vec_id, t.b,
                   (list_transform(v, x -> x / nrm))
                     [t.b*{_SPQ_SUB}+1 : t.b*{_SPQ_SUB}+{_SPQ_SUB}] AS s
            FROM bq, UNNEST(range(0, {_SPQ_M})) AS t(b)),
bd AS (SELECT bl.vec_id, bl.b, k.code, {_SPQ_D2} AS d2
       FROM bblocks bl JOIN cblk k ON bl.b = k.b),
bcodes AS (
  SELECT vec_id, {_SPQ_CODE_PICK}
  FROM (SELECT vec_id, b, code,
               row_number() OVER (PARTITION BY vec_id, b
                                  ORDER BY d2, code) AS rn
        FROM bd) t WHERE rn = 1 GROUP BY vec_id),
bidx AS (SELECT a.vec_id, a.cell,
                {", ".join(f"k.code{b}" for b in range(_SPQ_M))}
         FROM bassign a JOIN bcodes k USING (vec_id)),
lut AS MATERIALIZED (
  SELECT ka.b, ka.code AS cda, kb.code AS cdb,
         (list_dot_product(ka.cs, ka.cs)
          - 2.0 * list_dot_product(ka.cs, kb.cs)
          + list_dot_product(kb.cs, kb.cs)) AS d2
  FROM cblk ka JOIN cblk kb ON ka.b = kb.b)
SELECT * FROM (
  SELECT q.vec_id AS new_id, p.vec_id AS old_id,
         round({" + ".join(f"l{b}.d2" for b in range(_SPQ_M))}, 6) AS sdc
  FROM bidx q JOIN capped p ON q.cell = p.cell AND q.vec_id != p.vec_id
  {" ".join(f"JOIN lut l{b} ON l{b}.b = {b} AND l{b}.cda = q.code{b} AND l{b}.cdb = p.code{b}"
            for b in range(_SPQ_M))}) t
WHERE sdc <= {_SPQ_T}
"""


@query("stream_pq_probe", _STREAM_PQ_PROBE_SQL)
def q_stream_pq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PQ ingest (VERDICT r7 item 6): new embedding vectors
    arrive as a STREAM and probe a standing SAVED IVF-PQ index in the
    compressed domain — encode through the LOADED codebook, assign
    through the LOADED anchors, SDC-threshold screen against the coded
    postings via the broadcast LUT. Stateless per micro-batch (zero
    streaming state; the stream is shuffle-free before the static
    join) and the stream never moves a raw posting vector — per-batch
    network cost is (cell, m codes) per candidate, the PQ memory
    contract extended to ingest. Downstream exact rerank belongs in
    batch, as with the LSH and IVF2 ingest screens."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        pq_index_build,
        pq_index_probe_hits,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    batch = (emb.where(F.col("vec_id") % 10 == 0)
             .select("vec_id", "embedding"))
    root = default_index_root()
    path = os.path.join(
        root, "pqprobe_" + os.path.basename(os.path.normpath(sf_dir)))
    index = pq_index_build(corpus, path, m=_SPQ_M, k=_SPQ_K,
                           n_cells=_SPQ_CELLS, cell_cap=_SPQ_CAP)

    def probe(stream: DataFrame) -> DataFrame:
        return pq_index_probe_hits(stream, index, _SPQ_T)

    return drain_stream(spark, batch, probe)


@query("stream_ann_probe_refresh", _STREAM_ANN_PROBE_SQL)
def q_stream_ann_probe_refresh(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Streaming ANN ingest through PER-MICRO-BATCH MANIFEST
    RE-RESOLUTION (VERDICT r9 item 3): same probe semantics as
    ``stream_ann_probe``, but the stream runs through ``foreachBatch``
    with :func:`operators.ann_index.refreshing_probe_sink` — each
    micro-batch re-reads the index's ``latest`` pointer and loads the
    CURRENT postings version, so a long-running ingest stream survives
    arbitrary rebuilds instead of the one-version GC grace period the
    pinned stream-static plan gets. Here the index is REBUILT between
    build and stream (a no-op compaction — pytest pins rebuild
    row-identity), so every probed micro-batch serves from
    ``postings_v2`` through a bumped manifest: the oracle is the
    UNCHANGED ``stream_ann_probe`` replay, and a match proves both the
    re-resolution plumbing and serve-after-rebuild row equality."""
    import os
    import tempfile

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_build,
        ivf2_index_rebuild,
        refreshing_probe_sink,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    batch = (emb.where(F.col("vec_id") % 10 == 0)
             .select("vec_id", "embedding"))
    root = default_index_root()
    path = os.path.join(
        root, "ivf2rfr_" + os.path.basename(os.path.normpath(sf_dir)))
    ivf2_index_build(corpus, path, n_super=_ANN_PROBE_SUPER,
                     k2=_ANN_PROBE_K2, cell_cap=_ANN_PROBE_CAP)
    ivf2_index_rebuild(spark, path)  # pointer now names postings_v2
    base = tempfile.mkdtemp(prefix="ljot_refresh_")
    src, out, ckpt = (os.path.join(base, d) for d in ("in", "out", "ck"))
    batch.write.mode("overwrite").parquet(src)
    q = (spark.readStream.schema(batch.schema).parquet(src)
         .writeStream.foreachBatch(
             refreshing_probe_sink(out, path, threshold=_ANN_PROBE_T))
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out)


def _stream_lsh_probe_sql() -> str:
    """Banded candidate replay for the streaming LSH refresh probe:
    the new 10% arrivals band row-locally and join the capped standing
    buckets — the `cand` stage of the incremental-probe oracle, pairs
    only (the streaming probe emits candidates; verification is the
    batch consumer's stage)."""
    from left_join_on_timeout_spark.operators.dedup import (
        DEFAULT_LSH_BUCKET_CAP,
    )
    from left_join_on_timeout_spark.queries_dedup import (
        _BAND_SELECTS,
        _DIGEST_COLS,
        _SHINGLES_CTE,
        _SIG_COLS,
    )

    return f"""
WITH {_SHINGLES_CTE},
hashed AS (SELECT doc_id, {_DIGEST_COLS} FROM sh),
sig AS (SELECT doc_id, {_SIG_COLS} FROM hashed GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
idx AS (
  SELECT doc_id, band, h FROM (
    SELECT doc_id, band, h,
           count(*) OVER (PARTITION BY band, h) AS bsz
    FROM bands WHERE doc_id % 10 != 0) t
  WHERE bsz <= {DEFAULT_LSH_BUCKET_CAP}),
prb AS (SELECT doc_id, band, h FROM bands WHERE doc_id % 10 = 0)
SELECT DISTINCT p.doc_id AS probe_id, i.doc_id AS index_id
FROM prb p JOIN idx i ON p.band = i.band AND p.h = i.h
"""


@query("stream_lsh_probe_refresh", _stream_lsh_probe_sql())
def q_stream_lsh_probe_refresh(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The LSH tier of the per-micro-batch manifest re-resolution
    (VERDICT r9 item 3's "LSH stream twin", driver-adjudicated): the
    standing near-dup index is built on the 90% corpus and REBUILT
    (no-op compaction; the pointer now names ``postings_v2``), then
    the 10% arrivals stream through ``foreachBatch`` with
    :func:`operators.ann_index.refreshing_probe_sink` in ``lsh``
    mode — each micro-batch re-reads the manifest and bands ONLY the
    batch against the loaded capped buckets. The oracle replays the
    banding against the v1-content (rebuild row-identity makes v2
    equal — pinned in pytest), so a match proves the re-resolution
    plumbing AND probe-after-rebuild row equality on the dedup tier."""
    import os
    import tempfile

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        refreshing_probe_sink,
    )
    from left_join_on_timeout_spark.operators.lsh_index import (
        lsh_index_build,
        lsh_index_rebuild,
    )

    docs = load_table(spark, sf_dir, "documents")
    old_docs = docs.where(F.col("doc_id") % 10 != 0)
    new_docs = (docs.where(F.col("doc_id") % 10 == 0)
                .select("doc_id", "text"))
    root = default_index_root()
    path = os.path.join(
        root, "lshrfr_" + os.path.basename(os.path.normpath(sf_dir)))
    lsh_index_build(old_docs, path)
    lsh_index_rebuild(spark, path)  # pointer now names postings_v2
    base = tempfile.mkdtemp(prefix="ljot_lshrfr_")
    src, out, ckpt = (os.path.join(base, d) for d in ("in", "out", "ck"))
    new_docs.write.mode("overwrite").parquet(src)
    q = (spark.readStream.schema(new_docs.schema).parquet(src)
         .writeStream.foreachBatch(
             refreshing_probe_sink(out, path, tier="lsh",
                                   id_col="doc_id"))
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out).distinct()


def _stream_text_probe_sql() -> str:
    """Sweep replay for the streaming text refresh probe: the
    normalized tokenize chain + a VALUES relation of (query_id, term)
    mirroring the streamed query texts — the ``text_bm25_sweep``
    oracle WITHOUT its top-k cut (the streaming probe emits every
    scored (query, doc) pair; ranking is the batch consumer's
    stage)."""
    from left_join_on_timeout_spark.queries_text import (
        _BM25_B,
        _BM25_K1,
        SWEEP_QUERIES,
    )

    vals = ", ".join(f"({qid}, '{t}')"
                     for qid, terms in SWEEP_QUERIES for t in terms)
    all_terms = sorted({t for _, terms in SWEEP_QUERIES for t in terms})
    return f"""
WITH ntok AS (SELECT doc_id,
                     string_split_regex(trim(lower(coalesce(text, ''))),
                                        '\\s+') AS toks
              FROM documents),
ndl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM ntok),
ncorp AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
          FROM ndl),
qdef AS (SELECT * FROM (VALUES {vals}) AS t(query_id, term)),
nqt AS (SELECT doc_id, term FROM (
          SELECT doc_id, unnest(toks) AS term FROM ntok) t
        WHERE term IN ({", ".join(f"'{t}'" for t in all_terms)})),
ntf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        FROM nqt GROUP BY doc_id, term),
ndft AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
         FROM nqt GROUP BY term),
nsc AS (SELECT q.query_id, ntf.doc_id,
               round(ln((c.n_docs - ndft.df + 0.5)
                        / (ndft.df + 0.5) + 1.0), 6)
               * ntf.tf * {_BM25_K1 + 1.0}
               / (ntf.tf + {_BM25_K1} * ({1.0 - _BM25_B}
                  + {_BM25_B} * ndl.dl / c.avgdl)) AS s
        FROM ntf
        JOIN qdef q USING (term)
        JOIN ndft USING (term)
        JOIN ndl ON ndl.doc_id = ntf.doc_id, ncorp c)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       round(sum(s), 6) AS bm25
FROM nsc GROUP BY query_id, doc_id
"""


@query("stream_text_probe_refresh", _stream_text_probe_sql())
def q_stream_text_probe_refresh(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The TEXT tier of the per-micro-batch manifest re-resolution
    (round 12 — VERDICT r11 missing #2; the vector/LSH/PQ families
    got their read-refresh streams in r9-r10): a standing inverted
    index is built on the full corpus and REBUILT (the no-op
    compaction recomputes (n_docs, avgdl) over identical postings, so
    the pointer now names ``postings_v2`` with bit-identical stats —
    the rebuild-row-identity discipline of the LSH twin), then the
    query set streams through ``foreachBatch`` with
    :func:`operators.ann_index.refreshing_probe_sink` in ``text``
    mode — each micro-batch re-reads the manifest, tokenizes ONLY the
    batch's query texts through the shared normalizer, and scores
    them against the CURRENT index version via the one-pass sweep.
    The oracle replays the sweep against the corpus, so a match
    proves the re-resolution plumbing AND serve-after-rebuild value
    equality (stats refresh included) on the lexical tier."""
    import os
    import tempfile

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        refreshing_probe_sink,
    )
    from left_join_on_timeout_spark.operators.text_index import (
        text_index_build,
        text_index_rebuild,
    )
    from left_join_on_timeout_spark.queries_text import SWEEP_QUERIES

    docs = load_table(spark, sf_dir, "documents")
    root = default_index_root()
    path = os.path.join(
        root, "textrfr_" + os.path.basename(os.path.normpath(sf_dir)))
    text_index_build(docs, path)
    text_index_rebuild(spark, path)  # pointer now names postings_v2
    queries_df = spark.createDataFrame(
        [(qid, " ".join(terms)) for qid, terms in SWEEP_QUERIES],
        "query_id LONG, qtext STRING")
    base = tempfile.mkdtemp(prefix="ljot_textrfr_")
    src, out, ckpt = (os.path.join(base, d) for d in ("in", "out", "ck"))
    queries_df.write.mode("overwrite").parquet(src)
    q = (spark.readStream.schema(queries_df.schema).parquet(src)
         .writeStream.foreachBatch(
             refreshing_probe_sink(out, path, tier="text",
                                   id_col="query_id",
                                   text_col="qtext"))
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the sink is at-least-once across epoch retries; .distinct()
    # makes the read retry-proof like the LSH twin's (ADVICE r12)
    return spark.read.parquet(out).distinct()


@query("stream_contamination_screen", f"""
WITH toks AS (SELECT doc_id,
                     regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                           '\\s+') AS w
              FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(w[i:i+4], ' ')) AS h
  FROM toks, UNNEST(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)),
bench AS (SELECT DISTINCT h FROM grams WHERE doc_id % 20 = 0),
arr AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 5),
scr AS (SELECT a.doc_id,
               CAST(count(g.h) AS BIGINT) AS n_grams,
               CAST(count(b.h) AS BIGINT) AS n_contaminated
        FROM arr a
        LEFT JOIN grams g ON g.doc_id = a.doc_id
        LEFT JOIN bench b ON g.h = b.h
        GROUP BY a.doc_id)
SELECT doc_id, n_grams, n_contaminated,
       CASE WHEN n_grams = 0 THEN 0.0
            ELSE round(CAST(n_contaminated AS DOUBLE) / n_grams, 6)
            END AS contamination,
       CASE WHEN n_grams = 0 THEN false
            ELSE round(CAST(n_contaminated AS DOUBLE) / n_grams, 6)
                 > 0.05 END AS flagged
FROM scr
""")
def q_stream_contamination_screen(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """INGEST-time contamination screening (round 12 — the admission
    gate a training pipeline runs BEFORE new data enters the corpus,
    the reverse probe direction of the audit family): candidate docs
    (doc_id ≡ 5 mod 10) arrive as a real stream and each micro-batch
    gates against the standing eval gram set
    (``operators.text_index.contamination_screen`` — the MB-sized
    eval relation broadcasts, the batch tokenizes only itself, so the
    plan is a stateless stream-static broadcast join and per-batch
    cost is batch-sized). The per-doc ruling aggregates INSIDE
    ``foreachBatch`` — the gate is per-batch-complete by
    construction (a doc's grams arrive together), so no streaming
    aggregation state or watermark is needed. Every arriving doc gets
    a ruling — clean docs report (n, 0, 0.0, false) — because an
    admission gate must rule on every candidate. The oracle replays
    the screen SHAPE-ROBUSTLY (ADVICE r12): arrivals come from the
    documents table itself with a LEFT JOIN to their grams and
    NULL text coalesced like the shared normalizer, so gram-less or
    NULL-text candidates are covered by the oracle, not by dataset
    accident (the zero-gram arm also stays a semantics test in
    tests/test_text_index.py)."""
    import os
    import tempfile

    from left_join_on_timeout_spark.functions.text import gram_digest_set
    from left_join_on_timeout_spark.operators.text_index import (
        contamination_screen,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = gram_digest_set(docs.where(F.col("doc_id") % 20 == 0))
    arrivals = (docs.where(F.col("doc_id") % 10 == 5)
                .select("doc_id", "text"))
    base = tempfile.mkdtemp(prefix="ljot_screen_")
    src, out, ckpt = (os.path.join(base, d) for d in ("in", "out", "ck"))
    arrivals.write.mode("overwrite").parquet(src)

    def _screen(batch_df: DataFrame, epoch_id: int) -> None:
        contamination_screen(batch_df, bench, ngram_n=5) \
            .write.mode("append").parquet(out)

    q = (spark.readStream.schema(arrivals.schema).parquet(src)
         .writeStream.foreachBatch(_screen)
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# Streaming curation ingest loop (round 14)
# ---------------------------------------------------------------------------

def _stream_curation_sql() -> str:
    """The streaming twin's oracle = the batch chain's shared CTEs
    plus the post-stream INDEX-MEMBERSHIP column: every admitted doc
    with at least one gram must be serving from the standing gram
    index after the stream (the per-batch append landed), so
    ``n_indexed`` replays as "admitted ∧ gram-bearing"."""
    from left_join_on_timeout_spark.queries_pipeline import (
        _curation_semantic_ctes,
    )

    return f"""{_curation_semantic_ctes()},
anidx AS (SELECT a.source, count(*) AS n
          FROM fin f JOIN arr a ON a.doc_id = f.doc_id
          WHERE a.kind <> 'sem'
            AND a.gid IN (SELECT doc_id FROM grams)
          GROUP BY a.source)
SELECT s.source AS source,
       CAST(coalesce(ac.n, 0) AS BIGINT) AS n_candidates,
       CAST(coalesce(sc.n, 0) AS BIGINT) AS n_screened_out,
       CAST(coalesce(du.n, 0) AS BIGINT) AS n_dup_dropped,
       CAST(coalesce(se2.n, 0) AS BIGINT) AS n_semdup_dropped,
       CAST(coalesce(am.n, 0) AS BIGINT) AS n_admitted,
       CAST(coalesce(ai.n, 0) AS BIGINT) AS n_indexed
FROM srcs s
LEFT JOIN acand ac ON ac.source = s.source
LEFT JOIN ascr sc ON sc.source = s.source
LEFT JOIN adup du ON du.source = s.source
LEFT JOIN asem se2 ON se2.source = s.source
LEFT JOIN aadm am ON am.source = s.source
LEFT JOIN anidx ai ON ai.source = s.source
"""


@query("stream_curation_ingest", _stream_curation_sql())
def q_stream_curation_ingest(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The CONTINUOUS curation ingest loop (round 14 — VERDICT r13
    item 5, pairing the semantic chain): ONE ``foreachBatch`` body
    composes the whole admission pipeline per micro-batch — gram
    screen → saved-LSH lexical dedup (exact-Jaccard) → saved-SRP
    semantic dedup (exact-cosine) → ADMIT → gram-index APPEND — over
    a real ``readStream`` of the same arrival batch the batch twin
    (`curation_pipeline_semantic`) adjudicates, plus the append half
    the batch twin stops short of: admitted docs enter the standing
    AUDIT index immediately (`text_index_append` through the saved
    manifest's token mode), so the post-stream index serves them with
    their append-time denominators.

    Per-batch decisions land in an at-least-once parquet sink (read
    back through ``.distinct()`` — the retry-proof pattern), and the
    report joins them with the INDEX-MEMBERSHIP check: ``n_indexed``
    counts admitted docs actually serving from the reloaded gram
    index (gram-bearing admitted docs — a doc the append lost would
    drop the count off the oracle's replay). The r14 append
    enforcement doubles as the epoch-retry guard: a replayed batch's
    ids are already live, so the append refuses and the batch is
    already-done — no epoch directory needed. Every stage is
    batch-bounded (broadcast eval grams, saved-index probes with both
    sides capped, candidate-pair-only verifies, batch-sized appends),
    so the loop's steady-state cost scales with arrival rate, never
    corpus size; results are batch-split independent because probes
    only ever face the STANDING indexes, so the oracle replays the
    union regardless of how the stream chopped the arrivals."""
    import os
    import tempfile

    from pyspark import StorageLevel

    from left_join_on_timeout_spark.functions.vectors import (
        as_double,
        dot,
        l2_norm,
    )
    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
    )
    from left_join_on_timeout_spark.operators.dedup import shingle_sets
    from left_join_on_timeout_spark.operators.lsh_index import (
        lsh_index_build,
        lsh_index_probe,
    )
    from left_join_on_timeout_spark.operators.srp_index import (
        srp_index_build,
        srp_index_probe,
    )
    from left_join_on_timeout_spark.operators.text_index import (
        contamination_screen,
        text_index_append,
        text_index_build,
        text_index_load,
    )
    from left_join_on_timeout_spark.queries_pipeline import (
        SEM_DUP_THRESHOLD,
        _curation_fixtures,
        _tracked_index_path,
        release_tracked_persists,
    )

    # release the previous curation-family invocation's persists
    # (VERDICT r14 wrong #3) before the fixtures register this one's
    release_tracked_persists()
    fx = _curation_fixtures(spark, sf_dir)
    bench, arrivals = fx["bench"], fx["arrivals"]
    emb, standing = fx["emb"], fx["standing"]
    emb_standing = fx["emb_standing"]
    base = os.path.basename(os.path.normpath(sf_dir))
    root = default_index_root()
    lpath = _tracked_index_path(root, "strlsh_" + base)
    spath = _tracked_index_path(root, "strsrp_" + base)
    gpath = _tracked_index_path(root, "strgix_" + base)
    # three independent standing-index builds (disjoint roots) —
    # overlap them from driver threads (guide §2.6)
    from left_join_on_timeout_spark.concurrency import overlap
    lidx, sidx, gidx = overlap([
        lambda: lsh_index_build(standing, lpath),
        lambda: srp_index_build(emb_standing, spath, dim=64),
        lambda: text_index_build(standing, gpath, token_mode="ngram",
                                 ngram_n=5),
    ])
    emb_by_gid = emb.select(F.col("vec_id").alias("gid"), "embedding")

    stage = tempfile.mkdtemp(prefix="ljot_strcur_")
    src, out, ckpt = (os.path.join(stage, d) for d in ("in", "out", "ck"))
    arrivals.write.mode("overwrite").parquet(src)

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        # Each stage's drop set is consumed by the next stage's
        # anti-join AND the decision sink — persist the batch and the
        # batch-bounded sets for the batch's duration so the admission
        # chain runs once per micro-batch, not once per consumer
        # (r14). The exact verifies shingle / parse only the docs and
        # vectors that appear in candidate pairs — candidate-bounded
        # per batch, so the loop holds NO corpus-sized standing
        # persist (the pre-r14 isets/iv cached the whole standing
        # corpus's shingle sets and vector norms for the stream's
        # lifetime).
        batch_df = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        scr = contamination_screen(batch_df.select("doc_id", "text"),
                                   bench, ngram_n=5)
        screened = (scr.where(F.col("flagged")).select("doc_id")
                    .persist(StorageLevel.MEMORY_AND_DISK))
        adm1 = batch_df.join(F.broadcast(screened), "doc_id",
                             "left_anti")
        cand = (lsh_index_probe(adm1.select("doc_id", "text"), lidx)
                .persist(StorageLevel.MEMORY_AND_DISK))
        psets = (shingle_sets(adm1, "doc_id", "text")
                 .select(F.col("doc_id").alias("probe_id"),
                         F.col("sh_set").alias("set_a"),
                         F.size("sh_set").alias("n_a")))
        cand_iids = (cand.select(F.col("index_id").alias("doc_id"))
                     .distinct())
        isets = (shingle_sets(
            standing.join(F.broadcast(cand_iids), "doc_id",
                          "left_semi"), "doc_id", "text")
                 .select(F.col("doc_id").alias("index_id"),
                         F.col("sh_set").alias("set_b"),
                         F.size("sh_set").alias("n_b")))
        jac = (cand.join(psets, "probe_id").join(isets, "index_id")
               .withColumn("inter",
                           F.size(F.array_intersect("set_a", "set_b")))
               .where(F.col("inter")
                      / (F.col("n_a") + F.col("n_b") - F.col("inter"))
                      >= 0.5))
        dup = (jac.select(F.col("probe_id").alias("doc_id")).distinct()
               .persist(StorageLevel.MEMORY_AND_DISK))
        uniq = adm1.join(F.broadcast(dup), "doc_id", "left_anti")
        qvec = (uniq.select("doc_id", "gid").join(emb_by_gid, "gid")
                .select(F.col("doc_id").alias("vec_id"), "embedding")
                .persist(StorageLevel.MEMORY_AND_DISK))
        scand = (srp_index_probe(qvec, sidx)
                 .persist(StorageLevel.MEMORY_AND_DISK))
        qv = qvec.select(F.col("vec_id").alias("probe_id"),
                         as_double("embedding").alias("va"))
        qv = qv.select("probe_id", "va",
                       l2_norm(F.col("va")).alias("na"))
        scand_iids = (scand.select(F.col("index_id").alias("vec_id"))
                      .distinct())
        iv = (emb_standing
              .join(F.broadcast(scand_iids), "vec_id", "left_semi")
              .select(F.col("vec_id").alias("index_id"),
                      as_double("embedding").alias("vb")))
        iv = iv.select("index_id", "vb",
                       l2_norm(F.col("vb")).alias("nb"))
        scos = (scand.join(qv, "probe_id").join(iv, "index_id")
                .select("probe_id",
                        F.round(dot(F.col("va"), F.col("vb"))
                                / (F.col("na") * F.col("nb")), 6)
                        .alias("cos_sim")))
        semdup = (scos.where(F.col("cos_sim") >= SEM_DUP_THRESHOLD)
                  .select(F.col("probe_id").alias("doc_id"))
                  .distinct()
                  .persist(StorageLevel.MEMORY_AND_DISK))
        admitted = uniq.join(F.broadcast(semdup), "doc_id", "left_anti")
        try:
            try:
                # the manifest is loop-stable (this query built the
                # index; no rebuild can land mid-stream) — the build
                # handle skips the per-batch pointer/meta re-read; the
                # clash check still reads the LIVE ids sidecar (r15)
                text_index_append(admitted.select("doc_id", "text"),
                                  spark, gpath, index=gidx)
            except ValueError:
                # an epoch RETRY re-offers ids the first attempt
                # already appended — the r14 duplicate enforcement
                # refuses, which is exactly the wanted retry
                # semantics (already-done)
                pass
            dec = (screened.select("doc_id",
                                   F.lit("screened").alias("decision"))
                   .unionByName(dup.select(
                       "doc_id", F.lit("dup").alias("decision")))
                   .unionByName(semdup.select(
                       "doc_id", F.lit("semdup").alias("decision")))
                   .unionByName(admitted.select(
                       "doc_id", F.lit("admitted").alias("decision"))))
            dec.write.mode("append").parquet(out)
        finally:
            for df in (batch_df, screened, cand, dup, qvec, scand,
                       semdup):
                df.unpersist()

    q = (spark.readStream.schema(arrivals.schema).parquet(src)
         .writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the at-least-once sink reads retry-proof; all accounting joins
    # are bounded by the arrival batch
    dec = F.broadcast(spark.read.parquet(out).distinct())
    index = text_index_load(spark, gpath)
    adm_ids = dec.where(F.col("decision") == "admitted") \
        .select("doc_id")
    indexed = (index["postings"].select(F.col("id").alias("doc_id"))
               .join(F.broadcast(adm_ids), "doc_id", "left_semi")
               .distinct())
    asrc = arrivals.select("doc_id", "source")
    per = (dec.join(asrc, "doc_id").groupBy("source").pivot(
        "decision", ["screened", "dup", "semdup", "admitted"]).count())
    aidx = (indexed.join(asrc, "doc_id").groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_indexed")))
    acand = arrivals.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"))
    srcs = arrivals.select("source").distinct()
    z = F.lit(0)
    return (srcs
            .join(F.broadcast(acand), "source", "left")
            .join(F.broadcast(per), "source", "left")
            .join(F.broadcast(aidx), "source", "left")
            .select("source",
                    F.coalesce("n_candidates", z).cast("bigint")
                    .alias("n_candidates"),
                    F.coalesce("screened", z).cast("bigint")
                    .alias("n_screened_out"),
                    F.coalesce("dup", z).cast("bigint")
                    .alias("n_dup_dropped"),
                    F.coalesce("semdup", z).cast("bigint")
                    .alias("n_semdup_dropped"),
                    F.coalesce("admitted", z).cast("bigint")
                    .alias("n_admitted"),
                    F.coalesce("n_indexed", z).cast("bigint")
                    .alias("n_indexed")))
