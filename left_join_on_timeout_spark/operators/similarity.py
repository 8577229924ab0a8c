"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB design demands:

* ``brute_force_knn`` — exact cosine top-k against a (broadcast) query
  vector: one scan, no shuffle but the final top-k (TakeOrdered). The
  correctness baseline.
* ``ann_bucketed_top1`` — the scale path: sign-random-projection buckets
  (``srp_bucket``) turn neighbor search into an equi-join within buckets;
  candidate count drops ~2^bits-fold and the join shuffles digests+ids,
  not raw vectors, until the final scoring join.

All vector math is JVM-side higher-order functions in double
(``functions.vectors``), bit-compatible with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from left_join_on_timeout_spark.functions.vectors import as_double, cosine, srp_bucket


def brute_force_knn(emb: DataFrame, query_id: int, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against the embedding of ``query_id``.

    The single query row is broadcast — the scan side never shuffles; the
    global top-k is a TakeOrdered (per-partition heads, then driver merge
    of k·partitions rows)."""
    q = (emb.where(F.col(id_col) == query_id)
         .select(as_double(vec_col).alias("q_vec")))
    scored = (emb.where(F.col(id_col) != query_id)
              .crossJoin(F.broadcast(q))
              .select(F.col(id_col),
                      F.round(cosine(as_double(vec_col), F.col("q_vec")), 6)
                      .alias("cos_sim")))
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def ann_bucketed_top1(emb: DataFrame, n_bits: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Approximate nearest neighbor per vector, searched within its SRP
    bucket only: (vec_id, neighbor_id, cos_sim). Vectors alone in their
    bucket are absent from the output (honest ANN recall semantics)."""
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"),
                   srp_bucket(as_double(vec_col), n_bits).alias("bucket"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "bucket")
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "bucket")
    pairs = (a.join(b, "bucket")
             .where(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b",
                     F.round(cosine(F.col("va"), F.col("vb")), 6)
                     .alias("cos_sim")))
    best = pairs.groupBy("id_a").agg(
        F.max(F.struct(F.col("cos_sim"), (-F.col("id_b")).alias("neg_id")))
        .alias("best"))
    return best.select(
        F.col("id_a").alias("vec_id"),
        (-F.col("best.neg_id")).alias("neighbor_id"),
        F.col("best.cos_sim").alias("cos_sim"))


def embedding_near_dup_pairs(emb: DataFrame, threshold: float,
                             n_bits: int = 8,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``, bucketed
    by SRP so candidate generation is an equi-join (the dedup scale path)."""
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"),
                   srp_bucket(as_double(vec_col), n_bits).alias("bucket"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "bucket")
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (a.join(b, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(cosine(F.col("va"), F.col("vb")), 6)
                    .alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))
