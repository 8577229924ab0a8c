"""ANN index lifecycle — train once, SAVE the trained relations, LOAD
and search (VERDICT r6 item 1).

The fourth-decade measurements (PLANS.md) make the case: building the
trained two-level quantizer over 2 M × 32 k costs ~593 s while a warm
search is a fraction of that — a daily-ingest deployment builds the
index once and serves many searches, so the build and the search must
be separable artifacts, not one fused in-session plan.

What gets persisted (all parquet — columnar, splittable, predicate-
pushable; the format the rest of the engine already speaks):

* ``sup_anchors``   (cell, av, anrm)        — n_super rows, tiny
* ``sub_anchors``   (sid, sub, av, anrm)    — ≤ n_super·k2 rows, tiny
* ``postings``      (id, sid, sub, v, nrm)  — the CAPPED inverted
  lists. Like FAISS ``IndexIVFFlat``, the lists carry the raw vectors:
  search then needs no side lookup into the source table, and the
  pairing join reads (cell-key, vector) straight off the scan. At
  100 TB the postings are the corpus re-partitioned by cell — written
  once per build, partitioned on ``sid`` so a probe prunes to its own
  super-cell's files (partition pruning does the cell routing a
  serving system would do with an explicit shard map).
* ``meta``          one row of knobs — load-time validation, and the
  contract that search uses the SAME cap/probe semantics the build
  baked into the postings.

Search loads the (broadcast-sized) anchor relations, assigns the query
set through them with ZERO training passes — the identical argmax
chain the builder used (``operators.similarity.probe_assign_multi``) —
and equi-joins probed (sid, sub) cells against the postings. Searching
the corpus against its own saved index reproduces
:func:`operators.similarity.ivf2_top_neighbor` row-for-row (the
oracle-paired ``ann_top1_ivf2_saved`` query pins this), which is what
makes the lifecycle a *refactoring* of the fused plan, not a new
approximation.

Reference parity note: the reference engine (kptfh/left-join-on-timeout)
has no ANN surface — this module belongs to the LLM-data-pipeline
extension mandated by the build spec.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from left_join_on_timeout_spark.functions.vectors import as_double, l2_norm
from left_join_on_timeout_spark.operators.similarity import (
    DEFAULT_CELL_CAP,
    DEFAULT_SUB_CELLS,
    DEFAULT_SUPER_CELLS,
    _assign_to_anchors,
    _assign_to_subs,
    _bidir_top1,
    _score,
    _train_two_level,
    probe_assign_multi,
)
from left_join_on_timeout_spark.partitioning import fan_out

INDEX_FORMAT_VERSION = 1


def ivf2_index_build(emb: DataFrame, path: str,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     n_super: int = DEFAULT_SUPER_CELLS,
                     k2: int = DEFAULT_SUB_CELLS,
                     iters: int = 1,
                     cell_cap: int = DEFAULT_CELL_CAP,
                     train_frac: float | None = None,
                     train_seed: str = "42") -> None:
    """TRAIN the two-level quantizer and persist the index under
    ``path`` (overwrite semantics — a rebuild atomically replaces each
    relation). Training is the exact :func:`_train_two_level` recipe
    (optionally sample-trained via ``train_frac`` — the md5-gated
    deterministic sample); the postings are the PRIMARY assignment with
    the degenerate-cell cap already applied, so every future search
    inherits the build's bounded-cell contract without re-deriving it.

    Everything written is a DataFrame write — no driver-side
    materialization; the postings write is the only corpus-sized pass
    and it is one scan → assign → window-cap → write."""
    from pyspark import StorageLevel

    v, sup_anchors, sup, sub_anchors = _train_two_level(
        emb, id_col, vec_col, n_super, k2, iters, train_frac, train_seed)
    sup_anchors.write.mode("overwrite").parquet(
        os.path.join(path, "sup_anchors"))
    sub_anchors.write.mode("overwrite").parquet(
        os.path.join(path, "sub_anchors"))
    assigned = _assign_to_subs(sup, sub_anchors, id_col) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy("sid", "sub")
    capped = (assigned.withColumn("csz", F.count("*").over(w))
              .where(F.col("csz") <= cell_cap).drop("csz"))
    # partitioned by super-cell: a probe's scan prunes to its own sid
    # directory — the file-layout analog of inverted-list sharding
    (capped.select(F.col(id_col).alias("id"), "sid", "sub", "v", "nrm")
     .write.mode("overwrite").partitionBy("sid")
     .parquet(os.path.join(path, "postings")))
    meta = assigned.sparkSession.createDataFrame(
        [(INDEX_FORMAT_VERSION, n_super, k2, iters, cell_cap,
          float(train_frac) if train_frac is not None else 1.0,
          train_seed, id_col)],
        "version INT, n_super INT, k2 INT, iters INT, cell_cap INT, "
        "train_frac DOUBLE, train_seed STRING, id_col STRING")
    meta.write.mode("overwrite").parquet(os.path.join(path, "meta"))
    assigned.unpersist()


def ivf2_index_load(spark: SparkSession, path: str) -> dict:
    """Load a saved index: ``{"meta": Row, "sup_anchors": df,
    "sub_anchors": df, "postings": df}``. The anchor relations are tiny
    (broadcast-bound at search); the postings stay a lazy parquet scan
    — a 100 TB index is never materialized by loading it."""
    meta_rows = spark.read.parquet(os.path.join(path, "meta")).collect()
    if len(meta_rows) != 1:
        raise ValueError(f"corrupt index meta at {path}: "
                         f"{len(meta_rows)} rows")
    meta = meta_rows[0]
    if meta.version != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"index format version {meta.version} at {path}; "
            f"this build reads version {INDEX_FORMAT_VERSION}")
    return {
        "meta": meta,
        "sup_anchors": spark.read.parquet(
            os.path.join(path, "sup_anchors")),
        "sub_anchors": spark.read.parquet(
            os.path.join(path, "sub_anchors")),
        # sid comes back from directory-partition inference (int for
        # small values) — restore the long the assignment relations use
        "postings": spark.read.parquet(os.path.join(path, "postings"))
        .withColumn("sid", F.col("sid").cast("long")),
    }


def ivf2_index_search(queries: DataFrame, index: dict,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      nprobe: int = 1) -> DataFrame:
    """(vec_id, neighbor_id, cos_sim): nearest indexed neighbor per
    query vector — assignment through the LOADED anchors (zero training
    passes), then one equi-join of probed (sid, sub) cells against the
    postings and an exact-cosine argmax. A query whose probed cells
    hold no postings is absent (honest ANN recall semantics, as in the
    in-session searchers). Self-matches (query id == posting id) are
    excluded so searching the corpus against its own index answers
    "nearest OTHER vector".

    ``nprobe`` is the search-time recall knob: the index stores
    primary-assignment postings only (the standard IVF discipline —
    multi-probe happens on the QUERY side at serve time, the lists are
    built once)."""
    sup_anchors = index["sup_anchors"]
    sub_anchors = index["sub_anchors"]
    postings = index["postings"]
    vq = fan_out(queries).select(F.col(id_col),
                                 as_double(vec_col).alias("v"))
    vq = vq.select(id_col, "v", l2_norm(F.col("v")).alias("nrm"))
    if nprobe > 1:
        probed = probe_assign_multi(vq, sup_anchors, sub_anchors, id_col,
                                    nprobe).drop("pri")
    else:
        sup = (_assign_to_anchors(vq, sup_anchors, id_col)
               .withColumnRenamed("cell", "sid"))
        probed = _assign_to_subs(sup, sub_anchors, id_col)
    q = probed.select(F.col(id_col).alias("id_a"), "sid", "sub",
                      F.col("v").alias("va"), F.col("nrm").alias("na"))
    p = postings.select(F.col("id").alias("id_b"), "sid", "sub",
                        F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = (q.join(p, ["sid", "sub"])
             .where(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b", "va", "na", "vb", "nb"))
    scored = _score(pairs)
    best = scored.groupBy(F.col("id_a").alias("vec_id")).agg(
        F.max(F.struct(F.col("cos_sim"),
                       (-F.col("id_b")).alias("neg_id"))).alias("best"))
    return best.select(
        "vec_id",
        (-F.col("best.neg_id")).alias("neighbor_id"),
        F.col("best.cos_sim").alias("cos_sim"))


def ivf2_index_probe_hits(queries: DataFrame, index: dict,
                          threshold: float,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """(new_id, old_id, cos_sim): every indexed cell-mate of each query
    vector with cosine ≥ ``threshold`` — the STATELESS probe shape for
    streaming ingest. Unlike :func:`ivf2_index_search` (per-query
    argmax = a stateful aggregation under streaming semantics), this
    emits the thresholded candidate hits directly: parse → broadcast
    anchor assignment → one equi-join against the standing postings →
    filter, all narrow or stream-static, so a ``readStream`` of new
    vectors can run it per micro-batch with zero streaming state — the
    embedding analog of ``lsh_probe_pairs``'s incremental-ingest
    screen. No ``fan_out`` repartition on the query side: the stream
    stays shuffle-free before the static join."""
    sup_anchors = index["sup_anchors"]
    sub_anchors = index["sub_anchors"]
    postings = index["postings"]
    vq = queries.select(F.col(id_col), as_double(vec_col).alias("v"))
    vq = vq.select(id_col, "v", l2_norm(F.col("v")).alias("nrm"))
    sup = (_assign_to_anchors(vq, sup_anchors, id_col)
           .withColumnRenamed("cell", "sid"))
    probed = _assign_to_subs(sup, sub_anchors, id_col)
    q = probed.select(F.col(id_col).alias("new_id"), "sid", "sub",
                      F.col("v").alias("va"), F.col("nrm").alias("na"))
    p = postings.select(F.col("id").alias("old_id"), "sid", "sub",
                        F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    from left_join_on_timeout_spark.functions.vectors import dot

    return (q.join(p, ["sid", "sub"])
            .where(F.col("new_id") != F.col("old_id"))
            .select("new_id", "old_id",
                    F.round(dot(F.col("va"), F.col("vb"))
                            / (F.col("na") * F.col("nb")), 6)
                    .alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def ivf2_self_search_saved(emb: DataFrame, path: str,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           n_super: int = DEFAULT_SUPER_CELLS,
                           k2: int = DEFAULT_SUB_CELLS,
                           iters: int = 1,
                           cell_cap: int = DEFAULT_CELL_CAP,
                           train_frac: float | None = None,
                           train_seed: str = "42") -> DataFrame:
    """The full lifecycle in one call — build → save → load → search
    the corpus against its own saved index — returning EXACTLY what the
    fused :func:`operators.similarity.ivf2_top_neighbor` returns (the
    oracle-paired query pins the hash): within a surviving cell every
    member is both a query and a posting, each unordered pair is scored
    once via ``id_a < id_b``, and the bidirectional top-1 is taken over
    both directions.

    Search reads ONLY the saved relations plus the re-parsed query
    vectors; nothing from the training session's lineage survives into
    the search plan — the separation a deployment needs to serve from
    yesterday's index."""
    spark = emb.sparkSession
    ivf2_index_build(emb, path, id_col, vec_col, n_super, k2, iters,
                     cell_cap, train_frac, train_seed)
    index = ivf2_index_load(spark, path)
    sup_anchors = index["sup_anchors"]
    sub_anchors = index["sub_anchors"]
    postings = index["postings"]
    vq = fan_out(emb).select(F.col(id_col), as_double(vec_col).alias("v"))
    vq = vq.select(id_col, "v", l2_norm(F.col("v")).alias("nrm"))
    sup = (_assign_to_anchors(vq, sup_anchors, id_col)
           .withColumnRenamed("cell", "sid"))
    probed = _assign_to_subs(sup, sub_anchors, id_col)
    q = probed.select(F.col(id_col).alias("id_a"), "sid", "sub",
                      F.col("v").alias("va"), F.col("nrm").alias("na"))
    p = postings.select(F.col("id").alias("id_b"), "sid", "sub",
                        F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = (q.join(p, ["sid", "sub"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "va", "na", "vb", "nb"))
    return _bidir_top1(_score(pairs))
