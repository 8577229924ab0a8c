#!/usr/bin/env python
"""Recall study on a corpus with REAL cluster structure (the question
PLANS.md §"fourth-decade ANN" leaves open): the tree's recall cost was
measured only on the adversarial near-uniform bench corpus — does it
persist when the corpus clusters, i.e. in the regime IVF indexes are
actually deployed in?

Arms (all at the SAME corpus-sized cell budget, ``auto_knobs(n)``):

* flat argmax, p=1 and p=2 (``ivf_top_neighbor``)
* trained two-level, p=1 and p=2 super-probes (``ivf2_top_neighbor``)

Ground truth is exact brute force over a deterministic md5-gated
~0.5 % query sample (the ``ann_recall_*`` discipline: |S|·N stays
linear in the corpus — full ground truth at this scale would be a
40-G-pair quadratic). Each arm reports recall@1 against the sampled
truth plus its cold wall time.

Usage: python tools/ivf2_recall_cluster.py [cluster_dir]
Default: /root/repo/.scale/sf10x_cluster  (tools/make_scale_cluster.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from left_join_on_timeout_spark.functions.vectors import as_double, l2_norm
from left_join_on_timeout_spark.operators.sampling import sample_key
from left_join_on_timeout_spark.operators.similarity import (
    auto_knobs,
    ivf_top_neighbor,
    ivf2_top_neighbor,
    two_level_knobs,
)
from left_join_on_timeout_spark.partitioning import fan_out
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

SAMPLE_GATE = "0148"  # ~0.5% of 2^16 — ~1000 queries at 200 k rows


def main() -> None:
    src = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scale/sf10x_cluster")
    spark = get_spark(app_name="ivf2_recall_cluster")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, src, "embeddings")
    n = emb.count()
    budget = auto_knobs(n)["n_cells"]
    tk = two_level_knobs(budget)
    out = {"sf_dir": src, "n_rows": n, "flat_cells": budget, **tk}

    # exact truth on the hash-gated sample (broadcast the sample, scan
    # the corpus once; per-query argmax through partial aggregation)
    v = fan_out(emb).select("vec_id", as_double("embedding").alias("v"))
    v = (v.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
         .persist())
    s = (v.where(sample_key("vec_id") < SAMPLE_GATE)
         .select(F.col("vec_id").alias("s_id"), F.col("v").alias("sv"),
                 F.col("nrm").alias("snrm")))
    sims = (v.join(F.broadcast(s), F.col("vec_id") != F.col("s_id"))
            .select("s_id", F.col("vec_id").alias("nbr"),
                    F.round(F.aggregate(
                        F.zip_with("sv", "v", lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
                        / (F.col("snrm") * F.col("nrm")), 6).alias("sim")))
    w = Window.partitionBy("s_id").orderBy(F.desc("sim"), F.asc("nbr"))
    t0 = time.time()
    truth = (sims.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("s_id", "nbr")
             .persist())
    out["n_sample"] = truth.count()
    out["truth_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)

    def recall(name, build):
        t0 = time.time()
        ann = build().select("vec_id", "neighbor_id").persist()
        hits = (truth.join(ann, truth.s_id == ann.vec_id, "left")
                .where(F.col("neighbor_id") == F.col("nbr")).count())
        out[f"{name}_sec"] = round(time.time() - t0, 1)
        out[f"{name}_recall_at_1"] = round(hits / out["n_sample"], 4)
        ann.unpersist()
        print(json.dumps(out), flush=True)

    recall("flat_p1", lambda: ivf_top_neighbor(
        emb, n_cells=budget, nprobe=1))
    recall("flat_p2", lambda: ivf_top_neighbor(
        emb, n_cells=budget, nprobe=2))
    recall("tree_p1", lambda: ivf2_top_neighbor(
        emb, n_super=tk["n_super"], k2=tk["k2"], nprobe=1))
    recall("tree_p2", lambda: ivf2_top_neighbor(
        emb, n_super=tk["n_super"], k2=tk["k2"], nprobe=2))


if __name__ == "__main__":
    main()
