#!/usr/bin/env python
"""Sample-trained Lloyd at the fourth decade (VERDICT r6 item 2):
A/B the two-level index BUILD at 2 M vectors with ``train_frac`` vs
the full-corpus-trained 593 s baseline (PLANS.md §"Fourth decade
measured"), then check recall parity on the CLUSTERED third-decade
corpus — the regime where quantizer quality shows.

The hypothesis the run prices: the Lloyd passes (full-corpus argmax +
decimal means, twice per level) are most of the 593 s; training on a
deterministic md5-gated ~2 % slice cuts them ~50× while the full
corpus still pays exactly one final assignment per level — so the
build should approach its assignment floor, and recall on a clustered
corpus should stay within noise (a 40 k-row sample is plenty to place
179 super-centroids).

Usage: python tools/ivf2_sampled_fourth.py [sf100x_vec_dir] [cluster_dir]
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
    ivf2_top_neighbor,
    two_level_assign,
    two_level_knobs,
)
from left_join_on_timeout_spark.partitioning import fan_out
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

SAMPLE_GATE = "0148"  # same ~0.5% truth-query gate as ivf2_recall_cluster


def timed_cold(fn) -> float:
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 1)


def main() -> None:
    vec_dir = (sys.argv[1] if len(sys.argv) > 1
               else "/root/repo/.scale/sf100x_vec")
    cluster_dir = (sys.argv[2] if len(sys.argv) > 2
                   else "/root/repo/.scale/sf10x_cluster")
    frac = float(os.environ.get("SPARK_GRAFT_TRAIN_FRAC", "0.02"))
    spark = get_spark(app_name="ivf2_sampled_fourth")
    spark.sparkContext.setLogLevel("ERROR")

    # --- build wall at the fourth decade -----------------------------
    emb = load_table(spark, vec_dir, "embeddings")
    n = emb.count()
    budget = auto_knobs(n)["n_cells"]
    tk = two_level_knobs(budget)
    out = {"vec_dir": vec_dir, "n_rows": n, "flat_cells": budget,
           "train_frac": frac, **tk}
    out["tree_sampled_cold_s"] = timed_cold(
        lambda: two_level_assign(emb, n_super=tk["n_super"], k2=tk["k2"],
                                 train_frac=frac)
        .select("vec_id", "sid", "sub"))
    out["baseline_full_train_s"] = 593.3  # PLANS.md round-6 measurement
    print(json.dumps(out), flush=True)
    spark.catalog.clearCache()

    # --- recall parity on the clustered corpus -----------------------
    embc = load_table(spark, cluster_dir, "embeddings")
    nc = embc.count()
    budget_c = auto_knobs(nc)["n_cells"]
    tkc = two_level_knobs(budget_c)
    v = fan_out(embc).select("vec_id", as_double("embedding").alias("v"))
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
    truth = (sims.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("s_id", "nbr")
             .persist())
    out["n_sample"] = truth.count()

    def recall(name, build):
        t0 = time.time()
        ann = build().select("vec_id", "neighbor_id").persist()
        hits = (truth.join(ann, truth.s_id == ann.vec_id, "left")
                .where(F.col("neighbor_id") == F.col("nbr")).count())
        out[f"{name}_sec"] = round(time.time() - t0, 1)
        out[f"{name}_recall_at_1"] = round(hits / out["n_sample"], 4)
        ann.unpersist()
        print(json.dumps(out), flush=True)

    recall("tree_full_train_p1", lambda: ivf2_top_neighbor(
        embc, n_super=tkc["n_super"], k2=tkc["k2"], nprobe=1))
    recall("tree_sampled_p1", lambda: ivf2_top_neighbor(
        embc, n_super=tkc["n_super"], k2=tkc["k2"], nprobe=1,
        train_frac=frac))
    recall("tree_sampled_p2", lambda: ivf2_top_neighbor(
        embc, n_super=tkc["n_super"], k2=tkc["k2"], nprobe=2,
        train_frac=frac))


if __name__ == "__main__":
    main()
