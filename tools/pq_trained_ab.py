#!/usr/bin/env python
"""Seed-vs-TRAINED PQ codebook A/B (VERDICT r7 item 3): does one
per-block Lloyd pass over the corpus subvectors lift compressed-domain
recall over the first-k seed codebook, at rerank 0 and at the
deployment rerank R=20?

Arms (same IVF coarse cells, same m x k codebook budget):

* seed r0      — first-k codewords, pure SDC argmin
* seed r20     — first-k codewords, top-20 SDC shortlist + exact rerank
* trained r0   — one gated-Lloyd pass per block (train_frac sampled)
* trained r20  — trained codebook + rerank

Ground truth is exact brute force over a deterministic md5-gated query
sample (the ``ann_recall_*`` discipline). Results land in PLANS.md.

Usage: python tools/pq_trained_ab.py [sf_dir] [train_frac] [gate]
Default: /root/testdata/sf0.1 (full-truth scale), frac 0.5, gate
"1000" (~6% query sample — drop it at larger corpora: the exact-truth
pass is |S|·N).
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
    pq_sdc_top_neighbor,
)
from left_join_on_timeout_spark.partitioning import fan_out
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

SAMPLE_GATE = "1000"  # ~6% of 2^16


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    gate = sys.argv[3] if len(sys.argv) > 3 else SAMPLE_GATE
    spark = get_spark(app_name="pq_trained_ab")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, src, "embeddings")
    n = emb.count()
    # corpus-sized coarse cells (the auto_knobs rule) — the 32-cell
    # default is bench-scale only; at 200k rows every default cell
    # blows past cell_cap and the index would be empty
    cells = auto_knobs(n)["n_cells"]
    out = {"sf_dir": src, "n_rows": n, "m": 4, "k": 16,
           "n_cells": cells, "train_frac": frac}

    v = fan_out(emb).select("vec_id", as_double("embedding").alias("v"))
    v = (v.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
         .persist())
    s = (v.where(sample_key("vec_id") < gate)
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

    recall("seed_r0", lambda: pq_sdc_top_neighbor(emb, n_cells=cells))
    recall("seed_r20", lambda: pq_sdc_top_neighbor(
        emb, n_cells=cells, rerank=20))
    recall("trained_r0", lambda: pq_sdc_top_neighbor(
        emb, n_cells=cells, train_iters=1, train_frac=frac))
    recall("trained_r20", lambda: pq_sdc_top_neighbor(
        emb, n_cells=cells, rerank=20, train_iters=1, train_frac=frac))


if __name__ == "__main__":
    main()
