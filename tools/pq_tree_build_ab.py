#!/usr/bin/env python
"""Flat vs TREE coarse assignment for the PQ index build at the
fourth decade (2 M vectors) and the third-decade 3200-cell budget —
the knob the flat path could NOT deliver (PLANS.md §fifth-decade PQ:
the flat 2 M × 3200 build was killed past 40 minutes). The tree covers
the same cell budget with O(n_super + k2) dot products per row
(`two_level_knobs`), sample-trained Lloyd, composite cell = sid·k2+sub.

Reports build wall + a warm probe of a held-out batch against each
index so the serve side is compared at the same budget too.

Usage: python tools/pq_tree_build_ab.py [vec_dir] [budget]
At the fifth decade (20 M, budget 32000) run with
SPARK_GRAFT_DRIVER_MEM=64g — the 8 g default OOMs the grouped Lloyd
pass, the same note as every fourth/fifth-decade tool.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.ann_index import (
    pq_index_build,
    pq_index_load,
    pq_index_search,
)
from left_join_on_timeout_spark.operators.sampling import sample_key
from left_join_on_timeout_spark.operators.similarity import (
    two_level_knobs,
)
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

BATCH_GATE = "0020"
CELL_CAP = 20_000


def main() -> None:
    src = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scale/sf100x_vec")
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 3200
    spark = get_spark(app_name="pq_tree_build_ab")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, src, "embeddings")
    n = emb.count()
    tk = two_level_knobs(budget)
    out = {"src": src, "n_rows": n, "budget": budget, **tk,
           "train_frac": round(min(1.0, 40_000 / n), 4)}
    gate = sample_key("vec_id") < BATCH_GATE
    corpus = emb.where(~gate | (F.col("vec_id") < budget))
    batch = emb.where(gate & (F.col("vec_id") >= budget))
    out["batch_rows"] = batch.count()

    path = "/root/repo/.scale/pqidx_tree_2M"
    t0 = time.time()
    pq_index_build(corpus, path, cell_cap=CELL_CAP, coarse="tree",
                   n_super=tk["n_super"], k2=tk["k2"],
                   train_frac=out["train_frac"])
    out["tree_build_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    spark.catalog.clearCache()

    index = pq_index_load(spark, path)
    t0 = time.time()
    (pq_index_search(batch, index)
     .write.format("noop").mode("overwrite").save())
    out["tree_probe_cold_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    (pq_index_search(batch, index)
     .write.format("noop").mode("overwrite").save())
    out["tree_probe_warm_s"] = round(time.time() - t0, 1)
    # the flat arm at this budget is the killed-at-40-min run
    # (PLANS.md); re-measuring it would burn the wall for a known
    # answer, so the flat number is recorded as a lower bound
    out["flat_build_s_lower_bound"] = 2400.0
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
