#!/usr/bin/env python
"""Locate the flat-argmax → two-level-tree assignment CROSSOVER
(VERDICT r6 item 6): cold index-assignment wall (training included)
for both arms at a ladder of corpus sizes, so ``auto_knobs`` can route
a scale user to the surviving path on a MEASURED rule instead of a
FLOP-model guess.

Ladder: 2 k (the bench corpus — tree known slower, it pays two Lloyd
passes the flat arm skips), 20 k and 63 k (md5-gated re-densified
slices of the third-decade corpus), 200 k (third decade — tree known
3.3× faster). Slices are RE-DENSIFIED (row_number → new contiguous id)
and materialized to parquet BEFORE timing, so the flat arm's anchor
population (ids < budget) always equals its budget — the fairness rule
the fourth-decade A/B established (PLANS.md).

Also times the sample-trained tree (``train_frac=0.05``, VERDICT r6
item 2) at each rung, pricing the Lloyd-on-a-slice recipe across
decades in the same run.

Usage: python tools/ivf2_crossover.py [sf01_dir] [sf10x_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.sampling import sample_gate
from left_join_on_timeout_spark.operators.similarity import (
    auto_knobs,
    ivf_assign_multi,
    two_level_assign,
    two_level_knobs,
)
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table


def timed_cold(fn) -> float:
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 1)


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf10x = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf10x"
    spark = get_spark(app_name="ivf2_crossover")
    spark.sparkContext.setLogLevel("ERROR")

    full10x = load_table(spark, sf10x, "embeddings")

    def densified_slice(frac: float, label: str):
        path = f"/tmp/xover_{label}"
        if not os.path.exists(path):
            w = Window.orderBy("vec_id")
            sliced = (full10x.where(sample_gate("vec_id", frac))
                      .withColumn("new_id",
                                  F.row_number().over(w).cast("long") - 1)
                      .select(F.col("new_id").alias("vec_id"), "embedding"))
            sliced.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    rungs = [
        ("2k", load_table(spark, sf01, "embeddings")),
        ("20k", densified_slice(0.1, "20k")),
        ("63k", densified_slice(0.315, "63k")),
        ("200k", full10x),
    ]
    for label, emb in rungs:
        n = emb.count()
        budget = auto_knobs(n)["n_cells"]
        tk = two_level_knobs(budget)
        out = {"rung": label, "n_rows": n, "flat_cells": budget, **tk}
        out["flat_cold_s"] = timed_cold(
            lambda: ivf_assign_multi(emb, n_cells=budget, nprobe=1)
            .select("vec_id", "cell"))
        out["tree_cold_s"] = timed_cold(
            lambda: two_level_assign(emb, n_super=tk["n_super"],
                                     k2=tk["k2"])
            .select("vec_id", "sid", "sub"))
        out["tree_sampled_cold_s"] = timed_cold(
            lambda: two_level_assign(emb, n_super=tk["n_super"],
                                     k2=tk["k2"], train_frac=0.05)
            .select("vec_id", "sid", "sub"))
        print(json.dumps(out), flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
