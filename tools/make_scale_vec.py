#!/usr/bin/env python
"""Fourth-decade EMBEDDINGS corpus: scale sf0.1's 2 000 vectors by
``factor`` (default 1000 → 2 M rows) with the same deterministic
per-(id, dim, replica) pseudo-noise recipe as make_scale10.py, so
near-neighbour structure perturbs instead of collapsing into cosine-1
twins.

Ids are DENSE (``rep * n_orig + orig``, originals keep 0..1999) —
unlike make_scale10's ``rep * 10M + orig`` scheme. The seedless anchor
rule (``ivf_assign``: anchors = ids < n_cells) assumes dense ids; on
the sparse-id sf10x corpus a 3200-cell budget silently yields only the
2000 original anchors (recorded in PLANS.md §"fourth decade"). Dense
ids make the flat arm's anchor population equal its budget, so the
fourth-decade flat-vs-tree FLOP comparison measures what it claims.
(Anchors 2000..31999 are ±0.005-noise replicas of originals — fine for
assignment COST, which depends only on anchor count; a recall study at
this decade would need a corpus with real cluster structure.)

Only embeddings is scaled (the fourth-decade ANN measurement touches
nothing else); other tables copy verbatim so ``load_table`` works
against the output dir.

Usage: python tools/make_scale_vec.py [out_dir] [factor]
Defaults: /root/repo/.scale/sf100x_vec  1000
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import TABLES, load_table

SRC = "/root/testdata/sf0.1"
N_ORIG = 2_000  # sf0.1 embeddings cardinality (vec_id 0..1999, dense)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100x_vec"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make_scale_vec")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SRC, "embeddings")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    noise = lambda i: (  # noqa: E731 — deterministic ±0.005 per coord
        (F.pmod(F.hash(F.col("vec_id"), i, F.col("rep")), F.lit(1000))
         .cast("float") - 500.0) / 100_000.0)
    # repartition BEFORE the per-coordinate noise transform: the
    # source is one parquet file (one partition), so without it the
    # whole factor× expansion — n_orig·factor·dim hash evaluations —
    # runs in a single task and the 20 M generation is core-bound on
    # one thread (observed r10); shuffling the expanded-but-untouched
    # rows first spreads the transform across the session's cores
    scaled = (emb.crossJoin(F.broadcast(reps))
              .repartition(32)
              .select(
                  (F.col("vec_id") + F.col("rep") * N_ORIG)
                  .alias("vec_id"),
                  F.when(F.col("rep") == 0, F.col("embedding"))
                  .otherwise(F.transform(
                      "embedding",
                      lambda x, i: x + noise(i))).alias("embedding"),
                  "label"))
    scaled.write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))

    for t in TABLES:
        if t == "embeddings":
            continue
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst) and os.path.isfile(src):
            shutil.copyfile(src, dst)

    n = spark.read.parquet(os.path.join(out, "embeddings.parquet")).count()
    print(f"embeddings: {n} rows (factor={factor})")


if __name__ == "__main__":
    main()
