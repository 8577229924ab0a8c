#!/usr/bin/env python
"""Third-decade embeddings corpus WITH REAL CLUSTER STRUCTURE — the
recall companion to the cost-only fourth-decade corpus.

The bench/testdata embeddings are near-uniform random: ANN's
adversarial case (no structure for any index to exploit), right for
COST measurements but unable to answer the question the two-level
quantizer's recall table raises (PLANS.md §"fourth-decade ANN"): does
the tree's greedy super-cell split still cost recall when the corpus
has the cluster structure real embedding corpora have? This generator
builds the corpus that can answer it:

* ``n_clusters`` Gaussian-ish clusters of ``members`` vectors each —
  center coordinates deterministic-uniform in [-1, 1] per (cluster,
  dim), member = center + eps * uniform-noise per (id, dim).  With
  dim=64 and eps=0.15 the expected inter-center distance (~6.5) dwarfs
  the member-to-center radius (~0.7): each vector's true nearest
  neighbor is in its own cluster essentially always, which is exactly
  the regime an IVF-family index is built for.
* Ids are DENSE and cluster-interleaved (``id = member * n_clusters +
  cluster``, so ``cluster = id % n_clusters``): the seedless anchor
  rule (anchors = ids < n_cells) then seeds anchors across DISTINCT
  clusters — a uniform draw, as in a real deployment — instead of
  exhausting the first few clusters.

Only embeddings is generated; other tables copy verbatim from sf0.1 so
``load_table`` works against the output dir.

Usage: python tools/make_scale_cluster.py [out_dir] [n_clusters] [members]
Defaults: /root/repo/.scale/sf10x_cluster  2000  100   (= 200 k rows)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import TABLES

SRC = "/root/testdata/sf0.1"
DIM = 64
EPS = 0.15


def _unif(*cols) -> F.Column:
    """Deterministic pseudo-uniform in [-1, 1] from a hash of cols."""
    return (F.pmod(F.hash(*cols), F.lit(2001)).cast("double")
            - 1000.0) / 1000.0


def main() -> None:
    out = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scale/sf10x_cluster")
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    members = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make_scale_cluster")
    spark.sparkContext.setLogLevel("ERROR")

    n = n_clusters * members
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    cluster = F.pmod(F.col("vec_id"), F.lit(n_clusters))
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))
    emb = ids.select(
        "vec_id",
        F.transform(
            dims,
            lambda i: (_unif(cluster, i, F.lit("ctr"))
                       + EPS * _unif(F.col("vec_id"), i, F.lit("mem")))
            .cast("float")).alias("embedding"),
        F.pmod(cluster, F.lit(10)).cast("int").alias("label"))
    emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))

    for t in TABLES:
        if t == "embeddings":
            continue
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst) and os.path.isfile(src):
            shutil.copyfile(src, dst)

    got = spark.read.parquet(os.path.join(out, "embeddings.parquet")).count()
    print(f"embeddings: {got} rows "
          f"({n_clusters} clusters x {members} members, eps={EPS})")


if __name__ == "__main__":
    main()
