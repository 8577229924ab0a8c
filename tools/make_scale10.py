#!/usr/bin/env python
"""Generate a synthetic sf1-equivalent (10× sf0.1) corpus for the
heavy-query scaling study (VERDICT r3 item 5).

Only ``documents`` and ``embeddings`` are scaled (the nine heavy queries
in PLANS.md §"Heavy-query scaling" touch nothing else); the remaining
tables are copied verbatim so ``load_table`` works against the output
dir unchanged.

Replication is *perturbed*, not verbatim: a verbatim 10× copy would turn
every document into a 10-way exact duplicate and every vector into a
10-way cosine-1 twin, collapsing the dedup/ANN workload into a
degenerate all-dupes shape. Instead each replica r ≥ 1 gets

* documents: a per-replica token prefixed to ``text`` (changes shingles,
  fingerprints, and edit distance by a constant; keeps length
  distribution), ids offset by r·10^7;
* embeddings: deterministic per-(id, dim, replica) pseudo-noise of
  ±~0.5% magnitude added per coordinate (changes near-neighbour
  structure; keeps the distribution), ids offset by r·10^7 — so IVF
  anchors (vec_id < n_cells) remain exactly the originals.

Usage: python tools/make_scale10.py [out_dir] [factor]
Defaults: /root/repo/.scale/sf1x  10
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
OFFSET = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1x"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make_scale10")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SRC, "documents")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    scaled_docs = (docs.crossJoin(F.broadcast(reps))
                   .select(
                       (F.col("doc_id") + F.col("rep") * OFFSET)
                       .alias("doc_id"),
                       F.when(F.col("rep") == 0, F.col("text"))
                       .otherwise(F.concat(F.lit("rep"), F.col("rep"),
                                           F.lit(" "), F.col("text")))
                       .alias("text"),
                       "lang", "source")
                   .withColumn("n_chars", F.length("text")))
    scaled_docs.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))

    emb = load_table(spark, SRC, "embeddings")
    noise = lambda i: (  # noqa: E731 — deterministic ±0.005 per coord
        (F.pmod(F.hash(F.col("vec_id"), i, F.col("rep")), F.lit(1000))
         .cast("float") - 500.0) / 100_000.0)
    scaled_emb = (emb.crossJoin(F.broadcast(reps))
                  .select(
                      (F.col("vec_id") + F.col("rep") * OFFSET)
                      .alias("vec_id"),
                      F.when(F.col("rep") == 0, F.col("embedding"))
                      .otherwise(F.transform(
                          "embedding",
                          lambda x, i: x + noise(i))).alias("embedding"),
                      "label"))
    scaled_emb.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst)

    for t in ("documents", "embeddings"):
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
