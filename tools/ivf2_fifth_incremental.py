#!/usr/bin/env python
"""Fifth-decade spot-measure of the INCREMENTAL shapes (VERDICT r6
item 7): the two operations a daily 100 TB ingest actually re-runs —
probing a standing ANN index with a new batch, never rebuilding it.

For each decade (2 M, 20 M vectors):

1. build the standing two-level index ONCE — sample-trained
   (``train_frac`` scaled so the Lloyd sample stays ~40 k rows), pinned
   179×179 knobs (the fourth-decade budget; at 20 M that is ~625
   rows/cell — the build is the amortized daily cost, reported but not
   the headline), SAVED to parquet via ``ivf2_index_build``;
2. time the INCREMENTAL probe: a held-out ~0.1 % batch of new vectors
   (md5-gated, seeds excluded from the gate so the anchor rule is
   untouched) searched against the loaded index with
   ``ivf2_index_search`` — assignment through broadcast anchors plus
   ONE equi-join against the postings scan.

The claim under test: probe wall grows with batch + index SCAN (one
pass over the postings), never with any corpus-quadratic term — so
wall-per-INDEXED-row stays flat or falls across the decade step.

Usage: python tools/ivf2_fifth_incremental.py [vec2m_dir] [vec20m_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.ann_index import (
    ivf2_index_build,
    ivf2_index_load,
    ivf2_index_search,
)
from left_join_on_timeout_spark.operators.sampling import sample_key
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

KNOBS = {"n_super": 179, "k2": 179}  # fourth-decade budget, pinned
BATCH_GATE = "0020"  # ~0.05% of 2^16 — ~1k/10k new vectors per decade
TRAIN_SAMPLE_ROWS = 40_000  # Lloyd sample target (constant per decade)


def main() -> None:
    dirs = [
        ("2M", sys.argv[1] if len(sys.argv) > 1
         else "/root/repo/.scale/sf100x_vec"),
        ("20M", sys.argv[2] if len(sys.argv) > 2
         else "/root/repo/.scale/sf1000x_vec"),
    ]
    spark = get_spark(app_name="ivf2_fifth")
    spark.sparkContext.setLogLevel("ERROR")

    for label, src in dirs:
        emb = load_table(spark, src, "embeddings")
        n = emb.count()
        out = {"decade": label, "n_rows": n, **KNOBS}
        # held-out new batch: md5-gated, but anchor seeds (ids <
        # n_super) stay in the corpus so the seed rule is unaffected
        gate = sample_key("vec_id") < BATCH_GATE
        corpus = emb.where(~gate | (F.col("vec_id") < KNOBS["n_super"]))
        batch = emb.where(gate & (F.col("vec_id") >= KNOBS["n_super"]))
        out["batch_rows"] = batch.count()
        frac = min(1.0, TRAIN_SAMPLE_ROWS / n)
        path = f"/root/repo/.scale/idx_{label}"
        t0 = time.time()
        ivf2_index_build(corpus, path, n_super=KNOBS["n_super"],
                         k2=KNOBS["k2"], train_frac=frac)
        out["build_s"] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)
        spark.catalog.clearCache()

        index = ivf2_index_load(spark, path)
        t0 = time.time()
        (ivf2_index_search(batch, index)
         .write.format("noop").mode("overwrite").save())
        out["probe_cold_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        (ivf2_index_search(batch, index)
         .write.format("noop").mode("overwrite").save())
        out["probe_warm_s"] = round(time.time() - t0, 1)
        out["probe_us_per_indexed_row"] = round(
            out["probe_warm_s"] * 1e6 / n, 3)
        print(json.dumps(out), flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
