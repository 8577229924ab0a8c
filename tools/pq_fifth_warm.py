#!/usr/bin/env python
"""Fifth-decade warm-search spot-measure for the IVF-PQ tier (VERDICT
r7 item 7): the ANN fifth-decade table covers IVF2 only — this bounds
the COMPRESSED-DOMAIN serving story at scale: build a code-only PQ
index over 2 M and 20 M vectors once, then time the incremental probe
(a held-out ~0.05 % batch of new vectors searched through the LOADED
codebook/anchors/LUT), rerank=0 and rerank=20.

Knobs: the coarse quantizer of the PQ tier is the FLAT argmax (the
two-level tree is the IVF2 family's), and the flat assign's
O(n·n_cells) interpreted dot products are the measured build
bottleneck — a first attempt at the third-decade 3200-cell budget put
the 2 M build alone past 40 minutes (6.4e9 64-dim folds), confirming
at PQ scale exactly what the IVF2 crossover study measured: past a
few hundred cells the flat argmax is not the surviving assignment
plan. Both decades therefore pin cells to 320 (under the measured
512-cell crossover) with cell_cap raised to hold the resulting
62.5 k-row cells at 20 M; the quantity under test — compressed-domain
probe cost per indexed row, cell-size × m O(1) lookups — is knob-
consistent across the decade step. Codes postings are a few bytes/row
— the 20 M index is ~100× smaller on disk than the vector-carrying
IVF2 postings, the PQ memory contract.

Usage: python tools/pq_fifth_warm.py [vec2m_dir] [vec20m_dir]
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
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

N_CELLS = 320
CELL_CAP = 100_000
BATCH_GATE = "0020"  # ~0.05% of 2^16


def main() -> None:
    dirs = [
        ("2M", sys.argv[1] if len(sys.argv) > 1
         else "/root/repo/.scale/sf100x_vec"),
        ("20M", sys.argv[2] if len(sys.argv) > 2
         else "/root/repo/.scale/sf1000x_vec"),
    ]
    spark = get_spark(app_name="pq_fifth")
    spark.sparkContext.setLogLevel("ERROR")

    for label, src in dirs:
        emb = load_table(spark, src, "embeddings")
        n = emb.count()
        out = {"decade": label, "n_rows": n, "n_cells": N_CELLS,
               "cell_cap": CELL_CAP, "m": 4, "k": 16}
        gate = sample_key("vec_id") < BATCH_GATE
        corpus = emb.where(~gate | (F.col("vec_id") < N_CELLS))
        batch = emb.where(gate & (F.col("vec_id") >= N_CELLS))
        out["batch_rows"] = batch.count()
        path = f"/root/repo/.scale/pqidx_{label}"
        t0 = time.time()
        pq_index_build(corpus, path, n_cells=N_CELLS, cell_cap=CELL_CAP)
        out["build_s"] = round(time.time() - t0, 1)
        import subprocess
        out["index_disk"] = subprocess.run(
            ["du", "-sh", path], capture_output=True,
            text=True).stdout.split()[0]
        print(json.dumps(out), flush=True)
        spark.catalog.clearCache()

        index = pq_index_load(spark, path)
        t0 = time.time()
        (pq_index_search(batch, index)
         .write.format("noop").mode("overwrite").save())
        out["probe_cold_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        (pq_index_search(batch, index)
         .write.format("noop").mode("overwrite").save())
        out["probe_warm_s"] = round(time.time() - t0, 1)
        out["probe_us_per_indexed_row"] = round(
            out["probe_warm_s"] * 1e6 / n, 3)
        t0 = time.time()
        (pq_index_search(batch, index, rerank=20, corpus=corpus)
         .write.format("noop").mode("overwrite").save())
        out["probe_rerank20_s"] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
