#!/usr/bin/env python
"""Fourth-decade END-TO-END ANN search (companion to
``tools/ivf2_fourth.py``, which measured the index BUILD only): run
``ivf2_top_neighbor`` cold over the full 2 M dense-id corpus —
two-level training, assignment, cell-cap, within-cell pairing, exact
cosine scoring, bidirectional top-1 — and report one wall number plus
the result-row count.

The point: the build A/B proved only the tree's ASSIGNMENT survives
this decade (flat ≈ 25.4 ks extrapolated vs tree 593 s); this measures
that the rest of the search pipeline — the (sid, sub)-keyed self-join
and the argmax tail — adds an affordable constant on top, i.e. a FULL
ANN pass over 2 M vectors fits an ingest window end to end. Per-cell
work is bounded by the cap (62-row expected cells → ~1.9 k pairs/cell),
so the pairing term is corpus-linear by construction; this run prices
it.

p=1 only: the super-probe recall knob multiplies the same bounded
terms (index rows × nprobe), and its recall story is already measured
at the third decade on the clustered corpus
(tools/ivf2_recall_cluster.py).

Usage: python tools/ivf2_search_fourth.py [sf100x_vec_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from left_join_on_timeout_spark.operators.similarity import (
    auto_knobs,
    ivf2_top_neighbor,
    two_level_knobs,
)
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100x_vec"
    spark = get_spark(app_name="ivf2_search_fourth")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, src, "embeddings")
    n = emb.count()
    budget = auto_knobs(n)["n_cells"]
    tk = two_level_knobs(budget)
    out = {"sf_dir": src, "n_rows": n, "flat_cells": budget, **tk}

    t0 = time.time()
    res = ivf2_top_neighbor(emb, n_super=tk["n_super"], k2=tk["k2"])
    out["result_rows"] = res.count()
    out["search_full_cold_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
