#!/usr/bin/env python
"""Third-decade knob-rule A/B (VERDICT r4 item 7): on the 100× corpus
(200k vectors), time ``ivf_top_neighbor`` with the PREVIOUS decade's
cell count (320 — correct for 20k rows, one decade stale here) against
the auto-derived value (``auto_knobs(200000) → 3200``), and
``ann_top_neighbor`` with stale vs auto SRP bits (11 vs 15). Min of two
warm runs each, same discipline as measure_scaling.py.

Usage: python tools/knob_ab_100x.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from left_join_on_timeout_spark.operators.similarity import (
    ann_top_neighbor,
    auto_knobs,
    ivf_top_neighbor,
)
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table


def timed(fn, repeats: int = 2) -> float:
    def one() -> float:
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    if repeats == 1:
        # single-shot: for the deliberately-stale knob arms, whose gap
        # to the auto arm is 10x-scale — one run is decisive and the
        # warm+min discipline would triple a multi-minute quadratic
        return round(one(), 3)
    one()  # warm
    return round(min(one() for _ in range(repeats)), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10x"
    spark = get_spark(app_name="knob_ab_100x")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    auto = auto_knobs(n)
    out = {"sf_dir": sf_dir, "n_rows": n, "auto": auto}
    out["ivf_auto"] = timed(
        lambda: ivf_top_neighbor(emb, n_cells=auto["n_cells"]))
    print(json.dumps(out), flush=True)
    out["srp_auto"] = timed(
        lambda: ann_top_neighbor(emb, n_bits=auto["n_bits"]))
    print(json.dumps(out), flush=True)
    out["srp_stale_11"] = timed(
        lambda: ann_top_neighbor(emb, n_bits=11), repeats=1)
    print(json.dumps(out), flush=True)
    out["ivf_stale_320"] = timed(
        lambda: ivf_top_neighbor(emb, n_cells=320), repeats=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
