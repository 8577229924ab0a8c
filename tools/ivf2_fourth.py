#!/usr/bin/env python
"""Fourth-decade ANN assignment A/B (VERDICT r5 item 3, the decade the
flat argmax breaks): on the 1000× DENSE-ID corpus (2 M vectors,
``tools/make_scale_vec.py``), time the cold index build of the trained
two-level tree against the flat broadcast argmax at the SAME cell
budget (``auto_knobs(2_000_000)`` → 32 000 cells; ``two_level_knobs``
→ 179 × 179).

The tree runs the FULL corpus — its per-row cost is n_super + k2 = 358
dot products, ~92 GFLOP total plus two Lloyd training passes. The flat
arm at 2 M × 32 k is ~8.2 TFLOP of interpreted higher-order-function
dot products (~4.5 h at the measured ~0.5 GFLOP/s whole-host rate) —
unrunnable in a measurement window, WHICH IS THE POINT. It is instead
measured on two row-slices against the full 32 000-anchor set and
extrapolated linearly: the assignment plan is purely map-side
(scan → broadcast-join of ONE collapsed anchor-array row → per-row
transform/argmax project; no exchange, no cross-row term — plan-gated
in tests/test_plans.py), so per-row cost is row-count-independent by
construction, and the two slice sizes exhibit the linearity in the
measurement itself rather than assuming it.

Slices keep every anchor-eligible row (ids < 32 000) and gate probe
rows on a deterministic md5 bucket, so both slices score against the
identical full anchor array.

Usage: python tools/ivf2_fourth.py [sf100x_vec_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    """Single-shot cold build (no persisted index to warm — the same
    repeats=1 discipline as tools/ivf2_ab.py's assignment arms)."""
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 1)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100x_vec"
    spark = get_spark(app_name="ivf2_fourth")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, src, "embeddings")
    n = emb.count()
    budget = auto_knobs(n)["n_cells"]
    tk = two_level_knobs(budget)
    out = {"sf_dir": src, "n_rows": n, "flat_cells": budget, **tk}

    # tree: FULL corpus, cold, including both Lloyd training passes
    out["tree_full_cold_sec"] = timed_cold(
        lambda: two_level_assign(emb, n_super=tk["n_super"], k2=tk["k2"])
        .select("vec_id", "sid", "sub"))
    print(json.dumps(out), flush=True)

    # flat: two slices against the FULL 32k anchor array; probe rows
    # gated on md5 buckets (anchors always kept so the argmax scores
    # the full anchor set in every slice)
    for pct, rate in (("2.5pct", 0.025), ("5pct", 0.05)):
        sl = emb.where((F.col("vec_id") < budget)
                       | sample_gate("vec_id", rate))
        n_sl = sl.count()
        out[f"flat_slice_{pct}_rows"] = n_sl
        out[f"flat_slice_{pct}_cold_sec"] = timed_cold(
            lambda: ivf_assign_multi(sl, n_cells=budget, nprobe=1)
            .select("vec_id", "cell"))
        sec = out[f"flat_slice_{pct}_cold_sec"]
        out[f"flat_slice_{pct}_ms_per_row"] = round(1000.0 * sec / n_sl, 3)
        print(json.dumps(out), flush=True)

    # linear extrapolation from the larger slice's per-row cost
    per_row = out["flat_slice_5pct_ms_per_row"]
    out["flat_full_extrapolated_sec"] = round(per_row * n / 1000.0, 1)
    out["tree_vs_flat_build_ratio"] = round(
        out["flat_full_extrapolated_sec"] / out["tree_full_cold_sec"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
