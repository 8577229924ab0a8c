#!/usr/bin/env python
"""Fifth-decade SAVED-index margin mining (round 11 — VERDICT r10
missing #3's done-criterion): repeated mining runs pay PROBE-ONLY.

Same 20 M-vector corpus and band layout as `tools/margin_fifth.py`
(label parity sides ~10 M each, bits sized to the corpus); the A/B:

* FUSED candidates — `srp_cross_candidates` re-bands BOTH sides every
  run (the r10 measured path);
* SAVED candidates — `srp_index_build` bands the y side ONCE into the
  versioned index, then each run bands only the x side and equi-joins
  the standing capped buckets (`srp_index_probe`).

The claim under test: after the one-time build, a mining run's
candidate stage costs one x-side banding pass + one join against a
parquet scan — so the second and every later run of a recurring
mining job drops the y side's banding entirely, and the margin stage
itself is unchanged (same pluggable relation).

Usage: python tools/margin_saved_fifth.py [vec_dir] [n_bits] [idx_dir]
       [--skip-fused=SECONDS] [--skip-build]
Defaults: /root/repo/.scale/sf1000x_vec  18  /root/repo/.scale/srp_10M
--skip-fused=S reuses a same-host fused-baseline wall instead of
re-running the 10-minute both-sides pass; --skip-build probes an
already-built index at idx_dir (the build is probe-invariant).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.similarity import (
    margin_mine_pairs,
    srp_cross_candidates,
)
from left_join_on_timeout_spark.operators.srp_index import (
    srp_index_build,
    srp_index_load,
    srp_index_probe,
)
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_fused = None
    skip_build = False
    for a in sys.argv[1:]:
        if a.startswith("--skip-fused="):
            skip_fused = float(a.split("=", 1)[1])
        elif a == "--skip-build":
            skip_build = True
    src = args[0] if args else "/root/repo/.scale/sf1000x_vec"
    n_bits = int(args[1]) if len(args) > 1 else 18
    idx = args[2] if len(args) > 2 else "/root/repo/.scale/srp_10M"
    spark = get_spark(app_name="margin_saved_fifth")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, src, "embeddings")
    x = emb.where(F.col("label") % 2 == 0)
    y = emb.where(F.col("label") % 2 == 1)
    n_x, n_y = x.count(), y.count()

    # A: the fused path (both sides re-band per run) — same-day
    # baseline on this host (eager ops: clock wraps the call)
    if skip_fused is not None:
        n_fused, fused_cand_s = -1, skip_fused
    else:
        t0 = time.time()
        fused_cand = srp_cross_candidates(x, y, n_bits=n_bits)
        n_fused = fused_cand.count()
        fused_cand_s = round(time.time() - t0, 2)

    # B: build once ...
    if skip_build:
        build_s = -1.0
    else:
        t0 = time.time()
        srp_index_build(y, idx, n_bits=n_bits)
        build_s = round(time.time() - t0, 2)
    index = srp_index_load(spark, idx)

    # ... then each run probes; two runs to show the repeated cost
    def probe_once() -> tuple[float, int]:
        t0 = time.time()
        cand = (srp_index_probe(x, index)
                .select(F.col("probe_id").alias("x_id"),
                        F.col("index_id").alias("y_id")))
        n = cand.count()
        return round(time.time() - t0, 2), n

    probe1_s, n_saved = probe_once()
    probe2_s, _ = probe_once()

    t0 = time.time()
    cand = (srp_index_probe(x, index)
            .select(F.col("probe_id").alias("x_id"),
                    F.col("index_id").alias("y_id")))
    mined = margin_mine_pairs(x, y, k=4, threshold=1.0,
                              candidates=cand)
    mine_s = round(time.time() - t0, 2)
    n_pairs = mined.count()

    print(json.dumps({
        "src": src, "n_x": n_x, "n_y": n_y, "n_bits": n_bits,
        "fused_candidates": n_fused,
        "fused_candidates_s": fused_cand_s,
        "index_build_s": build_s,
        "saved_candidates": n_saved,
        "probe_run1_s": probe1_s, "probe_run2_s": probe2_s,
        "probe_vs_fused": round(
            min(probe1_s, probe2_s) / max(fused_cand_s, 1e-9), 3),
        "mine_total_s": mine_s, "mined_pairs": n_pairs,
    }), flush=True)


if __name__ == "__main__":
    main()
