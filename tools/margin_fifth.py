#!/usr/bin/env python
"""Fifth-decade margin-mining measurement (round 10): the registered
`bitext_margin_mine` shape — cross-side SRP candidates → cosine →
candidate-neighborhood means → mutual-best margin filter — timed at
20 M vectors (`.scale/sf1000x_vec`, label parity as the two sides,
~10 M each).

Knob note: the registered query pins `DEFAULT_BITS=8` for its static
oracle, which at 20 M rows would put ~78 k vectors in every bucket —
all dropped by the cap, zero candidates. The deployment path sizes
bits to the corpus (bits ≈ log2(n / target bucket)), exactly what the
SRP auto-knob study (PLANS.md r4) does for the self-join form; here
bits=18 targets ~76-row buckets under the 200 cap. The claim under
test: candidate volume (and so the whole mining wall) is governed by
the band layout, never by |X|·|Y|.

Usage: python tools/margin_fifth.py [vec_dir] [n_bits]
Defaults: /root/repo/.scale/sf1000x_vec  18
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
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table


def main() -> None:
    src = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scale/sf1000x_vec")
    n_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    spark = get_spark(app_name="margin_fifth")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, src, "embeddings")
    x = emb.where(F.col("label") % 2 == 0)
    y = emb.where(F.col("label") % 2 == 1)
    n_x, n_y = x.count(), y.count()

    # r11 note: srp_cross_candidates and margin_mine_pairs became
    # EAGER (the materialize-then-release cache discipline, ADVICE
    # r10), so the clock starts BEFORE the call, not before an action
    t0 = time.time()
    cand = srp_cross_candidates(x, y, n_bits=n_bits)
    n_cand = cand.count()
    cand_s = round(time.time() - t0, 2)

    def run() -> tuple[float, int]:
        t0 = time.time()
        mined = margin_mine_pairs(x, y, k=4, threshold=1.0,
                                  candidates=cand)
        return round(time.time() - t0, 2), mined.count()

    cold_s, n_pairs = run()
    warm_s, _ = run()
    print(json.dumps({
        "src": src, "n_x": n_x, "n_y": n_y, "n_bits": n_bits,
        "candidates": n_cand, "candidates_s": cand_s,
        "cand_per_side_row": round(n_cand / max(n_x, 1), 4),
        "mine_cold_s": cold_s, "mine_warm_s": warm_s,
        "mined_pairs": n_pairs,
        "us_per_vector_warm": round(warm_s * 1e6 / (n_x + n_y), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
