#!/usr/bin/env python
"""Fourth-decade (1000×-row) measurement for the two output-bound exact
joins (VERDICT r5 item 5): `dedup_lsh_jaccard` and
`containment_minhash_est` at 5 M documents with REALISTIC duplicate
density (make_scale_dense.py: ~1% near-dup replicas, everything else
token-disjoint), versus the adversarial 100-way-clique corpus one
decade earlier where they cost 135.8 s / 83.8 s.

The claim under test: these joins' superlinear term is their OWN OUTPUT
(the candidate-pair mass), not the corpus — cap the density and the
1000× corpus runs on the corpus-linear budget (shingling + signatures +
banding), with the candidate term collapsing from tens of millions to
~n·dup_rate.

Reported per query: wall (cold, single-shot — these are one-pass audit
queries, there is no persisted index to warm) plus the LSH
candidate-pair count and the result-row count, so the output term is
visible next to the wall it drives.

Usage: python tools/fourth_decade_density.py [dense_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from left_join_on_timeout_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
)
from left_join_on_timeout_spark.queries import QUERIES
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table


def main() -> None:
    dense = sys.argv[1] if len(sys.argv) > 1 \
        else "/root/repo/.scale/sf100x_dense"
    spark = get_spark(app_name="fourth_decade_density")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, dense, "documents")
    out = {"sf_dir": dense, "n_docs": docs.count()}
    print(json.dumps(out), flush=True)

    t0 = time.time()
    sig = minhash_signature(docs, "doc_id", "text")
    out["lsh_candidate_pairs"] = lsh_candidate_pairs(sig, "doc_id").count()
    out["candidates_wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)

    for name in ("dedup_lsh_jaccard", "containment_minhash_est"):
        t0 = time.time()
        n = QUERIES[name](spark, dense).count()
        out[f"{name}_sec"] = round(time.time() - t0, 1)
        out[f"{name}_rows"] = n
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
