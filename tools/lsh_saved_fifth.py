#!/usr/bin/env python
"""Fifth-decade measurement for the SAVED LSH index lifecycle (round 9
— `operators/lsh_index.py`): band + cap + save a 20 M-document corpus
ONCE, then probe a held-out ~0.05 % batch against the saved postings —
the daily-ingest loop reading yesterday's index instead of re-banding
the corpus per batch (the in-session `lsh_probe_pairs` recomputes and
persists the index side every call; the saved lifecycle amortizes it).

Also exercises delete + rebuild at scale: tombstone ~0.05 % of ids,
verify the probe excludes them (anti-join cost at 20 M), rebuild, and
time the versioned publish.

Usage: python tools/lsh_saved_fifth.py [doc_dir]
Default: /root/repo/.scale/sf1000x_dense (20 M docs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.lsh_index import (
    lsh_index_build,
    lsh_index_delete,
    lsh_index_load,
    lsh_index_probe,
    lsh_index_rebuild,
)
from left_join_on_timeout_spark.operators.sampling import sample_key
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

BATCH_GATE = "0020"  # ~0.05 % held-out probe batch


def main() -> None:
    src = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scale/sf1000x_dense")
    spark = get_spark(app_name="lsh_saved_fifth")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, src, "documents").select("doc_id", "text")
    n = docs.count()
    gate = sample_key("doc_id") < BATCH_GATE
    corpus = docs.where(~gate)
    batch = docs.where(gate)
    out = {"src": src, "n_docs": n, "batch_rows": batch.count()}

    path = "/root/repo/.scale/lsh_saved_20M"
    t0 = time.time()
    lsh_index_build(corpus, path)
    out["build_s"] = round(time.time() - t0, 1)
    out["index_disk"] = subprocess.run(
        ["du", "-sh", path], capture_output=True,
        text=True).stdout.split()[0]
    print(json.dumps(out), flush=True)
    spark.catalog.clearCache()

    index = lsh_index_load(spark, path)

    def wall():
        df = lsh_index_probe(batch, index)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    res = {"probe_cold_s": wall(), "probe_warm_s": wall(),
           "candidates": lsh_index_probe(batch, index).count()}
    res["probe_us_per_indexed_doc"] = round(
        res["probe_warm_s"] * 1e6 / (n - out["batch_rows"]), 3)
    print(json.dumps(res), flush=True)

    # delete ~0.05% of indexed ids (gate [0020,0040) over the 0020-
    # gated corpus); the probe must exclude them while the anti-join
    # stays broadcast-cheap at 20 M
    dead = corpus.where(sample_key("doc_id") < "0040").where(~gate) \
        .select("doc_id")
    n_dead = dead.count()
    t0 = time.time()
    lsh_index_delete(spark, path, dead)
    del_s = round(time.time() - t0, 2)
    index2 = lsh_index_load(spark, path)
    t0 = time.time()
    lsh_index_probe(batch, index2).write.format("noop") \
        .mode("overwrite").save()
    probe_tomb_s = round(time.time() - t0, 2)
    t0 = time.time()
    lsh_index_rebuild(spark, path)
    rebuild_s = round(time.time() - t0, 1)
    print(json.dumps({"deleted_ids": n_dead, "delete_s": del_s,
                      "probe_with_tombstones_s": probe_tomb_s,
                      "rebuild_s": rebuild_s,
                      "seq_after": lsh_index_load(spark, path)
                      ["meta"].seq}), flush=True)


if __name__ == "__main__":
    main()
