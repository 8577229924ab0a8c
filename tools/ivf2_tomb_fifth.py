#!/usr/bin/env python
"""Fifth-decade tombstone/rebuild measurement for the SAVED IVF2 index
(VERDICT r9 item 6): the LSH lifecycle has delete/rebuild measured at
20 M (1.3 s / 72 s, `tools/lsh_saved_fifth.py`); this runs the same
arc on the VECTOR side so the broadcast-anti-join cost claim is
measured where the postings are corpus-sized (the 20 M IVF2 postings
carry raw vectors — ~6.4 GB vs LSH's 2.7 GB of digests):

1. build the standing two-level index ONCE (fourth-decade 179×179
   budget, ~40 k-row Lloyd sample — the `ivf2_fifth_incremental.py`
   recipe, now on the v3 versioned-manifest layout);
2. serve a held-out ~0.05 % batch with ``prune=True`` (warm ×2) and
   count the files the pruned scan reads vs the version's total;
3. tombstone ~0.05 % of indexed ids (`ivf2_index_delete`), re-load,
   and re-serve — the delta is the broadcast anti-join's cost on a
   20 M-row postings scan;
4. ``ivf2_index_rebuild`` (drop the tombstoned rows physically,
   publish postings_v2 behind the atomic pointer flip), re-serve from
   the rebuilt version, and verify no deleted id surfaces.

Usage: python tools/ivf2_tomb_fifth.py [vec_dir]
Default: /root/repo/.scale/sf1000x_vec (20 M × 64-dim vectors).
Writes the index at /root/repo/.scale/idx_20M (replacing any
older-layout index there).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.ann_index import (
    ivf2_index_build,
    ivf2_index_delete,
    ivf2_index_load,
    ivf2_index_rebuild,
    ivf2_index_search,
)
from left_join_on_timeout_spark.operators.sampling import sample_key
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

KNOBS = {"n_super": 179, "k2": 179}  # fourth-decade budget, pinned
BATCH_GATE = "0020"   # ~0.05 % held-out serve batch
DEAD_GATE = "0040"    # gate [0020,0040): ~0.05 % of indexed ids
TRAIN_SAMPLE_ROWS = 40_000
PATH = "/root/repo/.scale/idx_20M"


def _files(pdir: str) -> tuple[int, int]:
    return (len(glob.glob(os.path.join(pdir, "sid=*", "*.parquet"))),
            len(glob.glob(os.path.join(pdir, "sid=*"))))


def main() -> None:
    src = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scale/sf1000x_vec")
    spark = get_spark(app_name="ivf2_tomb_fifth")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, src, "embeddings")
    n = emb.count()
    gate = sample_key("vec_id") < BATCH_GATE
    corpus = emb.where(~gate | (F.col("vec_id") < KNOBS["n_super"]))
    batch = emb.where(gate & (F.col("vec_id") >= KNOBS["n_super"]))
    out = {"src": src, "n_rows": n, "batch_rows": batch.count(), **KNOBS}

    shutil.rmtree(PATH, ignore_errors=True)  # older-layout leftovers
    frac = min(1.0, TRAIN_SAMPLE_ROWS / n)
    t0 = time.time()
    ivf2_index_build(corpus, PATH, n_super=KNOBS["n_super"],
                     k2=KNOBS["k2"], train_frac=frac)
    out["build_s"] = round(time.time() - t0, 1)
    out["index_disk"] = subprocess.run(
        ["du", "-sh", PATH], capture_output=True,
        text=True).stdout.split()[0]
    print(json.dumps(out), flush=True)
    spark.catalog.clearCache()

    def serve(index) -> tuple[float, int]:
        df = ivf2_index_search(batch, index, prune=True)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2), df.count()

    index = ivf2_index_load(spark, PATH)
    cold_s, _ = serve(index)
    warm_s, n_hits = serve(index)
    total_files, total_dirs = _files(os.path.join(PATH, "postings_v1"))
    res = {"serve_cold_s": cold_s, "serve_warm_s": warm_s,
           "hits": n_hits, "files_total_v1": total_files,
           "dirs_total_v1": total_dirs,
           "serve_us_per_indexed_row": round(warm_s * 1e6 / n, 3)}
    print(json.dumps(res), flush=True)

    # tombstone ~0.05 % of indexed ids; serve again — the delta is the
    # broadcast anti-join over the corpus-sized postings scan
    dead = (corpus.where(sample_key("vec_id") < DEAD_GATE).where(~gate)
            .where(F.col("vec_id") >= KNOBS["n_super"])
            .select("vec_id"))
    n_dead = dead.count()
    t0 = time.time()
    ivf2_index_delete(spark, PATH, dead)
    del_s = round(time.time() - t0, 2)
    index2 = ivf2_index_load(spark, PATH)
    tomb_cold_s, _ = serve(index2)
    tomb_warm_s, n_hits_tomb = serve(index2)
    dead_hits = (ivf2_index_search(batch, index2, prune=True)
                 .join(dead.withColumnRenamed("vec_id", "neighbor_id"),
                       "neighbor_id").count())
    print(json.dumps({
        "deleted_ids": n_dead, "delete_s": del_s,
        "serve_tomb_cold_s": tomb_cold_s,
        "serve_tomb_warm_s": tomb_warm_s,
        "hits_with_tombstones": n_hits_tomb,
        "deleted_ids_surfaced": dead_hits}), flush=True)

    t0 = time.time()
    ivf2_index_rebuild(spark, PATH)
    rebuild_s = round(time.time() - t0, 1)
    index3 = ivf2_index_load(spark, PATH)
    rb_cold_s, _ = serve(index3)
    rb_warm_s, n_hits_rb = serve(index3)
    v2_files, v2_dirs = _files(os.path.join(PATH, "postings_v2"))
    dead_after = (ivf2_index_search(batch, index3, prune=True)
                  .join(dead.withColumnRenamed("vec_id", "neighbor_id"),
                        "neighbor_id").count())
    print(json.dumps({
        "rebuild_s": rebuild_s, "seq_after": index3["meta"].seq,
        "files_total_v2": v2_files, "dirs_total_v2": v2_dirs,
        "serve_rebuilt_cold_s": rb_cold_s,
        "serve_rebuilt_warm_s": rb_warm_s,
        "hits_after_rebuild": n_hits_rb,
        "deleted_ids_surfaced_after_rebuild": dead_after,
        "index_disk_after": subprocess.run(
            ["du", "-sh", PATH], capture_output=True,
            text=True).stdout.split()[0]}), flush=True)


if __name__ == "__main__":
    main()
