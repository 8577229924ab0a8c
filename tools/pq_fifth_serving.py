#!/usr/bin/env python
"""Fifth-decade SERVING-TIER measurement (VERDICT r8 item 7): the 20 M
PQ rows so far cover unfiltered probes — this proves the two serving
knobs hold their promised I/O cut at the corpus-sized tree geometry
(budget 32 000 cells, `coarse="tree"`, the only buildable path at this
scale per PLANS.md §fifth-decade PQ):

* ``prune=True``  — the probed-sid PartitionFilter must cut the
  postings scan to the probed shard DIRECTORIES. Metric: parquet
  files under the probed ``sid=`` directories vs the whole postings
  version (directory pruning is exactly a file-count cut), plus warm
  wall with/without prune.
* ``where=label<3`` — the attribute PushedFilter cuts candidates at
  the reader (row-group granularity, not file-count); metric: warm
  wall + result rows vs the unfiltered serve.

Build is ONCE (daily-build discipline); every serve arm runs twice
and reports the second (warm) wall, matching the fifth-decade probe
methodology. Run with SPARK_GRAFT_DRIVER_MEM=64g like every
fifth-decade tool (the grouped Lloyd pass OOMs the 8 g default).

Usage: python tools/pq_fifth_serving.py [vec_dir] [budget]
Defaults: /root/repo/.scale/sf1000x_vec  32000
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.ann_index import (
    _pq_encode_and_assign,
    pq_index_build,
    pq_index_load,
    pq_index_search,
)
from left_join_on_timeout_spark.operators.sampling import sample_key
from left_join_on_timeout_spark.operators.similarity import two_level_knobs
from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import load_table

BATCH_GATE = "0020"  # ~0.05% held-out serve batch
CELL_CAP = 20_000


def _wall(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    src = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scale/sf1000x_vec")
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000
    spark = get_spark(app_name="pq_fifth_serving")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, src, "embeddings")
    n = emb.count()
    tk = two_level_knobs(budget)
    out = {"src": src, "n_rows": n, "budget": budget, **tk,
           "cell_cap": CELL_CAP,
           "train_frac": round(min(1.0, 40_000 / n), 4)}
    gate = sample_key("vec_id") < BATCH_GATE
    corpus = emb.where(~gate | (F.col("vec_id") < budget))
    batch = emb.where(gate & (F.col("vec_id") >= budget))
    out["batch_rows"] = batch.count()

    path = "/root/repo/.scale/pqidx_tree_srv"
    t0 = time.time()
    pq_index_build(corpus, path, cell_cap=CELL_CAP, coarse="tree",
                   n_super=tk["n_super"], k2=tk["k2"],
                   train_frac=out["train_frac"], attr_cols=["label"])
    out["build_s"] = round(time.time() - t0, 1)
    import subprocess
    out["index_disk"] = subprocess.run(
        ["du", "-sh", path], capture_output=True,
        text=True).stdout.split()[0]
    print(json.dumps(out), flush=True)
    spark.catalog.clearCache()

    index = pq_index_load(spark, path)
    pdir = os.path.join(path, f"postings_v{index['meta'].seq}")
    total_files = len(glob.glob(os.path.join(pdir, "sid=*", "*.parquet")))
    total_dirs = len(glob.glob(os.path.join(pdir, "sid=*")))

    arms = {
        "base": dict(),
        "filtered": dict(where=F.col("label") < 3),
        "pruned": dict(prune=True),
        "filtered_pruned": dict(where=F.col("label") < 3, prune=True),
    }
    for name, kw in arms.items():
        res = {"arm": name}
        df = pq_index_search(batch, index, **kw)
        res["cold_s"] = _wall(df)
        res["warm_s"] = _wall(pq_index_search(batch, index, **kw))
        res["rows"] = pq_index_search(batch, index, **kw).count()
        if kw.get("prune"):
            # the PartitionFilter's directory cut, counted on disk:
            # files under the probed sid dirs vs the whole version
            enc_sids = {r.sid for r in _pq_encode_and_assign(
                batch, index, "vec_id", "embedding")
                .select("sid").distinct().collect()}
            probed_files = sum(
                len(glob.glob(os.path.join(pdir, f"sid={s}", "*.parquet")))
                for s in enc_sids)
            res["probed_dirs"] = len(enc_sids)
            res["total_dirs"] = total_dirs
            res["files_read"] = probed_files
            res["files_total"] = total_files
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
