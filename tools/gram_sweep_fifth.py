#!/usr/bin/env python
"""Saved n-gram contamination index at 5 M documents (round 12 —
VERDICT r11 missing #1's done-criterion): repeated contamination
audits pay probe-only.

What is measured, on the `make_scale_dense.py` corpus (5 M docs,
avg ~54 words → ~50 word-5-grams per doc, ~2.5e8 posting rows):

* the FUSED audit baseline — the `contamination_ngram_overlap` shape
  re-tokenizes and re-shingles the WHOLE training corpus per audit
  (explode → md5 → per-doc distinct → broadcast probe), so every
  recurring eval-set check pays the corpus pass;
* `text_index_build(token_mode="ngram")` — the one-time gram
  tokenize + (doc, gram) aggregate the saved tier amortizes, with the
  distinct-gram denominator denormalized as dl;
* the SAVED audit — `text_index_gram_probe` per eval slice: a
  columnar postings scan (id, term, dl only — no text bytes, no
  regex, no shingle shuffle) broadcast-joined against the MB-sized
  eval gram set. A realistic eval set's grams hash into every tb
  bucket, so the partition filter prunes little HERE — the honest
  claim at this shape is "no corpus tokenize, columnar posting scan
  only", not "bucket-pruned I/O" (that regime belongs to small
  term-query probes, measured in text_index_fifth.py).

Distinct eval slices (doc_id % 1000 == k) stand in for distinct
benchmark suites; each audit probes a different one, warm.

Usage: python tools/gram_sweep_fifth.py [dense_dir] [index_dir]
Defaults: /root/repo/.scale/sf1000x_dense  /root/repo/.scale/gix_5M
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from left_join_on_timeout_spark.functions.text import word_ngrams
from left_join_on_timeout_spark.operators.text_index import (
    text_index_build,
    text_index_gram_probe,
    text_index_load,
)
from left_join_on_timeout_spark.session import get_spark

DENSE = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1000x_dense"
IDX = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/gix_5M"
N = 5
SLICES = [0, 1, 2, 3]  # eval suites: doc_id % 1000 == k


def bench_grams(docs, k):
    return (docs.where(F.col("doc_id") % 1000 == k)
            .select(F.explode(word_ngrams("text", N)).alias("g"))
            .select(F.md5("g").alias("h")).distinct())


def fused_audit(docs, k):
    """The contamination_ngram_overlap shape against eval slice k:
    full-corpus shingle per run (the r11 baseline). The train side
    excludes ALL eval slices — the same corpus the saved index is
    built on — so the fused hit set and the probe hit set compare
    identical corpora (ADVICE r12)."""
    grams = (docs.select("doc_id",
                         F.explode(word_ngrams("text", N)).alias("g"))
             .select("doc_id", F.md5("g").alias("h"))
             .distinct())
    bench = (grams.where(F.col("doc_id") % 1000 == k)
             .select("h").distinct().withColumn("m", F.lit(1)))
    train = grams.where(~(F.col("doc_id") % 1000).isin(SLICES))
    probed = train.join(F.broadcast(bench), "h", "left")
    out = probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("m").alias("n_contaminated"))
    return out.where(F.col("n_contaminated") > 0)


def main() -> None:
    spark = get_spark(app_name="gram_sweep_fifth")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(DENSE, "documents.parquet"))
    train = docs.where(~(F.col("doc_id") % 1000).isin(SLICES))
    res: dict = {"corpus": DENSE, "n": N, "slices": SLICES}

    t0 = time.time()
    n_hits = fused_audit(docs, SLICES[0]).count()
    res["fused_audit_sec"] = round(time.time() - t0, 1)
    res["fused_hits"] = n_hits

    if not os.path.exists(os.path.join(IDX, "latest")):
        t0 = time.time()
        text_index_build(train, IDX, token_mode="ngram", ngram_n=N)
        res["build_sec"] = round(time.time() - t0, 1)
    index = text_index_load(spark, IDX)
    res["n_docs"] = int(index["meta"].n_docs)

    probes = {}
    hits = {}
    for k in SLICES:
        b = bench_grams(docs, k)
        t0 = time.time()
        hits[k] = text_index_gram_probe(index, b).count()
        probes[k] = round(time.time() - t0, 1)
    res["probe_secs"] = probes
    res["probe_hits"] = hits
    mean_probe = sum(probes.values()) / len(probes)
    res["mean_probe_sec"] = round(mean_probe, 1)
    res["speedup_per_audit"] = round(
        res["fused_audit_sec"] / max(mean_probe, 1e-9), 2)
    if "build_sec" in res:
        saved = res["fused_audit_sec"] - mean_probe
        res["breakeven_audits"] = (
            round(res["build_sec"] / saved, 1) if saved > 0 else None)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
