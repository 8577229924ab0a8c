"""Focused tests for the round-14 optimization internals: the
concurrency.overlap helper, the materialized-words gram helpers
(gram_rows/ngrams_of equivalence with the one-shot word_ngrams form,
including NULL and short texts), the append write clustering (files per
batch ≈ touched directories, not tasks × directories), and the
posting-rows exchange shape (no optimizer-inserted ENSURE_REQUIREMENTS
exchange — the explicit repartition serves every consumer)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from left_join_on_timeout_spark.concurrency import overlap
from left_join_on_timeout_spark.functions.text import (
    gram_digest_set,
    gram_rows,
    word_ngrams,
)


# ---------------------------------------------------------------------------
# overlap()
# ---------------------------------------------------------------------------

def test_overlap_returns_results_in_input_order():
    assert overlap([lambda: 1, lambda: "b", lambda: [3]]) == [1, "b", [3]]


def test_overlap_single_thunk_runs_inline():
    assert overlap([lambda: 42]) == [42]


def test_overlap_propagates_the_failing_thunks_error():
    def boom():
        raise ValueError("thunk failed")

    done = []
    with pytest.raises(ValueError, match="thunk failed"):
        overlap([boom, lambda: done.append(1)])
    # the sibling thunk was not abandoned mid-flight (the pool joins
    # its workers before the error propagates)
    assert done == [1]


# ---------------------------------------------------------------------------
# gram helpers: the materialized-words form computes the SAME grams as
# the one-shot word_ngrams expression (NULL text, short docs, dups)
# ---------------------------------------------------------------------------

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "one two three four"),          # < 5 words: zero 5-grams
    (3, None),                          # NULL text
    (4, "  Mixed   CASE   words repeat words repeat words  "),
    (5, "alpha beta gamma delta epsilon zeta"),  # dup of 1
]


def test_gram_rows_matches_word_ngrams_expression(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    new = (gram_rows(df, "text", 5, id_col="doc_id")
           .groupBy("doc_id").agg(F.sort_array(F.collect_list("g"))
                                  .alias("grams")))
    old = (df.select("doc_id",
                     F.explode(word_ngrams("text", 5)).alias("g"))
           .groupBy("doc_id").agg(F.sort_array(F.collect_list("g"))
                                  .alias("grams")))
    assert sorted(map(tuple, new.collect())) == \
        sorted(map(tuple, old.collect()))


def test_gram_rows_outer_keeps_zero_gram_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ids = {r.doc_id for r in
           gram_rows(df, "text", 5, id_col="doc_id", outer=True)
           .select("doc_id").distinct().collect()}
    assert ids == {1, 2, 3, 4, 5}  # short/NULL docs survive as NULL-gram rows


def test_gram_digest_set_is_distinct_md5_of_grams(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.h for r in gram_digest_set(df, "text", 5).collect()}
    want = {r.h for r in
            df.select(F.explode(word_ngrams("text", 5)).alias("g"))
            .select(F.md5(F.col("g").cast("binary")).alias("h"))
            .distinct().collect()}
    assert got == want and len(got) > 0


def test_posting_rows_has_no_optimizer_inserted_exchange(spark):
    """The explicit repartition(id) must satisfy BOTH the (id, term)
    aggregate and the dl window — if either consumer forces its own
    ENSURE_REQUIREMENTS exchange the one-exchange contract regressed."""
    from left_join_on_timeout_spark.operators.text_index import (
        _posting_rows,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = _posting_rows(df, "doc_id", "text", 8, "ngram", 5)
    plan = rows._sc._jvm.PythonSQLUtils.explainString(
        rows._jdf.queryExecution(), "formatted")
    assert "ENSURE_REQUIREMENTS" not in plan, plan


# ---------------------------------------------------------------------------
# append write clustering: files per batch ≈ touched band directories
# ---------------------------------------------------------------------------

def test_lsh_append_writes_one_file_per_touched_band(spark, tmp_path):
    from left_join_on_timeout_spark.operators.lsh_index import (
        lsh_index_append,
        lsh_index_build,
        lsh_index_load,
    )

    base = [(i, f"base document number {i} with some shared words "
                f"and a tail {i % 7}") for i in range(40)]
    batch = [(100 + i, f"fresh arrival {i} bearing entirely new tokens "
                       f"{i * 13}") for i in range(20)]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    path = str(tmp_path / "lshidx")
    lsh_index_build(docs, path)
    # force a many-task batch lineage: without the pre-write
    # repartition this wrote ~tasks × bands files
    arr = (spark.createDataFrame(batch, "doc_id long, text string")
           .repartition(16))
    before = {
        d: len([f for f in os.listdir(os.path.join(path, "postings_v1", d))
                if f.endswith(".parquet")])
        for d in os.listdir(os.path.join(path, "postings_v1"))
        if d.startswith("band=")}
    lsh_index_append(arr, spark, path)
    added_total, touched = 0, 0
    for d in os.listdir(os.path.join(path, "postings_v1")):
        if not d.startswith("band="):
            continue
        n = len([f for f in os.listdir(os.path.join(path, "postings_v1", d))
                 if f.endswith(".parquet")])
        added = n - before.get(d, 0)
        if added:
            touched += 1
            added_total += added
    assert touched > 0
    # one file per touched band directory — not 16 tasks' worth each
    assert added_total == touched, (added_total, touched)
    # and the appended docs actually serve
    idx = lsh_index_load(spark, path)
    served = {r.id for r in idx["postings"].select("id").distinct()
              .collect()}
    assert {100 + i for i in range(20)} <= served
