"""Unit tests of the text column-expression building blocks
(``functions.text``) on edge cases the synthetic corpus never hits."""

from __future__ import annotations

from pyspark.sql import functions as F

from left_join_on_timeout_spark.functions.text import word_ngrams


def test_word_ngrams_short_doc_guard(spark):
    """Below n words the result must be an *empty* array — a raw
    ``sequence(1, size-k)`` would descend (sequence(1, -1) = [1, 0, -1])
    and emit garbage grams."""
    df = spark.createDataFrame(
        [("a b c",), ("a b c d e f",), ("",), (None,)], "text STRING")
    got = [r.n for r in
           df.select(F.size(word_ngrams("text", 5)).alias("n")).collect()]
    assert got == [0, 2, 0, 0]


def test_word_ngrams_values_and_order(spark):
    df = spark.createDataFrame([("The quick  Brown fox",)], "text STRING")
    got = df.select(word_ngrams("text", 2).alias("g")).head().g
    assert got == ["the quick", "quick brown", "brown fox"]
