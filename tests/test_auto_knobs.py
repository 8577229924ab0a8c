"""Corpus-size-derived ANN knobs (VERDICT r4 item 4): the measured
scaling rules (cells ∝ n, bits ∝ log n — PLANS.md §"second decade") are
code now, not prose. These tests pin the derived values at the corpus
sizes the study measured, so a regression in the formula is a test
failure, not a silent quadratic at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from left_join_on_timeout_spark.operators.similarity import (
    ANN_REF_ROWS,
    DEFAULT_BITS,
    DEFAULT_IVF_CELLS,
    auto_knobs,
    ivf_top_neighbor,
)


def test_reference_scale_resolves_to_defaults():
    # at (or below) the bench corpus size the derived knobs ARE the
    # library defaults — existing oracle hashes at the bench SFs cannot
    # move
    assert auto_knobs(ANN_REF_ROWS) == {"n_cells": 32, "n_bits": 8}
    assert auto_knobs(500) == {"n_cells": 32, "n_bits": 8}      # sf0.01
    assert auto_knobs(1) == {"n_cells": DEFAULT_IVF_CELLS,
                             "n_bits": DEFAULT_BITS}


def test_second_decade_matches_measured_ab():
    # the 10× corpus (20k vectors): the PLANS.md A/B measured 320 cells
    # and 11 bits as the knobs that restore linear scaling
    assert auto_knobs(10 * ANN_REF_ROWS) == {"n_cells": 320, "n_bits": 11}


def test_third_decade_extrapolates_the_rules():
    # 100×: cells keep growing linearly, bits logarithmically
    assert auto_knobs(100 * ANN_REF_ROWS) == {"n_cells": 3200,
                                              "n_bits": 15}


def test_cells_linear_bits_logarithmic():
    base = auto_knobs(8 * ANN_REF_ROWS)
    up = auto_knobs(64 * ANN_REF_ROWS)
    assert up["n_cells"] == 8 * base["n_cells"]   # linear in n
    assert up["n_bits"] == base["n_bits"] + 3     # +log2(8) in n


def test_default_path_equals_explicit_default_knobs(spark):
    # at reference scale the None-default resolves to the same plan as
    # the explicit default — same rows, same neighbors
    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(7)),
                    lambda i: F.cos(F.col("id") * (i + 1)))
        .alias("embedding"))
    auto = ivf_top_neighbor(emb).orderBy("vec_id").collect()
    pinned = ivf_top_neighbor(
        emb, n_cells=DEFAULT_IVF_CELLS).orderBy("vec_id").collect()
    assert auto == pinned


def test_corpus_rows_memoized_across_reads(spark):
    """Two independent reads of the same source must hit one cache
    entry (the catalog-statistics analog); a different source must not
    collide with it."""
    from left_join_on_timeout_spark.operators import similarity as s

    s._ROWCOUNT_CACHE.clear()
    a = s.corpus_rows(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    b = s.corpus_rows(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    assert a == b and len(s._ROWCOUNT_CACHE) == 1
    c = s.corpus_rows(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    assert len(s._ROWCOUNT_CACHE) == 2 and c != 0
