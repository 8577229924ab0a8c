"""BM25 + RRF retrieval operators (round 10). The oracle-paired
queries pin engine equality; these tests pin the semantics the oracle
can't see: hand-computed BM25 on a tiny corpus, rank tie-breaks, RRF
fusion arithmetic, and absent-arm handling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.retrieval import (
    bm25_scores,
    rrf_fuse,
    top_k_ranked,
)


def _docs(spark):
    rows = [
        (0, "spark join spark"),          # tf(spark)=2, tf(join)=1, dl=3
        (1, "join filter scan scan"),     # tf(join)=1, dl=4
        (2, "filter scan scan filter"),   # no query terms, dl=4
        (3, "spark"),                     # tf(spark)=1, dl=1
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0), 6)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    got = {r.doc_id: r.bm25
           for r in bm25_scores(_docs(spark), ["spark", "join"]).collect()}
    avgdl = 3.0  # (3 + 4 + 4 + 1) / 4
    exp = {
        0: round(_bm25(2, 2, 4, 3, avgdl) + _bm25(1, 2, 4, 3, avgdl), 6),
        1: round(_bm25(1, 2, 4, 4, avgdl), 6),
        3: round(_bm25(1, 2, 4, 1, avgdl), 6),
    }
    assert set(got) == set(exp), "doc 2 has no query term and must drop"
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-9, (d, got[d], exp[d])
    # shorter doc with same tf outranks the longer one (length norm)
    assert got[3] > got[1]


def test_top_k_ranked_ties_break_on_id(spark):
    scored = spark.createDataFrame(
        [(7, 1.0), (3, 1.0), (5, 2.0), (9, 0.5)],
        "doc_id LONG, s DOUBLE")
    got = [(r.doc_id, r.rank)
           for r in top_k_ranked(scored, "s", "doc_id", 3)
           .orderBy("rank").collect()]
    assert got == [(5, 1), (3, 2), (7, 3)]


def test_rrf_fuse_arithmetic_and_absent_arm(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id LONG, rank INT")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id LONG, rank INT")
    got = {r.doc_id: r for r in
           rrf_fuse({"text": a, "vec": b}, "doc_id").collect()}
    assert got[2].rrf == round(1 / 62 + 1 / 61, 6)  # both arms
    assert got[1].rrf == round(1 / 61, 6)           # text only
    assert got[3].rrf == round(1 / 62, 6)           # vec only
    assert (got[1].text_rank, got[1].vec_rank) == (1, 0)
    assert (got[3].text_rank, got[3].vec_rank) == (0, 2)
    # doc in both arms wins the fusion
    order = [r.doc_id for r in
             rrf_fuse({"text": a, "vec": b}, "doc_id", k_out=2)
             .collect()]
    assert order[0] == 2


def test_rrf_fuse_edge_contracts(spark):
    """ADVICE r10: zero arms must raise a clear ValueError (not an
    AttributeError off the None accumulator) and ``k_out=0`` is an
    explicit empty head, not 'no limit'."""
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse({}, "doc_id")
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id LONG, rank INT")
    assert rrf_fuse({"only": a}, "doc_id", k_out=0).count() == 0
    assert rrf_fuse({"only": a}, "doc_id", k_out=None).count() == 2


def test_bm25_normalizes_case_and_whitespace(spark):
    """Round 12 (VERDICT r11 wrong #1): the fused arm tokenizes
    through the shared normalizer, so mixed-case corpus text and
    mixed-case query terms score identically to their lowercase
    twins, and runs of whitespace collapse instead of minting
    empty-string tokens that inflate dl."""
    mixed = spark.createDataFrame(
        [(0, "Spark  JOIN spark"), (1, "join filter scan scan"),
         (2, "filter scan scan filter"), (3, "SPARK")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: r.bm25
           for r in bm25_scores(mixed, ["Spark", "join"]).collect()}
    want = {r.doc_id: r.bm25
            for r in bm25_scores(_docs(spark),
                                 ["spark", "join"]).collect()}
    assert got == want


def test_bm25_rarer_term_scores_higher(spark):
    rows = [(i, "common rare" if i == 0 else "common filler")
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    rare = {r.doc_id: r.bm25
            for r in bm25_scores(docs, ["rare"]).collect()}
    common = {r.doc_id: r.bm25
              for r in bm25_scores(docs, ["common"]).collect()}
    assert rare[0] > common[0], "idf must favor the rarer term"


def test_rrf_fuse_group_cols_fuses_per_query(spark):
    """Round 12: group_cols=('query_id',) fuses each query
    independently — per-query RRF sums, per-query k_out heads — and
    a doc ranked in different queries never cross-contaminates."""
    text = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (1, 2, 1)],
        "query_id LONG, doc_id LONG, rank INT")
    vec = spark.createDataFrame(
        [(0, 2, 1), (1, 3, 1)],
        "query_id LONG, doc_id LONG, rank INT")
    got = {(r.query_id, r.doc_id): r for r in rrf_fuse(
        {"text": text, "vec": vec}, "doc_id",
        group_cols=("query_id",)).collect()}
    assert got[(0, 2)].rrf == round(1 / 62 + 1 / 61, 6)
    assert got[(0, 1)].rrf == round(1 / 61, 6)
    assert got[(1, 2)].rrf == round(1 / 61, 6)   # rank from q1 only
    assert got[(1, 3)].rrf == round(1 / 61, 6)
    assert (got[(1, 2)].text_rank, got[(1, 2)].vec_rank) == (1, 0)
    # per-group head: k_out=1 keeps the best doc of EACH query
    head = {(r.query_id, r.doc_id) for r in rrf_fuse(
        {"text": text, "vec": vec}, "doc_id", k_out=1,
        group_cols=("query_id",)).collect()}
    assert head == {(0, 2), (1, 2)}
