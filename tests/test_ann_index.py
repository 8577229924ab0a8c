"""ANN index lifecycle (VERDICT r6 item 1): train → save → load →
search. The oracle-paired query pins self-search equality to the fused
operator; these tests cover the API semantics the oracle can't — new
query vectors probing a standing index, the search-time multi-probe
knob, format-version validation, and the sample-trained fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.ann_index import (
    INDEX_FORMAT_VERSION,
    ivf2_index_build,
    ivf2_index_load,
    ivf2_index_search,
    ivf2_self_search_saved,
)
from left_join_on_timeout_spark.operators.similarity import (
    ivf2_top_neighbor,
    two_level_assign,
)


def _corpus(spark, n=24, dim=4):
    rows = [(i, [float((i * 7 + d * 3) % 11 - 5) for d in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_self_search_saved_equals_fused(spark, tmp_path):
    emb = _corpus(spark)
    fused = {(r.vec_id, r.neighbor_id, r.cos_sim)
             for r in ivf2_top_neighbor(emb, n_super=2, k2=2).collect()}
    saved = {(r.vec_id, r.neighbor_id, r.cos_sim)
             for r in ivf2_self_search_saved(
                 emb, str(tmp_path / "idx"), n_super=2, k2=2).collect()}
    assert saved == fused


def test_search_new_queries_against_standing_index(spark, tmp_path):
    emb = _corpus(spark)
    corpus = emb.where(F.col("vec_id") % 5 != 0)   # indexed
    batch = emb.where(F.col("vec_id") % 5 == 0)    # new arrivals
    path = str(tmp_path / "idx")
    ivf2_index_build(corpus, path, n_super=2, k2=2)
    index = ivf2_index_load(spark, path)
    hits = ivf2_index_search(batch, index).collect()
    indexed = {r.vec_id for r in corpus.select("vec_id").collect()}
    queries = {r.vec_id for r in batch.select("vec_id").collect()}
    assert hits, "probing a populated index must return matches"
    for r in hits:
        assert r.vec_id in queries
        assert r.neighbor_id in indexed
        assert -1.0 <= r.cos_sim <= 1.0
    # multi-probe at search time only improves: same queries, wider
    # cells, best cosine never decreases
    one = {r.vec_id: r.cos_sim for r in hits}
    two = {r.vec_id: r.cos_sim
           for r in ivf2_index_search(batch, index, nprobe=2).collect()}
    assert set(one) <= set(two)
    for vid, cs in one.items():
        assert two[vid] >= cs


def test_load_rejects_wrong_version(spark, tmp_path):
    emb = _corpus(spark)
    path = str(tmp_path / "idx")
    ivf2_index_build(emb, path, n_super=2, k2=2)
    bad = spark.read.parquet(path + "/meta") \
        .withColumn("version", F.lit(INDEX_FORMAT_VERSION + 1))
    bad.write.mode("overwrite").parquet(path + "/meta2")
    import shutil
    shutil.rmtree(path + "/meta")
    shutil.move(path + "/meta2", path + "/meta")
    with pytest.raises(ValueError, match="version"):
        ivf2_index_load(spark, path)


def test_sample_trained_fallback_keeps_every_vector(spark):
    """A super-cell whose members are all outside the training sample
    must still index its vectors (first-member fallback sub-anchor) —
    no corpus vector silently drops out of a sample-trained index."""
    emb = _corpus(spark, n=30)
    for frac in (0.15, 0.5):
        assigned = two_level_assign(emb, n_super=3, k2=2,
                                    train_frac=frac)
        assert assigned.count() == 30
        assert assigned.select("vec_id").distinct().count() == 30


def test_pq_saved_equals_fused_and_postings_are_codes_only(spark, tmp_path):
    """The IVF-PQ lifecycle: self-search over the saved index equals
    the fused pq_sdc_top_neighbor (rerank=0) exactly, and the persisted
    postings carry CODES ONLY — no vector column may reach the index
    (the PQ memory contract)."""
    from left_join_on_timeout_spark.operators.ann_index import (
        pq_index_load,
        pq_self_search_saved,
    )
    from left_join_on_timeout_spark.operators.similarity import (
        pq_sdc_top_neighbor,
    )

    emb = _corpus(spark, n=40, dim=8)
    fused = {(r.vec_id, r.neighbor_id, r.sdc)
             for r in pq_sdc_top_neighbor(
                 emb, dim=8, m=2, k=4, n_cells=4).collect()}
    path = str(tmp_path / "pqidx")
    saved = {(r.vec_id, r.neighbor_id, r.sdc)
             for r in pq_self_search_saved(
                 emb, path, dim=8, m=2, k=4, n_cells=4).collect()}
    assert saved == fused
    index = pq_index_load(spark, path)
    cols = set(index["postings"].columns)
    assert cols == {"id", "cell", "code0", "code1"}
    assert index["meta"].m == 2 and index["meta"].k == 4


def test_append_then_search_finds_new_vectors(spark, tmp_path):
    """The ingest write path: vectors appended to a saved index (no
    retrain) are immediately searchable, and queries near an appended
    vector can now match it."""
    from left_join_on_timeout_spark.operators.ann_index import (
        ivf2_index_append,
        ivf2_index_load,
        ivf2_index_search,
    )

    emb = _corpus(spark, n=30)
    corpus = emb.where(F.col("vec_id") < 20)
    batch = emb.where(F.col("vec_id") >= 20)
    path = str(tmp_path / "idx")
    ivf2_index_build(corpus, path, n_super=2, k2=2)
    before = ivf2_index_load(spark, path)
    n_before = before["postings"].count()
    # before the append, no search result can name a batch id
    probes = emb.where(F.col("vec_id") < 20)
    hits0 = ivf2_index_search(probes, before).collect()
    assert all(r.neighbor_id < 20 for r in hits0)
    ivf2_index_append(batch, spark, path)
    after = ivf2_index_load(spark, path)
    assert after["postings"].count() == n_before + batch.count()
    appended = {r.id for r in after["postings"]
                .where(F.col("id") >= 20).select("id").collect()}
    assert appended == {r.vec_id for r in batch.select("vec_id").collect()}
    # searching the batch against the grown index finds OTHER vectors,
    # and batch members are now reachable as neighbors
    hits1 = ivf2_index_search(batch, after).collect()
    assert hits1
    all_nbrs = {r.neighbor_id
                for r in ivf2_index_search(emb, after).collect()}
    assert any(n >= 20 for n in all_nbrs)


def test_pq_index_search_new_batch_and_rerank(spark, tmp_path):
    """New vectors probe a standing PQ index compressed-domain; the
    rerank stage fetches shortlist vectors from the corpus table and
    can only improve the answer quality (exact cosine on the top-R)."""
    from left_join_on_timeout_spark.operators.ann_index import (
        pq_index_build,
        pq_index_load,
        pq_index_search,
    )

    emb = _corpus(spark, n=40, dim=8)
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "pqidx")
    pq_index_build(corpus, path, dim=8, m=2, k=4, n_cells=4)
    index = pq_index_load(spark, path)
    indexed = {r.vec_id for r in corpus.select("vec_id").collect()}
    queries = {r.vec_id for r in batch.select("vec_id").collect()}
    sdc_hits = pq_index_search(batch, index).collect()
    assert sdc_hits
    for r in sdc_hits:
        assert r.vec_id in queries and r.neighbor_id in indexed
        assert r.sdc >= 0.0
    rr = pq_index_search(batch, index, rerank=5, corpus=corpus).collect()
    assert rr
    for r in rr:
        assert r.vec_id in queries and r.neighbor_id in indexed
        assert -1.0 <= r.cos_sim <= 1.0
    # rerank answers come from the same probed candidate pool
    assert {r.vec_id for r in rr} == {r.vec_id for r in sdc_hits}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="corpus"):
        pq_index_search(batch, index, rerank=5)
