"""Unified cross-tier decontamination (round 14 — VERDICT r13 missing
#1): one `delete_from_indexes` call fans a flagged set across every
saved index family's delete surface; the flagged doc stops serving
from ALL tiers at each one's next load. The oracle-paired
`decontaminate_all_tiers_saved` pins the gram/word/vector loop against
DuckDB; these tests pin the orchestrator mechanics (discovery,
classification, mixed-fleet typed tombstones, error surface) and the
two candidate-tier families (LSH, SRP) the SQL oracle can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.index_admin import (
    delete_from_indexes,
    discover_indexes,
)
from left_join_on_timeout_spark.operators.lsh_index import (
    lsh_index_build,
    lsh_index_load,
    lsh_index_probe,
)
from left_join_on_timeout_spark.operators.srp_index import (
    srp_index_build,
    srp_index_load,
    srp_index_probe,
)
from left_join_on_timeout_spark.operators.text_index import (
    text_index_build,
    text_index_load,
    text_index_search,
)


def _docs(spark):
    # docs 1 and 2 are verbatim dups (same buckets in every lexical
    # tier); doc 3 shares the "spark join" vocabulary
    rows = [
        (1, "spark join window spark join window spark join window"),
        (2, "spark join window spark join window spark join window"),
        (3, "spark join filter scan spark join"),
        (4, "totally unrelated words about nothing at all here"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _emb(spark):
    # ids 1 and 2 identical vectors (same SRP buckets, cosine 1.0)
    rows = [
        (1, [1.0, 0.0, 0.0, 0.5]),
        (2, [1.0, 0.0, 0.0, 0.5]),
        (3, [0.9, 0.1, 0.0, 0.4]),
        (4, [0.0, 1.0, 0.9, 0.0]),
        (5, [0.0, 0.9, 1.0, 0.1]),
        (6, [0.1, 0.8, 0.9, 0.0]),
    ]
    return spark.createDataFrame(rows,
                                 "vec_id LONG, embedding ARRAY<DOUBLE>")


def _build_fleet(spark, root):
    from left_join_on_timeout_spark.operators.ann_index import (
        ivf2_index_build,
    )

    docs, emb = _docs(spark), _emb(spark)
    text_index_build(docs, f"{root}/word")
    text_index_build(docs, f"{root}/gram", token_mode="ngram", ngram_n=3)
    lsh_index_build(docs, f"{root}/lsh")
    srp_index_build(emb, f"{root}/srp", dim=4)
    ivf2_index_build(emb, f"{root}/ivf2", n_super=2, k2=2)


def test_discover_classifies_every_family(spark, tmp_path):
    root = str(tmp_path / "fleet")
    _build_fleet(spark, root)
    # non-index children must be skipped silently
    (tmp_path / "fleet" / "staging").mkdir()
    (tmp_path / "fleet" / "notes.txt").write_text("not an index")
    got = {e["path"].rsplit("/", 1)[-1]: e
           for e in discover_indexes(spark, root)}
    assert set(got) == {"word", "gram", "lsh", "srp", "ivf2"}
    assert got["word"]["tier"] == "text[word]"
    assert got["gram"]["tier"] == "text[ngram]"
    assert got["lsh"]["tier"] == "lsh"
    assert got["srp"]["tier"] == "srp"
    assert got["ivf2"]["tier"] == "ivf2"
    assert all(e["seq"] == 1 for e in got.values())


def test_delete_everywhere_stops_serving_from_all_tiers(spark, tmp_path):
    """The headline contract: ONE call, and the flagged doc is absent
    from every tier's serve at the next load — BM25 hits, gram audit,
    LSH candidates, SRP candidates, ANN neighbors."""
    from left_join_on_timeout_spark.operators.ann_index import (
        ivf2_index_load,
        ivf2_index_search,
    )
    from left_join_on_timeout_spark.operators.text_index import (
        text_index_gram_probe,
    )

    root = str(tmp_path / "fleet")
    _build_fleet(spark, root)
    flagged = spark.createDataFrame([(2,)], "doc_id LONG")
    report = delete_from_indexes(spark, flagged, root=root)
    assert len(report) == 5 and all(e["seq"] == 1 for e in report)

    docs, emb = _docs(spark), _emb(spark)
    # word: doc 2 stops scoring
    wi = text_index_load(spark, f"{root}/word")
    assert 2 not in {r.doc_id for r in
                     text_index_search(wi, ["spark"]).collect()}
    # gram: doc 2 stops auditing (probe with doc 1's grams)
    gi = text_index_load(spark, f"{root}/gram")
    from left_join_on_timeout_spark.functions.text import word_ngrams
    bench = (docs.where(F.col("doc_id") == 1)
             .select(F.explode(word_ngrams("text", 3)).alias("g"))
             .select(F.md5("g").alias("h")).distinct())
    hit_ids = {r.doc_id for r in
               text_index_gram_probe(gi, bench).collect()}
    assert 1 in hit_ids and 2 not in hit_ids
    # lsh: doc 1 probing no longer surfaces its verbatim dup 2
    li = lsh_index_load(spark, f"{root}/lsh")
    cands = {(r.probe_id, r.index_id) for r in lsh_index_probe(
        docs.where(F.col("doc_id") == 1), li).collect()}
    assert all(i != 2 for _, i in cands)
    # srp: vec 1 probing no longer buckets with its identical twin 2
    si = srp_index_load(spark, f"{root}/srp")
    scands = {(r.probe_id, r.index_id) for r in srp_index_probe(
        emb.where(F.col("vec_id") == 1), si).collect()}
    assert all(i != 2 for _, i in scands), scands
    assert (1, 1) in scands, "tier must still serve live ids"
    # ivf2: vec 2 is neither a query result nor anyone's neighbor
    vi = ivf2_index_load(spark, f"{root}/ivf2")
    nbrs = {(r.vec_id, r.neighbor_id) for r in ivf2_index_search(
        emb.join(flagged.withColumnRenamed("doc_id", "vec_id"),
                 "vec_id", "left_anti"), vi).collect()}
    assert nbrs and all(n != 2 for _, n in nbrs), nbrs


def test_paths_variant_and_mixed_fleet_typed_tombstones(spark, tmp_path):
    """Explicit paths target a subset; an int flagged set fans into a
    string-keyed index via the lossless-cast contract (int 2 → "2" —
    a no-op when "2" was never indexed, never a silent corruption)."""
    root = str(tmp_path / "fleet")
    docs = _docs(spark)
    text_index_build(docs, f"{root}/word")
    sdocs = docs.select(F.concat(F.lit("d-"), F.col("doc_id"))
                        .alias("doc_id"), "text")
    text_index_build(sdocs, f"{root}/sword")
    flagged = spark.createDataFrame([(2,)], "doc_id LONG")
    report = delete_from_indexes(
        spark, flagged, paths=[f"{root}/word", f"{root}/sword"])
    assert [e["tier"] for e in report] == ["text[word]", "text[word]"]
    wi = text_index_load(spark, f"{root}/word")
    assert 2 not in {r.doc_id for r in
                     text_index_search(wi, ["spark"]).collect()}
    si = text_index_load(spark, f"{root}/sword")
    assert {r.doc_id for r in
            text_index_search(si, ["spark"]).collect()} == {
                "d-1", "d-2", "d-3"}, "string fleet untouched by int ids"


def test_exactly_one_target_spec_required(spark, tmp_path):
    ids = spark.createDataFrame([(1,)], "doc_id LONG")
    with pytest.raises(ValueError, match="exactly one"):
        delete_from_indexes(spark, ids)
    with pytest.raises(ValueError, match="exactly one"):
        delete_from_indexes(spark, ids, paths=["x"], root="y")
