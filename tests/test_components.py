"""Connected components (operators/components.py): hash-min label
propagation resolving LSH pair lists into duplicate clusters."""

from __future__ import annotations

import pytest

from left_join_on_timeout_spark.operators.components import (
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    out = connected_components(df, **kw).collect()
    return {r.id: r.component for r in out}


def test_two_components_and_triangle(spark):
    got = _cc(spark, [(1, 2), (2, 3), (1, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_long_chain_needs_multiple_rounds(spark):
    # path 10-11-...-19: diameter 9 forces several propagation rounds
    got = _cc(spark, [(i, i + 1) for i in range(10, 19)])
    assert got == {i: 10 for i in range(10, 20)}


def test_bridge_merges_clusters(spark):
    # two cliques joined by one bridge edge collapse to one component
    edges = [(1, 2), (2, 3), (7, 8), (8, 9), (3, 7)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 6


def test_reversed_pair_order_is_undirected(spark):
    got = _cc(spark, [(4, 2), (2, 4), (9, 4)])
    assert got == {2: 2, 4: 2, 9: 2}


def test_max_iters_guard(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(spark, [(i, i + 1) for i in range(0, 30)], max_iters=2)
