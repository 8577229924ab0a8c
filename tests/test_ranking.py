"""Global total-order ranking (operators/ranking.py): distributed
row_number over a range-partitioned layout, never a single-partition
window over the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.ranking import global_rank


def test_global_rank_matches_total_order(spark):
    rows = [(i, (i * 7919) % 1000, f"p{i}") for i in range(997)]
    df = spark.createDataFrame(rows, "id INT, score INT, payload STRING") \
        .repartition(7)  # scrambled input layout
    out = global_rank(
        df, [F.col("score").desc(), F.col("id").asc()], rank_col="r",
        num_partitions=5).collect()
    expect = {(r[1], r[0]): i + 1
              for i, r in enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))}
    assert len(out) == 997
    assert all(expect[(r.score, r.id)] == r.r for r in out)
    assert {r.payload for r in out} == {f"p{i}" for i in range(997)}


def test_global_rank_shuffles_data_once(spark):
    """Both consumers of the range exchange (the ranked rows and the
    per-partition counts) must read ONE materialization of the sorted
    layout. Exchange reuse is not guaranteed (AQE re-planning can
    re-execute the exchange with *different sampled range boundaries*,
    minting offsets that don't match the row numbers — observed as
    silently wrong ranks at sf0.1), so global_rank persists the layout;
    the executed plan must show the cache scan and no second
    range-partitioning of the data."""
    df = spark.range(10_000).withColumn("v", (F.col("id") * 31) % 100)
    out = global_rank(df, [F.col("v").asc(), F.col("id").asc()],
                      num_partitions=8)
    rows = out.collect()  # materialize so the adaptive plan is final
    assert sum(1 for r in rows if r.rnk == 1) == 1
    assert len({r.rnk for r in rows}) == len(rows)  # exact total order
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
