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
    """The per-partition count pass must reuse the range exchange (AQE
    stage reuse / ReuseExchange): the data crosses the network once."""
    df = spark.range(10_000).withColumn("v", (F.col("id") * 31) % 100)
    out = global_rank(df, [F.col("v").asc(), F.col("id").asc()],
                      num_partitions=8)
    rows = out.collect()  # materialize so the adaptive plan is final
    assert sum(1 for r in rows if r.rnk == 1) == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    # initial plan names two range exchanges; at runtime one must resolve
    # to a reuse of the other
    assert "ReusedExchange" in plan or plan.count(
        "Exchange rangepartitioning") == 1
