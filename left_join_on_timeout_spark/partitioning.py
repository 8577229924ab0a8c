"""Scan-parallelism helper for compute-bound operators.

The dedup/similarity family does orders of magnitude more CPU work per
input byte than a relational scan (3 md5 calls per shingle, SRP bucket
projections per vector). A small parquet input — one row group, a few MB
— planfolds into a single task, serializing all of that work on one core
no matter how many the cluster has. ``fan_out`` repartitions such inputs
up to the session's default parallelism before the heavy projection.

At 100 TB this is a no-op: the scan already arrives in thousands of
splits (``getNumPartitions() >= target``), so no shuffle is added. The
cost when it does fire is one narrow round-robin shuffle of the raw
input — the price of using every core, paid only when the input is small
enough for that price to be trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: the session's default
    parallelism) iff its current plan yields fewer partitions — a no-op
    for any input that already fans across the cluster."""
    if df.isStreaming:
        # a stream's parallelism is set by its source partitioning, and
        # inspecting .rdd would force a batch execution — pass through
        return df
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
