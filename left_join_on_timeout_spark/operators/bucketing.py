"""Bucketed-table co-location: the 100 TB answer to repeated fact-fact
joins on the same key.

A shuffle on the join key is the dominant cost of ``lineitem ⋈ orders``
at scale, and it repeats for every query that joins them. Bucketing
both tables by the key at write time (`DataFrameWriter.bucketBy`) makes
the partitioning a *table property*: Spark's scan reports
``HashPartitioning(key, n)``, the join's distribution requirement is
already satisfied on both sides, and the sort-merge join runs with
**zero Exchange operators** — every subsequent join on that key is
shuffle-free, forever, for every reader.

Constraints worth knowing at scale: both sides need the same bucket
count (or a divisor, with ``spark.sql.bucketing.coalesceBucketsInJoin``),
bucket pruning applies to equality filters on the bucket column, and
writes must avoid producing many small files per bucket (repartition by
the bucket key before writing — one file per bucket per write)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def write_bucketed(df: DataFrame, table: str, on: str | Sequence[str],
                   n_buckets: int, path: str | None = None) -> None:
    """Persist ``df`` as a bucketed+sorted managed table. Repartitions by
    the bucket key first so each bucket is one file per write (the
    small-files discipline); sorting within buckets lets the sort-merge
    join skip its sort too."""
    keys = _keys(on)
    writer = (df.repartition(n_buckets, *keys)
              .write.mode("overwrite")
              .bucketBy(n_buckets, *keys).sortBy(*keys))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned with
    no Exchange on either side (asserted in tests). At 100 TB this is
    the difference between re-shuffling both facts per query and reading
    co-located buckets."""
    keys = _keys(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
