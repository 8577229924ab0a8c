"""Skew-mitigation utilities for hot-key joins at 100 TB.

Spark's first line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``),
which splits oversized *partitions*. Salting complements it when a single
key is hot enough that even a split partition is dominated by one key's
rows (AQE splits a skewed partition into chunks, but a sort-merge join
still pairs every chunk of a hot key against the full matching side):

* the **skewed** side gets a deterministic salt in ``[0, salt)`` per row;
* the **other** side is replicated once per salt value (an ``explode``,
  so the replication is a narrow per-row operation, never a shuffle);
* the join key becomes ``(key…, _salt)``, spreading one hot key across
  ``salt`` shuffle partitions.

Cost model: the other side's shuffle volume multiplies by ``salt`` — use
for a modest-size build side against a skewed probe side, and size
``salt`` to the observed hot-key multiplicity (``skewed_key_stats``
measures it). Results are exactly those of the unsalted join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def salted_join(skewed: DataFrame, other: DataFrame,
                on: str | Sequence[str], how: str = "inner",
                salt: int = 16) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with an added salt key.

    The salt for a skewed-side row is ``pmod(hash(all columns), salt)`` —
    deterministic (safe under task retry) and content-spread: a hot key's
    rows land on all salts as long as their non-key payloads differ
    (identical full rows share a salt, which only matters if a hot key's
    rows are exact duplicates — dedup those first). The other side is
    exploded to carry every salt value, so each skewed row finds its
    match in exactly one salted partition and the result multiset equals
    the plain join's.
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "leftsemi", "left_semi", "leftanti", "left_anti"):
        # an unmatched *other*-side row would surface once per salt
        raise ValueError(f"salted_join preserves semantics only for "
                         f"inner/left-side joins, got {how!r}")
    keys = _keys(on)
    sk = skewed.withColumn(
        "_salt",
        F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt)))
    ot = other.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return sk.join(ot, keys + ["_salt"], how).drop("_salt")


def skewed_key_stats(df: DataFrame, on: str | Sequence[str],
                     top: int = 20) -> DataFrame:
    """(key…, n) for the ``top`` heaviest join keys — the measurement that
    sizes ``salt``. One partial-aggregated group-by plus a TakeOrdered;
    run it on a sample at 100 TB (``df.sample(0.01)``) since only the
    relative shape matters."""
    keys = _keys(on)
    return (df.groupBy(*keys).agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), *keys).limit(top))
