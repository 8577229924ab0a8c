"""Chunked interval-overlap range join — the scale-safe plan for range
joins that have no (or a low-cardinality) equi key.

Why it exists: Catalyst plans a pure inequality join (``l.start <=
r.end AND r.start <= l.end``) as BroadcastNestedLoopJoin — O(|L| x |R|)
compares, and a non-broadcastable right side fails outright. The
standard fix (used by every warehouse engine's range-join optimization,
e.g. the published Databricks/DuckDB range-join strategies) is to
quantize time into fixed chunks so overlap candidates become an
EQUI-join on the chunk id:

1. explode each interval into the chunks it covers
   (``sequence(floor(start), floor(end))`` — bounded by
   interval_length / chunk + 2 rows),
2. hash-join on the chunk id (plus any real equi keys),
3. verify true overlap on the original bounds, and
4. keep each pair only in the chunk containing
   ``greatest(l.start, r.start)`` — every overlapping pair shares that
   chunk, so this *allocation* rule emits each pair exactly once
   without a distinct/shuffle-dedup stage.

Chunk size tunes shuffle fan-out vs duplication: ~the median interval
length is a good default. At 100 TB the join is an ordinary shuffled
hash join on (chunk), AQE-splittable on hot chunks; nothing is
broadcast-nested-loop and no pair is materialized twice.

The reference engine has no range join; this generalizes its
time-window join family (README.md:5-8) to interval-interval overlap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CHUNK = "__rj_chunk"


def _chunks(start: Column, end: Column, chunk_s: int) -> Column:
    lo = F.floor(F.unix_timestamp(start) / chunk_s).cast("long")
    hi = F.floor(F.unix_timestamp(end) / chunk_s).cast("long")
    return F.sequence(lo, hi)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    chunk: str = "1 hour",
) -> DataFrame:
    """Inner join of every (left, right) pair whose closed intervals
    ``[left_start, left_end]`` x ``[right_start, right_end]`` overlap,
    optionally also keyed on ``on``. Column sets must be disjoint apart
    from ``on``. ``chunk`` is the quantization bucket (an INTERVAL
    string understood by ``expr``); correctness does not depend on it,
    only the explode factor does."""
    chunk_s = _interval_seconds(chunk)
    le = left.withColumn(
        _CHUNK, F.explode(_chunks(F.col(left_start), F.col(left_end),
                                  chunk_s)))
    re = right.withColumn(
        _CHUNK, F.explode(_chunks(F.col(right_start), F.col(right_end),
                                  chunk_s)))
    keys = [_CHUNK] if on is None else [_CHUNK, on]
    j = le.join(re, keys)
    overlap = ((F.col(left_start) <= F.col(right_end))
               & (F.col(right_start) <= F.col(left_end)))
    # allocation: count the pair only in the chunk where the later of
    # the two starts lands — exactly one chunk per overlapping pair
    alloc_ts = F.greatest(F.col(left_start), F.col(right_start))
    alloc = (F.floor(F.unix_timestamp(alloc_ts) / chunk_s).cast("long")
             == F.col(_CHUNK))
    return j.where(overlap & alloc).drop(_CHUNK)


def _interval_seconds(interval: str) -> int:
    """Parse '1 hour' / '30 minutes' / '90 seconds' to whole seconds."""
    n, unit = interval.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    if unit not in mult:
        raise ValueError(f"unsupported chunk unit: {unit!r}")
    return int(n) * mult[unit]
