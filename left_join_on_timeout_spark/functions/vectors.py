"""Vector column expressions over ``array<float>`` embeddings.

All math runs JVM-side via higher-order functions (``zip_with`` /
``aggregate``) in DOUBLE — no Python in the loop, and the sequential
left-fold accumulation is bit-identical to DuckDB's ``list_dot_product``
on ``DOUBLE[]`` (verified empirically), so similarity oracles compare
exactly, without rounding slop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (whole-stage codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def srp_bucket(v: Column, n_bits: int) -> Column:
    """Sign-random-projection bucket from the signs of the first ``n_bits``
    components (axis-aligned hyperplanes — deterministic, reproducible in
    plain SQL). Nearby vectors share buckets with high probability; the
    bucket string is the LSH key for the scale path: candidate generation
    becomes an equi-join instead of an O(n²) cross join."""
    bits = [
        F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)
