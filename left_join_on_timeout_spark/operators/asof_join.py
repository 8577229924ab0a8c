"""As-of join: each left row pairs with the single nearest right row on
the time axis (per key), instead of every in-window right row.

Relationship to the reference (kptfh/left-join-on-timeout): the
reference's operator emits *all* matches inside the window
(LeftJoinOnTimeoutTest.java:85-91 asserts multimap semantics) plus a
timeout row when there are none. The as-of join is the
nearest-single-match variant of the same left-retaining time join —
the form feeds-from-sensors / trade-vs-quote pipelines want. It is not
in the reference; it completes the time-join family on this engine.

Scale design — one shuffle, no candidate explosion:

The naive plan (range join on ``r.ts BETWEEN l.ts - tol AND l.ts`` then
``row_number() = 1``) materializes every candidate pair before
discarding all but one — at 100 TB a hot key with a dense right stream
turns that into a multiplicative blow-up. Instead we run the classic
sorted-merge formulation:

1. union the two sides (tagged, right columns null on left rows),
2. one hash shuffle on the key + one sort on (ts, side, tiebreak),
3. ``last(<right col>, ignorenulls=True)`` over the running window
   carries the most recent right row forward onto each left row,
4. keep left rows; null the carried columns when outside tolerance.

Output size equals the left side exactly; shuffle size is |L| + |R|
rows regardless of match density. Ties (r.ts == l.ts) match, as in
pandas ``merge_asof(allow_exact_matches=True)``; among right rows with
identical (key, ts) the one with the greatest tiebreak column wins,
which keeps the result deterministic and lets a SQL oracle reproduce
it with ``max_by``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join on key ``on``: nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) each left row's
    timestamp, optionally within ``tolerance`` (an INTERVAL string,
    e.g. ``"30 minutes"``). Right columns come back ``prefix``-renamed
    and null when unmatched. ``tiebreak`` (default: first non-key right
    column) resolves identical (key, ts) right rows — greatest wins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r_cols = [c for c in right.columns if c != on]
    if tiebreak is None:
        tiebreak = next(c for c in r_cols if c != right_ts)
    # Tag and align the two sides for the union: left keeps its own
    # columns, right contributes prefix-renamed payload columns.
    out_r = [f"{prefix}{c}" for c in r_cols]
    lt = left.select(
        F.col(on), F.col(left_ts).alias(_TS), F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in r_cols],
    )
    rt = right.select(
        F.col(on), F.col(right_ts).alias(_TS), F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        *[F.col(c).alias(f"{prefix}{c}") for c in r_cols],
    )
    u = lt.unionByName(rt)
    # Traversal order: time, right-before-left at ties (exact matches
    # count), then tiebreak so the winning duplicate is deterministic.
    if direction == "backward":
        order = [F.asc(_TS), F.asc(_SIDE), F.asc(f"{prefix}{tiebreak}")]
    else:
        order = [F.desc(_TS), F.asc(_SIDE), F.asc(f"{prefix}{tiebreak}")]
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        F.col(on), F.col(_TS), F.col(_SIDE),
        *[F.col(c) for c in left.columns if c != on],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_r],
    )
    out = carried.where(F.col(_SIDE) == 1)
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        rts = F.col(f"{prefix}{right_ts}")
        in_tol = (rts >= F.col(_TS) - iv) if direction == "backward" \
            else (rts <= F.col(_TS) + iv)
        out = out.select(
            F.col(on), F.col(_TS),
            *[F.col(c) for c in left.columns if c != on],
            *[F.when(in_tol, F.col(c)).alias(c) for c in out_r],
        )
    return out.select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        *[F.col(c) for c in out_r],
    )


def asof_join_range(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "30 minutes",
    tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Range-join formulation of the backward as-of join (candidate pairs
    then keep the greatest (ts, tiebreak) per left row). Same result as
    ``asof_join(direction='backward')``; kept as the cross-check twin
    and for the case where the right side is small enough to broadcast,
    which turns the whole join shuffle-free on the left. Requires left
    rows to be distinct (they become the group-by key)."""
    r_cols = [c for c in right.columns if c != on]
    if tiebreak is None:
        tiebreak = next(c for c in r_cols if c != right_ts)
    # Pre-rename the right side so a self-join (both sides derived from
    # the same scan) has unambiguous column lineage.
    rt = right.select(
        F.col(on).alias("__r_key"),
        *[F.col(c).alias(f"{prefix}{c}") for c in r_cols],
    )
    iv = F.expr(f"INTERVAL {tolerance}")
    rts = F.col(f"{prefix}{right_ts}")
    cand = left.join(
        rt,
        on=[F.col(on) == F.col("__r_key"),
            rts <= F.col(left_ts),
            rts >= F.col(left_ts) - iv],
        how="left",
    )
    best = F.max_by(
        F.struct(*[F.col(f"{prefix}{c}").alias(c) for c in r_cols]),
        F.struct(rts, F.col(f"{prefix}{tiebreak}")),
    )
    out = cand.groupBy(*[F.col(c) for c in left.columns]).agg(
        best.alias("__best"))
    return out.select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        *[F.col(f"__best.{c}").alias(f"{prefix}{c}") for c in r_cols],
    )
