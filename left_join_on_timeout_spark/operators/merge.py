"""MERGE INTO (upsert / CDC-apply) as a DataFrame composition.

Spark without a table format that implements ``MERGE`` (Delta/Iceberg)
still needs merge *semantics* to maintain feature tables and compacted
CDC snapshots. This operator expresses the standard three-clause merge —
WHEN MATCHED [AND cond] THEN UPDATE / DELETE, WHEN NOT MATCHED THEN
INSERT — as one full-outer equi-join plus per-column CASE projection,
which is exactly the join-based physical plan Delta itself executes for
a non-file-pruning merge.

Scale shape: one shuffle per side on the merge key (or a broadcast when
the source batch is small — left to Catalyst/AQE); the projection is
whole-stage-codegen CASE expressions, no Python. Unlike a table format
there is no file-level pruning or transaction — this is the pure
computation, suitable for rewrite-the-partition pipelines.

Rows behave as MERGE requires:

* target row with no source match — kept verbatim;
* matched pair — deleted when ``matched_delete`` holds, else updated
  column-wise by ``matched_update`` (unmentioned columns keep the
  target value);
* source row with no target match — inserted via
  ``not_matched_insert`` (or dropped when inserts are disabled, e.g. a
  delete-only CDC feed).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _Side:
    """Qualified column accessor: ``s["c"]`` / ``s.c`` → ``alias.c``."""

    def __init__(self, alias: str):
        self._alias = alias

    def __getitem__(self, name: str) -> Column:
        return F.col(f"{self._alias}.{name}")

    def __getattr__(self, name: str) -> Column:
        if name.startswith("_"):
            raise AttributeError(name)
        return F.col(f"{self._alias}.{name}")


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str,
    matched_update: Callable[[_Side, _Side], dict[str, Column]] | None = None,
    matched_delete: Callable[[_Side, _Side], Column] | None = None,
    not_matched_insert: Callable[[_Side], dict[str, Column]] | None = None,
    not_matched_condition: Callable[[_Side], Column] | None = None,
) -> DataFrame:
    """The merged table, with the target's schema.

    ``matched_update(t, s)`` returns {target column -> new value};
    ``matched_delete(t, s)`` a boolean Column (checked before update,
    like MERGE clause order); ``not_matched_insert(s)`` a complete
    {target column -> value} row, gated by ``not_matched_condition``
    (WHEN NOT MATCHED **AND cond** THEN INSERT — e.g. so a delete event
    for an absent key is a no-op, not an insert). Each callable receives
    qualified side accessors, so identically-named columns never
    collide."""
    t, s = _Side("t"), _Side("s")
    joined = target.alias("t").join(
        source.alias("s"), F.col(f"t.{on}") == F.col(f"s.{on}"),
        "full_outer")
    is_matched = t[on].isNotNull() & s[on].isNotNull()
    is_insert = t[on].isNull()

    keep = F.lit(True)
    if matched_delete is not None:
        keep = keep & ~(is_matched & F.coalesce(
            matched_delete(t, s), F.lit(False)))
    if not_matched_insert is None:
        keep = keep & ~is_insert
    elif not_matched_condition is not None:
        keep = keep & ~(is_insert & ~F.coalesce(
            not_matched_condition(s), F.lit(False)))

    updates = matched_update(t, s) if matched_update is not None else {}
    inserts = (not_matched_insert(s) if not_matched_insert is not None
               else {})
    cols = []
    for c in target.columns:
        v = t[c]
        if c in updates:
            v = F.when(is_matched, updates[c]).otherwise(v)
        if not_matched_insert is not None:
            if c not in inserts:
                raise ValueError(
                    f"not_matched_insert must provide every target "
                    f"column; missing {c!r}")
            v = F.when(is_insert, inserts[c]).otherwise(v)
        cols.append(v.alias(c))
    return joined.where(keep).select(*cols)
