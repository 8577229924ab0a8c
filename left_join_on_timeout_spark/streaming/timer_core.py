"""Pure-Python semantics core of the exact-timer LEFT JOIN ON TIMEOUT
(SURVEY M3) — the reference's mechanism, engine-agnostic.

Both stateful-processor adapters (``timer_join`` on
``transformWithStateInPandas``, ``timer_join_state`` on
``applyInPandasWithState``) replay records through these functions, so
the mechanism semantics — schedule, symmetric windowed match, cancel
(incl. the strict cancel-all-per-key quirk), capacity, lazy timer
cancellation, timeout emission — live in exactly one place and are unit
tested without a SparkSession.

State model per key (mirrors the reference):

* ``lefts``  — list of ``[ts_us, payload, deadline_ms, armed]``: the
  per-key multimap of pending scheduled lefts (O12,
  ``MultiMapUtils.java:15-35``) plus the join buffer for the left side.
* ``rights`` — list of ``[ts_us, payload]``: the right side's join
  buffer (the reference delegates this to Kafka Streams' windowed-join
  store, ``LeftJoinOnTimeoutBuilder.java:112-115``).

Timers are lazily cancelled: a cancel disarms the entry but leaves it
until fire time, exactly the reference's ``removeOnCancelPolicy=false``
(``BlockingScheduledExecutor.java:14, 28-30``).
"""

from __future__ import annotations


class CapacityExceeded(RuntimeError):
    """Armed-timer capacity hit with policy='error' (the reference would
    block the stream thread instead: BlockingScheduledExecutor.java:21)."""


def replay(lefts: list, rights: list, rows, window_us: int, timeout_ms: int,
           strict: bool, capacity: int, capacity_policy: str):
    """Replay ``rows`` = iterable of (ts_us, payload, side) in order
    through the reference topology for one key.

    Returns (emitted, lefts, rights); ``emitted`` rows are
    (left_ts_us, left_payload, right_payload) — inner-join outputs only
    (timeouts come from :func:`fire_due`). Mutates and returns the state
    lists."""
    out = []
    for ts_us, payload, side in rows:
        if side == "L":
            # O4 schedule: arm a timer at ts + timeout
            armed_count = sum(1 for l in lefts if l[3])
            arm = True
            if armed_count >= capacity:
                if capacity_policy == "error":
                    raise CapacityExceeded(
                        f"scheduled_capacity {capacity} exceeded")
                arm = False  # "drop": still joins, never times out
            entry = [ts_us, payload, ts_us // 1000 + timeout_ms, arm]
            lefts.append(entry)
            # O2: symmetric windowed join against buffered rights
            matched = [r for r in rights if abs(r[0] - ts_us) <= window_us]
            for r in matched:
                out.append((ts_us, payload, r[1]))
            if matched:
                _cancel(lefts, strict, {id(entry)})
        else:
            rights.append([ts_us, payload])
            matched = [l for l in lefts if abs(l[0] - ts_us) <= window_us]
            for l in matched:
                out.append((l[0], l[1], payload))
            if matched:
                _cancel(lefts, strict, {id(l) for l in matched})
    return out, lefts, rights


def _cancel(lefts: list, strict: bool, matched_ids: set) -> None:
    """O5: a join output cancels timers — **all** of the key's pending
    lefts in strict reference mode (``ScheduledStateStore.java:95-106``,
    even one whose own window does not contain the right record), else
    only the matched ones (SQL-correct mode)."""
    for l in lefts:
        if strict or id(l) in matched_ids:
            l[3] = False


def fire_due(lefts: list, now_ms: int, window_us: int,
             retention_horizon_us: int | None = None):
    """O6: emit ``(left, null)`` for every still-armed left whose
    deadline has passed. A fired left is *disarmed, not dropped*: the
    reference's windowed join store retains it independently of the
    timer (``LeftJoinOnTimeoutBuilder.java:112-115``), so a right
    arriving after the timeout fired still joins it — the wall-clock
    double-emission race (``ScheduledStateStoreTest.java:62-101``).

    ``now_ms`` is whatever clock arms the deadlines (event-time
    watermark or processing time). ``retention_horizon_us`` is always
    on the *event* clock; it defaults to ``now_ms`` (correct in
    event-time mode, where firing implies the watermark passed the
    join window too, so fired lefts are dropped immediately —
    no double emission is possible by construction). Wall-clock
    adapters pass their event-time high-water instead, keeping
    recently-fired lefts joinable."""
    out, keep = [], []
    horizon_us = (now_ms * 1000 if retention_horizon_us is None
                  else retention_horizon_us)
    for l in lefts:
        ts_us, payload, deadline, armed = l
        if armed and deadline <= now_ms:
            out.append((ts_us, payload, None))
            l[3] = False  # lazily cancelled; join retention below
        if l[3] or ts_us + window_us >= horizon_us:
            keep.append(l)
    return out, keep


def gc_lefts(lefts: list, watermark_ms: int, window_us: int) -> list:
    """Evict *disarmed* lefts whose join window the event clock has
    passed (armed ones are dropped by their own timer). Bounds state
    between timer callbacks; same retention rule as :func:`gc_rights`."""
    if watermark_ms <= 0:
        return lefts
    horizon_us = watermark_ms * 1000
    return [l for l in lefts if l[3] or l[0] + window_us >= horizon_us]


def gc_rights(rights: list, watermark_ms: int, window_us: int) -> list:
    """Evict rights that can no longer match any future left (watermark
    passed their window) — the analog of the join store's ``until(R)``
    retention (``LeftJoinOnTimeoutBuilder.java:114``)."""
    if watermark_ms <= 0:
        return rights
    horizon_us = watermark_ms * 1000
    return [r for r in rights if r[0] + window_us >= horizon_us]


def next_deadline(lefts: list) -> int | None:
    """Earliest armed deadline (ms), or None — the single-timer adapters
    re-arm their key timer to this after every update."""
    armed = [l[2] for l in lefts if l[3]]
    return min(armed) if armed else None
