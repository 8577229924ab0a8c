"""Overlap INDEPENDENT Spark actions from driver threads.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially (guide §2.6 — "Overlap independent jobs"). The index-
lifecycle queries routinely pay two or three INDEPENDENT index builds
back to back (gram + word + IVF2 in the cross-tier decontamination
loop; LSH + SRP + gram in the curation chains; text + IVF2 in the
hybrid arms): each build tails off into a few straggler tasks (the
partitioned write, the stats read-back, the manifest publish) while
the rest of the cluster sits idle, so submitting the builds from a
small thread pool lets the next build's tasks back-fill the idle
executors. FIFO scheduling (the default) gives exactly the wanted
back-fill behaviour.

This changes ONLY wall-clock overlap — every build still runs the same
jobs on the same data to the same paths, and the callers overlap only
actions with disjoint outputs (different index roots), so results are
byte-identical to the sequential order.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Sequence


def overlap(thunks: Sequence[Callable[[], Any]]) -> list:
    """Run the given zero-arg callables concurrently (one driver thread
    each) and return their results in input order. Exceptions propagate
    — the first failing thunk's error (in INPUT order) is raised after
    all threads have finished (the pool joins its workers first), so a
    failure cannot leave a half-finished sibling write racing the
    caller's error handling. Every OTHER thunk's exception is attached
    to the raised one as a ``__notes__`` line (ADVICE r14: two builds
    failing for different reasons must not hide the second root
    cause).

    Callers must only overlap INDEPENDENT work: disjoint output paths,
    no shared mutable driver state. Job groups / descriptions are
    thread-local in Spark, so each thunk may label its own jobs."""
    thunks = list(thunks)
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        results, errors = [], []
        for i, f in enumerate(futures):
            try:
                results.append(f.result())
            except Exception as e:  # noqa: BLE001 — re-raised below
                errors.append((i, e))
                results.append(None)
        if errors:
            first = errors[0][1]
            for i, e in errors[1:]:
                first.add_note(
                    f"overlap: thunk #{i} also failed: "
                    f"{type(e).__name__}: {e}")
            raise first
        return results
