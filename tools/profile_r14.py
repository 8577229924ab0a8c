#!/usr/bin/env python
"""Round-14 operator-level profiler: run one registered query with the
eager index-lifecycle operators (build/append/delete/rebuild, the
streaming harness) monkeypatched to log wall time, so a heavy query's
seconds decompose into named operator costs without touching the query.

Lazy operators (loads, probes, searches) only show driver-side planning
time here; their execution cost lands in the final noop action, printed
as `residual`.

Usage: python tools/profile_r14.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import functools
import importlib
import sys
import time

sys.path.insert(0, "/root/repo")

EAGER = {
    "left_join_on_timeout_spark.operators.text_index": [
        "text_index_build", "text_index_append", "text_index_delete",
        "text_index_rebuild", "text_index_load",
    ],
    "left_join_on_timeout_spark.operators.lsh_index": [
        "lsh_index_build", "lsh_index_append", "lsh_index_delete",
        "lsh_index_rebuild", "lsh_index_load",
    ],
    "left_join_on_timeout_spark.operators.srp_index": [
        "srp_index_build", "srp_index_append", "srp_index_delete",
        "srp_index_rebuild", "srp_index_load",
    ],
    "left_join_on_timeout_spark.operators.ann_index": [
        "ivf2_index_build", "ivf2_index_append", "ivf2_index_delete",
        "ivf2_index_rebuild", "ivf2_index_load",
        "pq_index_build", "pq_index_append", "pq_index_delete",
        "pq_index_rebuild", "pq_index_load",
        "_read_meta", "_corpus_stats_never",  # placeholder, skipped
    ],
    "left_join_on_timeout_spark.operators.index_admin": [
        "delete_from_indexes", "discover_indexes",
    ],
}

LOG: list[tuple[str, float]] = []


def _wrap(mod, name):
    fn = getattr(mod, name, None)
    if fn is None or not callable(fn):
        return

    @functools.wraps(fn)
    def timed(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            LOG.append((f"{mod.__name__.rsplit('.', 1)[-1]}.{name}",
                        time.perf_counter() - t0))

    setattr(mod, name, timed)
    return fn


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    # patch the defining modules FIRST, then rebind any from-imports in
    # already-imported query modules by reimporting them afterwards
    for modname, fns in EAGER.items():
        mod = importlib.import_module(modname)
        for fname in fns:
            _wrap(mod, fname)

    from left_join_on_timeout_spark import queries as q  # noqa: E402
    from left_join_on_timeout_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="profile_r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        # warmup pass on the smallest SF to exclude first-touch JVM cost
        LOG.clear()
        try:
            df = q.QUERIES[name](spark, "/root/testdata/sf0.001")
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warmup {name} failed: {e}")
        LOG.clear()
        t0 = time.perf_counter()
        df = q.QUERIES[name](spark, sf_dir)
        t_plan = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        print(f"\n=== {name}: total {total:.2f}s "
              f"(query-fn wall {t_plan:.2f}s) ===")
        acc: dict[str, list[float]] = {}
        for op, dt in LOG:
            acc.setdefault(op, []).append(dt)
        opsum = 0.0
        for op, ts in sorted(acc.items(), key=lambda kv: -sum(kv[1])):
            opsum += sum(ts)
            print(f"  {sum(ts):7.2f}s  x{len(ts):<3d} {op}")
        print(f"  {total - opsum:7.2f}s  residual (lazy exec + rest)")


if __name__ == "__main__":
    main()
