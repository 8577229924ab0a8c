#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet dir,
compare row count + schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.sources.tables import TABLES


def type_class(s: pd.Series) -> str:
    """Coarse type class the driver's value-hash distinguishes. int vs float
    vs datetime vs bool vs other — same values in different classes hash
    differently, so the local gate must treat a class mismatch as FAIL
    (r1 lesson: floor→BIGINT vs floor→DOUBLE passed here, failed the driver)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns + rows only; keep dtypes type-strict (no int→float
    unification, no timestamp truncation) so local PASS predicts the
    driver's hash."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")  # canonical unit, not a value change
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")  # one width; stays an *int* class
        elif s.dtype == object or pd.api.types.is_string_dtype(s):
            df[c] = s.astype(object).where(s.notna(), None)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"schema mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    for c in sorted(spark_pdf.columns):
        ta, tb = type_class(spark_pdf[c]), type_class(duck_pdf[c])
        if ta != tb:
            problems.append(f"col {c}: TYPE mismatch spark={ta}({spark_pdf[c].dtype}) duck={tb}({duck_pdf[c].dtype})")
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        if type_class(a[c]) == "datetime":
            a[c] = a[c].astype("int64")
            b[c] = b[c].astype("int64")
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            bad = ~((pd.isna(av) & pd.isna(bv)) | (av == bv))
            if bad.any():
                close = np.isclose(av[bad].astype(float), bv[bad].astype(float),
                                   rtol=1e-12, atol=1e-12, equal_nan=True)
                if close.all():
                    problems.append(f"col {c}: {bad.sum()} values differ only in last ULPs (HASH RISK)")
                else:
                    i = int(np.nonzero(bad)[0][0])
                    problems.append(f"col {c}: {bad.sum()} value diffs, e.g. row{i}: {av[i]!r} vs {bv[i]!r}")
        else:
            def _diff(x, y):
                xa, ya = pd.isna(x) is True, pd.isna(y) is True
                if xa or ya:
                    return xa != ya
                return bool(x != y)
            neq = [(x, y) for x, y in zip(av, bv) if _diff(x, y)]
            if neq:
                problems.append(f"col {c}: {len(neq)} value diffs, e.g. {neq[0]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(spark_pdf)} (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            if len(spark_pdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     - {p}")
        else:
            print(f"PASS {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failing")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
