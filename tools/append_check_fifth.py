#!/usr/bin/env python
"""Fifth-decade cost of the r14 append-contract enforcement: the
default `on_existing='error'` check semi-joins the batch's ids against
the LIVE postings id column (one column-pruned scan, output bounded by
the batch). Measured on the standing 5 M-doc gram index scratch copy
(.scale/gix_5M_rb, live postings_v2 ≈ 2.5e8 rows): two disjoint
fresh 5 k-doc batches re-keyed above the corpus id range, one appended
with the check OFF (the pre-r14 path), one with the check ON,
back-to-back on the same warm index — the delta is the check. Run on
a QUIET host."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.text_index import (
    text_index_append,
)
from left_join_on_timeout_spark.session import get_spark

WORK = "/root/repo/.scale/gix_5M_rb"
DOCS = "/root/repo/.scale/sf1000x_dense/documents.parquet"

spark = get_spark(app_name="append_check_fifth", cpus=32,
                  shuffle_partitions=64)
docs = spark.read.parquet(DOCS)
batches = []
for i in range(2):
    b = (docs.where(F.col("doc_id") % 1000 == i)
         .limit(5000)
         .select((F.col("doc_id") + F.lit(100_000_000 * (i + 1)))
                 .alias("doc_id"), "text"))
    b.persist().count()
    batches.append(b)

t0 = time.time()
text_index_append(batches[0], spark, WORK, on_existing="unchecked")
t_un = time.time() - t0
print(f"RESULT append_unchecked {t_un:.1f}s", flush=True)

t0 = time.time()
text_index_append(batches[1], spark, WORK)
t_ck = time.time() - t0
print(f"RESULT append_checked {t_ck:.1f}s", flush=True)
print(f"RESULT check_cost {t_ck - t_un:+.1f}s "
      f"({t_ck / max(t_un, 1e-9):.2f}x)", flush=True)

# and the refusal path: re-offer batch 0 (already live) — must raise
t0 = time.time()
try:
    text_index_append(batches[0], spark, WORK)
    print("RESULT refusal FAILED-TO-RAISE", flush=True)
except ValueError:
    print(f"RESULT refusal_raised {time.time()-t0:.1f}s", flush=True)
