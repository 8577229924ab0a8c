#!/usr/bin/env python
"""Fifth-decade WORD-tier compaction economics (round 14): the
rebuild-over-serve ratio `maintenance_budgets` pins for text[word].
Copies the standing 5 M-doc word index (.scale/tix_5M — kept
pristine), times a warm fixed-3-term serve (min of 3) and one full
rebuild on the copy, and prints the ratio. Run on a QUIET host."""
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from left_join_on_timeout_spark.session import get_spark
from left_join_on_timeout_spark.operators.text_index import (
    text_index_load,
    text_index_rebuild,
    text_index_search,
)

SRC = "/root/repo/.scale/tix_5M"
WORK = "/root/repo/.scale/tix_5M_rb14"

shutil.rmtree(WORK, ignore_errors=True)
t0 = time.time()
shutil.copytree(SRC, WORK)
print(f"RESULT copy {time.time()-t0:.1f}s", flush=True)

spark = get_spark(app_name="word_rebuild_fifth", cpus=32,
                  shuffle_partitions=64)
index = text_index_load(spark, WORK)
serves = []
for i in range(3):
    t0 = time.time()
    n = text_index_search(index, ["spark", "join", "window"]).count()
    serves.append(time.time() - t0)
    print(f"RESULT serve{i} {serves[-1]:.2f}s rows={n}", flush=True)
warm = min(serves[1:])
t0 = time.time()
text_index_rebuild(spark, WORK)
rb = time.time() - t0
print(f"RESULT rebuild {rb:.1f}s", flush=True)
print(f"RESULT ratio R/S = {rb:.1f}/{warm:.2f} = {rb/warm:.1f}", flush=True)
