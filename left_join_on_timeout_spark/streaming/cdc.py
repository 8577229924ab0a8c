"""Streaming CDC apply: maintain a queryable snapshot from a change
stream with per-micro-batch MERGE (``foreachBatch`` + ``operators.merge``).

The Debezium-style upsert feed: each change row is
``(key, seq, op, payload...)`` with op ``'U'`` (upsert: set the payload)
or ``'D'`` (delete). Per micro-batch:

1. compact the batch to its latest change per key (``max_by`` on the
   sequence — the same log-compaction aggregate as
   ``cdc_latest_per_key``);
2. MERGE into the snapshot **versioned by seq**: a change only applies
   when its ``seq`` is newer than the stored row's, so replayed or
   out-of-order batches can only converge, never regress — this is what
   makes restart-replay (checkpointed source offsets re-delivering a
   batch) idempotent;
3. publish the new snapshot (write to a side directory, then swap).

Scale + honesty notes: the read-merge-rewrite cycle is how Delta/Iceberg
``MERGE`` works physically, minus the transaction log — the directory
swap here is not crash-atomic (a table format's commit protocol is the
production answer; this module demonstrates the *semantics* on plain
parquet). Per batch the cost is one full-outer join of snapshot x
compacted-batch on the key — at 100 TB you partition the snapshot and
prune merge input to touched partitions.

One deletion caveat, inherent to tombstone-free deletes: a delete drops
the row *and its seq*, so a strictly-older upsert arriving after the
delete would resurrect the key. Feeds that can reorder across batch
boundaries need tombstone retention (keep deleted keys' seq) — not
needed for in-order sources like the checkpointed file/Kafka feeds
Spark's source offsets guarantee.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from left_join_on_timeout_spark.operators.merge import merge_into


def compact_batch(batch: DataFrame, on: str, seq_col: str) -> DataFrame:
    """Latest change per key within one batch (ties broken by op so a
    same-seq D/U pair resolves deterministically: 'U' > 'D')."""
    order = F.struct(F.col(seq_col), F.col("op"))
    others = [c for c in batch.columns if c != on]
    return batch.groupBy(on).agg(
        *[F.max_by(c, order).alias(c) for c in others])


def merge_cdc_batch(target: DataFrame, batch: DataFrame, on: str,
                    seq_col: str) -> DataFrame:
    """One versioned MERGE step: the new snapshot DataFrame."""
    compacted = compact_batch(batch, on, seq_col)
    payload = [c for c in target.columns if c not in (on,)]
    newer = lambda t, s: s[seq_col] > t[seq_col]  # noqa: E731
    return merge_into(
        target, compacted, on=on,
        matched_update=lambda t, s: {
            c: F.when((s.op == "U") & newer(t, s), s[c]).otherwise(t[c])
            for c in payload},
        matched_delete=lambda t, s: (s.op == "D") & newer(t, s),
        not_matched_insert=lambda s: {c: s[c] for c in target.columns},
        not_matched_condition=lambda s: s.op == "U")


def apply_cdc_stream(
    changes: DataFrame,
    target_path: str,
    on: str,
    seq_col: str = "seq",
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Start the snapshot-maintenance query over a streaming ``changes``
    DataFrame. ``target_path`` must hold the initial snapshot (key +
    payload + ``seq_col``); each micro-batch rewrites it through the
    versioned MERGE. Drain with ``processAllAvailable`` (bounded feeds)
    or leave running."""
    spark = changes.sparkSession

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        target = spark.read.parquet(target_path)
        merged = merge_cdc_batch(target, batch, on, seq_col)
        tmp = f"{target_path}.__staged_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{target_path}.__old_{batch_id}"
        os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old)

    writer = changes.writeStream.foreachBatch(apply_batch)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
