"""Deterministic-sampling query surface (operators/sampling.py): the
oracle reproduces the exact sampled row set with the same md5 gate,
proving the sample is a pure function of (seed, id) — not an
engine-dependent rand() stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from left_join_on_timeout_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)
from left_join_on_timeout_spark.queries import query
from left_join_on_timeout_spark.sources.tables import load_table


@query("sample_uniform_events", """
SELECT event_id, user_id
FROM events
WHERE substr(md5('42#' || CAST(event_id AS VARCHAR)), 1, 4) < '1999'
""")
def q_sample_uniform_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% uniform deterministic sample of events (threshold 0x1999 =
    floor(0.1 * 16^4)); the gate is a scan-pushed string predicate, no
    shuffle, no rand()."""
    events = load_table(spark, sf_dir, "events")
    return hash_sample(events, "event_id", 0.1).select(
        "event_id", "user_id")


@query("sample_stratified_docs", """
SELECT doc_id, lang, source
FROM documents
WHERE lang = 'zh'
   OR substr(md5('42#' || CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE WHEN lang = 'en' THEN '4000'
           WHEN lang = 'de' THEN 'c000'
           ELSE '8000' END
""")
def q_sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing: downsample dominant English to 25%, keep 75%
    of German, all of rare Chinese, 50% of everything else — one CASE
    threshold per row, deterministic across engines and re-runs."""
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, id_col="doc_id", strata_col="lang",
        rates={"en": 0.25, "de": 0.75, "zh": 1.0},
        default_rate=0.5)
    return out.select("doc_id", "lang", "source")
