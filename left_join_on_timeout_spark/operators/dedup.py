"""Deduplication operators for the training-data pipeline surface:
exact, MinHash+LSH, SimHash, and n-gram Jaccard.

Design for 100 TB:

* Exact dedup is one hash aggregation on a text digest — never on the raw
  text (shuffling a 64-char digest instead of multi-KB documents).
* MinHash is **string-min based**: ``minhash_j(doc) = min(md5(shingle‖'#'‖j))``
  over the doc's shingles. Min over strings is associative/commutative →
  partial aggregation map-side; one shuffle per signature build. Banding
  turns near-dup search into an equi-join on (band_idx, band_hash) — no
  O(n²) pass anywhere. The md5-based hash family is engine-portable, so
  the DuckDB oracle reproduces signatures bit-for-bit.
* SimHash packs a 16-bit signature from the high bit of each md5 hex digit
  of every token; Hamming-0 buckets come out of a plain group-by.
* Jaccard verification joins candidate pairs on shared shingles only —
  the join key prunes non-overlapping pairs before any pair is scored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from left_join_on_timeout_spark.functions.text import normalize, words

DEFAULT_SHINGLE = 3  # word 3-grams
DEFAULT_K = 12       # minhash permutations
DEFAULT_BANDS = 4    # 4 bands × 3 rows


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups keyed by a whitespace-normalized md5 digest:
    (digest, keep_id = min id, n copies)."""
    digest = F.md5(F.regexp_replace(normalize(text_col), r"\s+", " "))
    return (df.select(F.col(id_col), digest.alias("digest"))
            .groupBy("digest")
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n")))


def shingles(text_col: str, n: int = DEFAULT_SHINGLE) -> Column:
    """Word n-gram shingles (1-based element_at so the SQL twin matches).
    Docs shorter than n words contribute one whole-text shingle."""
    w = words(text_col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, make).otherwise(
        F.array(F.concat_ws(" ", w)))


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      k: int = DEFAULT_K,
                      shingle_n: int = DEFAULT_SHINGLE) -> DataFrame:
    """(id, m0..m{k-1}): per-doc minhash signature. One explode + one
    partial-aggregated group-by; duplicates among shingles are harmless
    (min is idempotent) so no distinct pass is spent."""
    sh = df.select(F.col(id_col),
                   F.explode(shingles(text_col, shingle_n)).alias("shingle"))
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"m{j}")
        for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, id_col: str,
                        k: int = DEFAULT_K,
                        bands: int = DEFAULT_BANDS) -> DataFrame:
    """Band the signature and equi-join on (band_idx, band_hash):
    distinct candidate pairs (id_a < id_b). The self-join key is a 32-char
    digest — tiny shuffle payload regardless of document size."""
    rows = k // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"m{b * rows + r}") for r in range(rows)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.md5(F.concat_ws("|", *parts)).alias("h")))
    banded = sig.select(
        F.col(id_col),
        F.explode(F.array(*band_cols)).alias("bh"),
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "h")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "h")
    return (a.join(b, ["band", "h"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct())


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 16-bit SimHash as a bit-string. Bit b is the sign of
    Σ_tokens (±1 by the high bit of hex digit b of md5(token))."""
    tok = df.select(F.col(id_col), F.explode(words(text_col)).alias("tok"))
    tok = tok.withColumn("h", F.md5("tok"))
    bit_aggs = []
    for b in range(16):
        digit = F.substring("h", b + 1, 1)
        signed = F.when(digit.isin(*"89abcdef"), 1).otherwise(-1)
        bit_aggs.append(
            F.when(F.sum(signed) > 0, F.lit("1")).otherwise(F.lit("0"))
            .alias(f"b{b}"))
    per_doc = tok.groupBy(id_col).agg(*bit_aggs)
    return per_doc.select(
        F.col(id_col),
        F.concat(*[F.col(f"b{b}") for b in range(16)]).alias("simhash"))


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  threshold: float = 0.5,
                  shingle_n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Exact shingle-set Jaccard over pairs that share ≥1 shingle
    (the join prunes everything else): (id_a, id_b, jaccard ≥ threshold).
    At scale this runs AFTER LSH candidate generation; standalone it is
    still shuffle-bounded by the shared-shingle join, not n²."""
    sh = df.select(F.col(id_col),
                   F.explode(shingles(text_col, shingle_n)).alias("shingle")
                   ).distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter")))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (inter.join(na, "id_a").join(nb, "id_b")
           .withColumn("jaccard",
                       F.col("inter") /
                       (F.col("n_a") + F.col("n_b") - F.col("inter"))))
    return (jac.where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b",
                    F.round("jaccard", 6).alias("jaccard")))
