"""Approximate near-duplicate detection over ``documents`` — MinHash-LSH
and SimHash (SURVEY.md §2 #16-17).

Both are expressed entirely in JVM built-in higher-order functions
(transform / aggregate / xxhash64 / explode) — no Python in the hot path,
so the plans whole-stage-codegen and scale linearly until the band/segment
equi-join, which shuffles only (key, doc_id) pairs, not documents.

These are rows-only inventory entries (no practical SQL oracle); known-
answer correctness (planted near-dupes found, disjoint docs not paired)
is asserted in tests/test_ops.py, and the exact-Jaccard verification step
inside minhash matches dedup_ngram_jaccard's oracle-checked math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_JACCARD_THRESHOLD,
    MINHASH_PERMS,
    SIMHASH_MAX_HAMMING,
    SIMHASH_SEGMENTS,
)
from ecommerce_dbt_medallion_spark.ops.text import NGRAM_N, WS_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table


def _shingles(text: Column) -> Column:
    """Distinct token-3-gram shingle array (same shingling as
    dedup_ngram_jaccard, so minhash estimates THAT Jaccard)."""
    tokens = F.split(F.lower(F.trim(text)), WS_RE)
    return F.when(
        F.size(tokens) >= NGRAM_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tokens) - NGRAM_N),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(tokens, i + 1),
                    F.element_at(tokens, i + 2),
                    F.element_at(tokens, i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _minhash_sig(shingles: Column) -> Column:
    """64-permutation minhash signature: sig[p] = min over shingles of
    xxhash64(shingle, p). One pass over the shingle array per perm —
    all JVM, no UDF."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(MINHASH_PERMS - 1)),
        lambda p: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, p))
        ),
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _shingles(F.col("text")).alias("shingles"),
    ).withColumn("sig", _minhash_sig(F.col("shingles")))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#16: shingle → 64-perm minhash → 16×4 LSH bands → candidate pairs →
    exact-Jaccard verify ≥ threshold.

    Scale shape: documents are hashed in one narrow pass; the band
    explosion emits 16 small (band_key, doc_id) rows per doc; candidates
    come from an equi-join on band_key (shuffle of keys only); exact
    verification re-joins the two shingle arrays for candidate pairs only.
    """
    sigs = minhash_signatures(spark, sf_dir).where(F.size("shingles") > 0)

    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * LSH_ROWS + 1, LSH_ROWS),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_id", "band_key"),
    )
    candidates = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = sigs.select("doc_id", "shingles")
    verified = (
        candidates.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles"))).alias(
                "n_common"
            ),
            F.size("sa.shingles").alias("n_a"),
            F.size("sb.shingles").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .where(F.col("jaccard") >= MINHASH_JACCARD_THRESHOLD)
    )
    return verified.select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")


def _simhash(shingles: Column) -> Column:
    """64-bit SimHash: per bit, sum ±1 votes from each shingle's xxhash64
    bit, take the sign. Expressed as nested folds over (bit, shingle)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda bit: F.when(
            F.aggregate(
                shingles,
                F.lit(0),
                lambda acc, s: acc
                + F.when(F.bit_get(F.xxhash64(s), bit) == 1, 1).otherwise(-1),
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", _shingles(F.col("text")).alias("shingles"))
        .where(F.size("shingles") > 0)
        .withColumn("simhash_bits", _simhash(F.col("shingles")))
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#17: 64-bit simhash, 4-segment pigeonhole blocking (any pair with
    Hamming distance <= 3 shares at least one identical 16-bit segment),
    exact Hamming verify.
    """
    seg_len = 64 // SIMHASH_SEGMENTS
    sigs = simhash_signatures(spark, sf_dir)

    segs = sigs.select(
        "doc_id",
        "simhash_bits",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(SIMHASH_SEGMENTS - 1)),
                lambda s: F.concat_ws(
                    "",
                    F.transform(
                        F.slice(F.col("simhash_bits"), s * seg_len + 1, seg_len),
                        lambda v: v.cast("string"),
                    ),
                ),
            )
        ).alias("seg_id", "seg_key"),
    )
    candidates = (
        segs.alias("a")
        .join(
            segs.alias("b"),
            (F.col("a.seg_id") == F.col("b.seg_id"))
            & (F.col("a.seg_key") == F.col("b.seg_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash_bits").alias("bits_a"),
            F.col("b.simhash_bits").alias("bits_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.aggregate(
        F.zip_with(F.col("bits_a"), F.col("bits_b"), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda a, x: a + x,
    )
    return (
        candidates.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )
