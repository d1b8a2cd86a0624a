"""Deterministic corpus sampling — the down-sampling stage of a
training-data pipeline (language rebalancing, eval holdouts).

Randomness is replaced by hashing so runs are reproducible and the
DuckDB oracle is value-exact: a document's inclusion depends only on
md5(doc_id || salt). The uniform variate is the first 8 hex chars of the
md5 COMPARED AS A STRING against a precomputed hex threshold —
lexicographic order on fixed-width lowercase hex equals numeric order,
and both engines produce the identical digest string, so no hex→int
conversion (an engine-dialect minefield) is ever needed.

Both operators are single-pass, shuffle-free (stratified filter) or
bounded-shuffle (fixed-k: the two-stage top-k from ops.topk), and scale
linearly: nothing here materializes a stratum in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.topk import top_k_per_group
from ecommerce_dbt_medallion_spark.sources.registry import load_table

SAMPLE_SALT = "#strat1"

# Per-language keep rates: rebalance a multilingual corpus toward the
# high-resource language while retaining long-tail coverage.
STRATA_RATES: dict[str, float] = {"en": 0.5, "de": 0.35, "fr": 0.2, "es": 0.1}
DEFAULT_RATE = 0.05

PER_STRATUM_K = 40


def _hex_threshold(rate: float) -> str:
    """rate in [0,1] → 8-hex-digit cutoff: keep iff md5-prefix < cutoff."""
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def _bucket(col):
    return F.substring(
        F.md5(F.concat(col.cast("string"), F.lit(SAMPLE_SALT))), 1, 8
    )


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-stratified Bernoulli sample with per-language rates.

    Pure filter over one scan — no shuffle, trivially parallel at any
    scale; the sample is a deterministic function of doc_id alone, so
    re-runs (and engines) agree row-for-row.
    """
    thr = F.lit(_hex_threshold(DEFAULT_RATE))
    for lang, rate in sorted(STRATA_RATES.items()):
        thr = F.when(F.col("lang") == lang, F.lit(_hex_threshold(rate))).otherwise(thr)
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("sample_bucket", _bucket(F.col("doc_id")))
        .where(F.col("sample_bucket") < thr)
        .select("doc_id", "lang", "source", "n_chars", "sample_bucket")
    )


def oracle_corpus_stratified_sample() -> str:
    cases = "\n            ".join(
        f"when '{lang}' then '{_hex_threshold(rate)}'"
        for lang, rate in sorted(STRATA_RATES.items())
    )
    return f"""
select doc_id, lang, source, n_chars, sample_bucket from (
    select doc_id, lang, source, n_chars,
        substr(md5(cast(doc_id as varchar) || '{SAMPLE_SALT}'), 1, 8) as sample_bucket,
        case lang
            {cases}
            else '{_hex_threshold(DEFAULT_RATE)}'
        end as thr
    from documents
) where sample_bucket < thr
"""


def corpus_sample_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size deterministic sample: the PER_STRATUM_K docs with the
    smallest md5 bucket per language (an exact hash-ordered 'reservoir').

    Uses the two-stage salted top-k (ops.topk) so a 100 TB stratum never
    funnels through a single window partition.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "sample_bucket", _bucket(F.col("doc_id"))
    )
    return top_k_per_group(
        docs,
        ["lang"],
        [F.asc("sample_bucket"), F.asc("doc_id")],
        F.col("doc_id"),
        PER_STRATUM_K,
        rank_alias="sample_rank",
    ).select("doc_id", "lang", "sample_bucket", "sample_rank")


def oracle_corpus_sample_per_stratum() -> str:
    return f"""
select doc_id, lang, sample_bucket, sample_rank from (
    select doc_id, lang,
        substr(md5(cast(doc_id as varchar) || '{SAMPLE_SALT}'), 1, 8) as sample_bucket,
        cast(row_number() over (
            partition by lang
            order by substr(md5(cast(doc_id as varchar) || '{SAMPLE_SALT}'), 1, 8), doc_id
        ) as bigint) as sample_rank
    from documents
) where sample_rank <= {PER_STRATUM_K}
"""
