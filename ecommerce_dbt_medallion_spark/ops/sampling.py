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


# ------------------------------------- quality-weighted sampling

WSAMP_SALT = "#wsamp1"
_WSAMP_SCALE = 4294967296.0  # 2^32: score -> 8-hex-digit threshold


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic Bernoulli sampling: each document
    survives with probability = its quality score (high-quality docs
    kept, low-quality downsampled) — the importance-resampling step of a
    training-data pipeline.

    keep iff md5-uniform(doc_id) < floor(score * 2^32) rendered as an
    8-hex-digit threshold — a per-row STRING compare, reproducible
    across engines, runs, and partitionings. Unlike
    ``corpus_stratified_sample`` (fixed per-language rates) the rate
    here is per-document data. Pure projection + filter: zero shuffle,
    scan-bound at 100 TB.
    """
    from ecommerce_dbt_medallion_spark.ops.text import text_quality_score

    q = text_quality_score(spark, sf_dir)
    u_hex = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(WSAMP_SALT))), 1, 8
    )
    thr_int = F.least(
        F.floor(F.col("quality_score") * F.lit(_WSAMP_SCALE)).cast("bigint"),
        F.lit(4294967295),
    )
    thr_hex = F.format_string("%08x", thr_int)
    return (
        q.select("doc_id", "lang", "quality_score", u_hex.alias("u_hex"))
        .where(F.col("u_hex") < thr_hex)
        .select("doc_id", "lang", "quality_score")
    )


def oracle_corpus_weighted_sample() -> str:
    from ecommerce_dbt_medallion_spark.ops.text import oracle_text_quality_score

    return f"""
with q as ({oracle_text_quality_score()})
select doc_id, lang, quality_score
from q
where substring(md5(cast(doc_id as varchar) || '{WSAMP_SALT}'), 1, 8)
      < printf('%08x', least(cast(floor(quality_score * {_WSAMP_SCALE}) as bigint),
                             4294967295))
"""
