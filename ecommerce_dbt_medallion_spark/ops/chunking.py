"""Document chunking and sequence packing — the tokenize→window→pack
stages that turn a cleaned corpus into fixed-budget training sequences.

Reference analogue: none in the reference repo (mart scope); these are
the build brief's training-data-pipeline surface over ``documents``.

Scale notes (100 TB):
- ``doc_chunking`` is a per-row explode of a computed starts array —
  narrow, no shuffle, output size ~ input tokens / stride. The chunk
  rows inherit the scan's partitioning; no skew (chunk count is bounded
  by doc length).
- ``pack_sequences`` assigns each doc to a token-budget bin with a
  running-sum window per *shard* (doc_id % N_SHARDS). Shards bound the
  window's partition size: at 100 TB you raise N_SHARDS so each shard's
  cumulative-sum window stays executor-sized; packing quality is
  unaffected (bins never span shards by design). One shuffle on shard,
  one on (shard, bin).

Determinism: tokenization is the shared WORD_RE regex; shard and order
are pure functions of doc_id, so both engines produce identical bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

CHUNK_TOKENS = 32   # tokens per chunk
CHUNK_STRIDE = 24   # overlap = CHUNK_TOKENS - CHUNK_STRIDE

PACK_BUDGET = 2048  # tokens per packed sequence bin
N_SHARDS = 8        # parallel packing streams; raise with cluster size


def _docs_with_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").withColumn(
        "__words",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)),
    )


# ------------------------------------------------------------- chunking

def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token windows per document.

    Chunks start every CHUNK_STRIDE tokens and take CHUNK_TOKENS tokens
    (the final chunk may be shorter; empty docs yield no chunks).
    """
    docs = _docs_with_words(spark, sf_dir)
    n = F.size("__words")
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    chunked = docs.select(
        "doc_id",
        "lang",
        "__words",
        F.explode(starts).alias("chunk_start"),
    )
    chunk = F.slice(F.col("__words"), F.col("chunk_start") + 1, CHUNK_TOKENS)
    text = F.concat_ws(" ", chunk)
    return chunked.select(
        "doc_id",
        "lang",
        (F.col("chunk_start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(text).alias("chunk_hash"),
    )


def oracle_doc_chunking() -> str:
    return f"""
with w as (
    select doc_id, lang, regexp_extract_all(lower(text), '{WORD_RE}') as ws
    from documents
), starts as (
    select doc_id, lang, ws, unnest(range(0, len(ws), {CHUNK_STRIDE})) as chunk_start
    from w where len(ws) > 0
)
select doc_id, lang,
    cast(chunk_start / {CHUNK_STRIDE} as bigint) as chunk_id,
    cast(chunk_start as bigint) as chunk_start,
    cast(len(list_slice(ws, chunk_start + 1, chunk_start + {CHUNK_TOKENS})) as bigint)
        as n_chunk_tokens,
    md5(array_to_string(list_slice(ws, chunk_start + 1, chunk_start + {CHUNK_TOKENS}), ' '))
        as chunk_hash
from starts
"""


# -------------------------------------------------------------- packing

def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill sequence packing: docs stream in doc_id order
    within their shard and land in the PACK_BUDGET-token bin their
    running-sum start offset falls into.

    Output is one row per (shard, bin) with doc/token counts and the
    doc_id span — the manifest a training loader would read.
    """
    docs = _docs_with_words(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size("__words").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = docs.withColumn("__cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(float(PACK_BUDGET))),
    )
    return (
        binned.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("bin_id").cast("long").alias("bin_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            "first_doc_id",
            "last_doc_id",
            F.round(F.col("total_tokens") / F.lit(float(PACK_BUDGET)), 4).alias(
                "fill_ratio"
            ),
        )
    )


def oracle_pack_sequences() -> str:
    return f"""
with toks as (
    select doc_id,
        doc_id % {N_SHARDS} as shard,
        len(regexp_extract_all(lower(text), '{WORD_RE}')) as n_tokens
    from documents
), binned as (
    select doc_id, shard, n_tokens,
        cast(floor((sum(n_tokens) over (
                partition by shard order by doc_id
                rows between unbounded preceding and current row
            ) - n_tokens) / cast({PACK_BUDGET} as double)) as bigint) as bin_id
    from toks
)
select
    cast(shard as bigint) as shard,
    bin_id,
    cast(count(*) as bigint) as n_docs,
    cast(sum(n_tokens) as bigint) as total_tokens,
    min(doc_id) as first_doc_id,
    max(doc_id) as last_doc_id,
    round(cast(sum(n_tokens) as bigint) / cast({PACK_BUDGET} as double), 4) as fill_ratio
from binned
group by shard, bin_id
"""
