"""Exact duplicated-substring detection over ``documents``
(SURVEY.md §2 #35c) — the span-level complement to document-level dedup.

Document-grain dedup (exact / minhash / simhash) misses the dominant
contamination mode in web-scale corpora: long VERBATIM spans (boiler-
plate, licenses, quoted articles) embedded in otherwise-distinct
documents. The reference treatment (suffix arrays, Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") is a
shared-memory construction that does not distribute; the scalable
equivalent is fixed-length window fingerprinting: a span of length
>= 2·SUB_L - 1 duplicated across two documents is ALWAYS caught by at
least one aligned SUB_L-window pair, and the per-document duplicated-
window ratio is the paper's "duplicated fraction of the corpus" metric.

Per document: how many of its SUB_L-char windows (stride 1) also occur
in at least one OTHER document. Windows are keyed by md5 of the raw
substring — exact match, engine-portable, collision odds ~n²/2^128.

Plan shape (all linear in corpus characters):
- window explode is NARROW: the md5 array is built per-row with one
  transform() (the text attribute is row-local — no CSE re-evaluation
  pitfall), then exploded to (doc_id, h) without carrying the text;
- one shuffle to (doc_id, h) grain (map-side combine absorbs intra-doc
  repeats), one tiny reduce to h grain for the document frequency;
- the df>=2 filter drops ~everything BEFORE the join back (measured
  ~4% of hashes at sf0.01), so the join input is the duplicated tail
  only; AQE skew-splits boilerplate-grade hot hashes;
- per-doc rollup + a broadcast-friendly left join against doc lengths.

100 TB dials (documented, not silently applied): window stride S>1
detects spans >= 2·(SUB_L+S)-ish with 1/S the explode volume, and
hash-mod sampling (keep h where h % p = 0) estimates the ratio with
1/p volume — both standard for corpus-scale runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.sources.registry import load_table

SUB_L = 40  # window length (chars); catches duplicated spans >= 79 chars


def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#35c: per-doc duplicated-window stats (cross-document exact spans)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= SUB_L)
        .select("doc_id", "text", (F.length("text") - SUB_L + 1).alias("n_windows"))
        # a single small parquet file arrives as ONE scan partition; the
        # md5-per-window explode is the CPU hot spot, so spread it first
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.col("n_windows")),
        lambda i: F.md5(F.col("text").substr(i, F.lit(SUB_L))),
    )
    w = docs.select("doc_id", F.explode(hashes).alias("h"))
    per = w.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("c"))
    hd = per.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    dup = (
        per.join(hd.where(F.col("df") >= 2), "h")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("dup_windows"), F.count(F.lit(1)).alias("dup_hashes"))
    )
    return (
        docs.select("doc_id", "n_windows")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_windows").cast("long").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
            F.coalesce("dup_hashes", F.lit(0)).cast("long").alias("dup_hashes"),
            F.round(
                F.coalesce("dup_windows", F.lit(0)).cast("double")
                / F.col("n_windows"),
                6,
            ).alias("dup_ratio_r6"),
        )
        .orderBy("doc_id")
    )


def oracle_exact_substring_dedup() -> str:
    return f"""
with d as (
    select doc_id, text, len(text) - {SUB_L} + 1 as n_windows
    from documents where len(text) >= {SUB_L}
),
w as (
    select doc_id, unnest(list_transform(range(1, n_windows + 1),
        i -> md5(substr(text, i, {SUB_L})))) as h
    from d
),
per as (select doc_id, h, count(*) as c from w group by doc_id, h),
hd as (select h, count(*) as df from per group by h),
dup as (
    select doc_id, sum(c) as dup_windows, count(*) as dup_hashes
    from per join (select h from hd where df >= 2) using (h)
    group by doc_id
)
select d.doc_id,
    cast(d.n_windows as bigint) as n_windows,
    cast(coalesce(dup.dup_windows, 0) as bigint) as dup_windows,
    cast(coalesce(dup.dup_hashes, 0) as bigint) as dup_hashes,
    round(cast(coalesce(dup.dup_windows, 0) as double) / d.n_windows, 6)
        as dup_ratio_r6
from d left join dup using (doc_id)
order by doc_id
"""
