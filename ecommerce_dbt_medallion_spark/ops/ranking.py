"""Corpus term-importance scoring (TF-IDF family).

Per-document top terms by tf×idf — the feature-extraction step of a
retrieval / quality-filter pipeline. The idf here is the RAW ratio
N/df (no logarithm): the score is then ``cast(tf * N as bigint-exact)
/ df`` — a single floating-point division from exact integers, which
Spark and DuckDB compute bit-identically (the log variant differs at
ULP level between libm implementations and would break the value
oracle). Ranking by tf·N/df orders identically to tf/df per document
(N is constant), and ties break on the term string.

Plan shape (scales linearly):
- one shuffle to (doc_id, term) grain (map-side partial counts absorb
  hot terms),
- one tiny shuffle to term grain for document frequency,
- a term-keyed join to attach df (AQE skew-splits stopword-grade hot
  terms; at 100 TB a df table pruned to the top-k candidate terms is
  broadcastable),
- the per-document rank window partitions on doc_id — millions of
  balanced partitions, terms-per-doc bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

TFIDF_TOP_TERMS = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TFIDF_TOP_TERMS terms per document by tf × (N/df)."""
    docs = load_table(spark, sf_dir, "documents")
    term_counts = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    doc_freq = term_counts.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = F.broadcast(docs.agg(F.count("*").alias("n_docs")))

    scored = (
        term_counts.join(doc_freq, "term")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("term_rank", F.row_number().over(w).cast("long")).where(
        F.col("term_rank") <= TFIDF_TOP_TERMS
    )


def oracle_tfidf_top_terms() -> str:
    return f"""
with toks as (
    select doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as term
    from documents
),
tc as (select doc_id, term, count(*) as tf from toks group by doc_id, term),
dfc as (select term, count(*) as df from tc group by term),
n as (select count(*) as n_docs from documents)
select doc_id, term, tf, df, score, term_rank from (
    select tc.doc_id, tc.term, tc.tf, dfc.df,
        cast(tc.tf * n.n_docs as double) / dfc.df as score,
        cast(row_number() over (
            partition by tc.doc_id
            order by cast(tc.tf * n.n_docs as double) / dfc.df desc, tc.term
        ) as bigint) as term_rank
    from tc join dfc using (term) cross join n
) where term_rank <= {TFIDF_TOP_TERMS}
"""
