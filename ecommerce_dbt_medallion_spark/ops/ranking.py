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


# ------------------------------------------------------------ BM25
#
# Okapi BM25 retrieval scoring against a fixed query-term set — the
# ranking half of a retrieval pipeline (tfidf_top_terms is the feature
# half). Two deliberate portability choices:
# - RAW-ratio idf (N - df + 0.5) / (df + 0.5), no logarithm: libm log
#   differs at ULP level between engines (measured for the HLL ln
#   tables, ops/sketch.py), while +,-,*,/ are exactly rounded IEEE ops
#   that match bit-for-bit when the expression tree matches. Ranking is
#   order-equivalent to log-idf for df < N (both strictly decrease in
#   df).
# - the per-document score sums its ≤|Q| term contributions in an
#   ORDERED fold (list sorted by term), not F.sum: fp addition is
#   non-associative and groupBy sum order is partition-dependent.
#
# Scale shape: token explode → (doc, term) partial counts is the only
# corpus-grain shuffle (shared with dl); df is |Q| rows, broadcast; the
# scoring join only carries docs that contain ≥1 query term; final
# top-k is a TakeOrderedAndProject, no global sort.

BM25_QUERY_TERMS = ("hash", "merge", "scan", "table")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 25


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#35b: BM25 top-k documents for the fixed query-term set."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf = (
        toks.where(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = F.broadcast(tf.groupBy("term").agg(F.count("*").alias("df")))
    stats = F.broadcast(
        dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens"))
    )

    # exact-integer inputs -> one carefully parenthesized double tree,
    # mirrored token-for-token in the oracle
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    idf = (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tfd = F.col("tf").cast("double")
    tfc = (tfd * F.lit(BM25_K1 + 1.0)) / (
        tfd
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl))
    )
    per_term = (
        tf.join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(stats)
        .select("doc_id", "term", "dl", (idf * tfc).alias("s"))
    )
    scored = (
        per_term.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                F.lit(0.0),
                lambda a, p: a + p["s"],
            ).alias("score"),
            F.count("*").alias("n_terms"),
            F.first("dl").alias("dl"),
        )
    )
    # orderBy().limit() compiles to TakeOrderedAndProject (per-partition
    # heap + K-row driver merge, no global sort); the rank window then
    # runs over the K-row result only
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOPK)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "n_terms",
        "dl",
        F.round("score", 6).alias("score_r6"),
    )


def oracle_bm25_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""
with toks as (
    select doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as term
    from documents
),
dl as (select doc_id, count(*) as dl from toks group by doc_id),
tf as (
    select doc_id, term, count(*) as tf from toks
    where term in ({terms}) group by doc_id, term
),
dfreq as (select term, count(*) as df from tf group by term),
stats as (select count(*) as n_docs, sum(dl) as total_tokens from dl),
per_term as (
    select tf.doc_id, tf.term, dl.dl,
        ((cast(n_docs as double) - cast(df as double) + 0.5)
            / (cast(df as double) + 0.5))
        * ((cast(tf as double) * {BM25_K1 + 1.0!r})
            / (cast(tf as double) + {BM25_K1!r}
               * ({1.0 - BM25_B!r} + {BM25_B!r}
                  * (cast(dl.dl as double)
                     / (cast(total_tokens as double) / cast(n_docs as double))))))
        as s
    from tf join dl using (doc_id) join dfreq using (term) cross join stats
),
scored as (
    select doc_id,
        list_aggregate(list(s order by term), 'sum') as score,
        count(*) as n_terms,
        first(dl order by term) as dl
    from per_term group by doc_id
)
select rank, doc_id, n_terms, dl, score_r6 from (
    select cast(row_number() over (order by score desc, doc_id) as bigint) as rank,
        doc_id, n_terms, dl, round(score, 6) as score_r6
    from scored
) where rank <= {BM25_TOPK}
"""


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
