"""Word co-occurrence collocation mining over the ``documents`` corpus
— the phrase/topic-signal extraction step of an LLM data pipeline
(collocation tables feed tokenizer pre-segmentation, quality heuristics
and topic labeling). Reference scope: the LLM-data-pipeline mandate; no
reference-file counterpart — engine depth beyond it.

``word_cooccurrence_lift`` ranks word PAIRS by document-level lift

    lift(a, b) = P(a, b) / (P(a) · P(b))
               = pair_docs · n_docs / (df_a · df_b)

over the top-COOC_V document-frequency vocabulary, keeping the
COOC_TOPK highest-lift pairs with at least COOC_MIN_PAIR_DOCS
co-occurrences.

Scale shape (100 TB):
- ONE corpus-scale explode → distinct (doc_id, word) pass; document
  frequencies are a map-side-combinable agg over it.
- the vocabulary cut is a TakeOrdered (top-V), broadcast back — the
  pair join never sees out-of-vocabulary words, so per-document pair
  fan-out is bounded by min(doc_distinct_words, V)² regardless of
  corpus size (the standard support-pruning trick of market-basket
  mining; copurchase_topk uses the same shape on orders).
- the pair enumeration is a self-equi-join on doc_id — both sides hash
  to the same partitioning, one co-located shuffle pair, never a
  cartesian.
- pair counts and the lift ranking run at (≤ V²/2)-row scale.

Determinism / oracle notes: every count is an exact bigint; lift is ONE
IEEE division of two exactly-representable products (each < 2^53
through sf1 and far beyond); ties at the vocabulary and top-K
boundaries break on the words under binary collation, which both
engines compare bytewise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

COOC_V = 64  # vocabulary bound: top-V words by document frequency
COOC_TOPK = 50  # reported pairs
COOC_MIN_PAIR_DOCS = 2  # support floor


def _doc_word_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
            ).alias("word"),
        )
        .distinct()
    )


def word_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-COOC_TOPK word pairs by document-level lift over the
    top-COOC_V df vocabulary (support ≥ COOC_MIN_PAIR_DOCS)."""
    # one materialized distinct pass, reused by the df count and BOTH
    # self-join sides — without the checkpoint the plan recomputes the
    # corpus-scale explode+distinct three times (the dedup family's
    # checkpointed-shingles discipline)
    dw = _doc_word_distinct(spark, sf_dir).localCheckpoint(eager=True)
    dfreq = dw.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.desc("df"), F.asc("word")).limit(COOC_V)
    dv = dw.join(F.broadcast(vocab), "word").select("doc_id", "word", "df")
    a = dv.select(
        "doc_id", F.col("word").alias("w1"), F.col("df").alias("df1")
    )
    b = dv.select(
        "doc_id", F.col("word").alias("w2"), F.col("df").alias("df2")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .where(F.col("pair_docs") >= COOC_MIN_PAIR_DOCS)
    )
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    lift = F.col("pair_docs").cast("double") * F.col("n_docs").cast(
        "double"
    ) / (F.col("df1") * F.col("df2")).cast("double")
    top = (
        pairs.crossJoin(F.broadcast(n_docs))
        .withColumn("lift", lift)
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(COOC_TOPK)
    )
    w = Window.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    return top.select(
        "w1",
        "w2",
        F.col("pair_docs").cast("long").alias("pair_docs"),
        F.col("df1").cast("long").alias("df1"),
        F.col("df2").cast("long").alias("df2"),
        "lift",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def oracle_word_cooccurrence_lift() -> str:
    return f"""
with dw as (
    select distinct doc_id, word from (
        select doc_id,
            unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as word
        from documents
    )
), dfreq as (
    select word, cast(count(*) as bigint) as df from dw group by word
), vocab as (
    select word, df from dfreq order by df desc, word asc limit {COOC_V}
), dv as (
    select dw.doc_id, dw.word, v.df from dw join vocab v using (word)
), pairs as (
    select a.word as w1, b.word as w2, a.df as df1, b.df as df2,
        cast(count(*) as bigint) as pair_docs
    from dv a join dv b on a.doc_id = b.doc_id and a.word < b.word
    group by 1, 2, 3, 4
    having count(*) >= {COOC_MIN_PAIR_DOCS}
), total as (
    select cast(count(*) as bigint) as n_docs from documents
)
select w1, w2, pair_docs, df1, df2, lift,
    cast(row_number() over (order by lift desc, w1 asc, w2 asc) as bigint)
        as rank
from (
    select w1, w2, pair_docs, df1, df2,
        cast(pair_docs as double) * cast(n_docs as double)
            / cast(df1 * df2 as double) as lift
    from pairs cross join total
    order by lift desc, w1 asc, w2 asc
    limit {COOC_TOPK}
)
"""
