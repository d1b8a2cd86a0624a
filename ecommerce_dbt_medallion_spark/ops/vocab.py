"""Vocabulary induction + out-of-vocabulary analysis — the tokenizer-
training stage of an LLM pipeline (fix a top-K word vocabulary from
corpus frequencies, then measure per-document OOV rates to spot corpus
slices the tokenizer would fragment).

Scale notes (100 TB):
- ``vocab_top_words``: explode → word-grain count (one shuffle with
  map-side partial agg; word cardinality ≪ token count) → global top-K
  via orderBy+limit, which Spark executes as TakeOrderedAndProject
  (per-partition heaps merged on the driver — K rows, never a global
  sort).
- ``doc_oov_rate``: the vocab (K rows) is broadcast; the corpus token
  stream is tagged map-side, aggregated per doc (one doc_id shuffle).
  Zero-token docs survive via the left join from the base scan.

Determinism: ties in the frequency ranking break on the word itself;
both engines compute identical counts, so the induced vocabulary is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

VOCAB_K = 16


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
        ).alias("word"),
    )


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _doc_words(spark, sf_dir).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(VOCAB_K)


def vocab_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The induced vocabulary: top-VOCAB_K words by corpus frequency
    with rank and corpus-share."""
    vocab = _vocab(spark, sf_dir)
    w_total = _doc_words(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_total"))
    # the rank window runs over the K-row vocab, not the corpus
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    return (
        vocab.crossJoin(F.broadcast(w_total))
        .select(
            "word",
            F.col("cnt").cast("long").alias("cnt"),
            F.row_number().over(w).cast("long").alias("rank"),
            F.round(F.col("cnt") / F.col("n_total").cast("double"), 6).alias(
                "corpus_share"
            ),
        )
    )


def oracle_vocab_top_words() -> str:
    return f"""
with w as (
    select unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as word
    from documents
), counts as (
    select word, count(*) as cnt from w group by word
), total as (
    select count(*) as n_total from w
)
select word, cnt, rank, round(cnt / cast(n_total as double), 6) as corpus_share
from (
    select word, cast(cnt as bigint) as cnt,
        cast(row_number() over (order by cnt desc, word) as bigint) as rank
    from counts
) cross join total
where rank <= {VOCAB_K}
"""


def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV stats against the induced top-K vocabulary."""
    words = _doc_words(spark, sf_dir)
    vocab = F.broadcast(
        _vocab(spark, sf_dir).select("word", F.lit(1).alias("__in_vocab"))
    )
    tagged = words.join(vocab, "word", "left")
    per_doc = tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.countDistinct(
            F.when(F.col("__in_vocab").isNull(), F.col("word"))
        ).alias("distinct_oov"),
    )
    base = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
        F.coalesce(F.col("distinct_oov"), F.lit(0)).cast("long").alias("distinct_oov"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_oov").cast("double") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("oov_rate"),
    )


def oracle_doc_oov_rate() -> str:
    return f"""
with w as (
    select doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as word
    from documents
), counts as (
    select word, count(*) as cnt from w group by word
), vocab as (
    select word as vword from (
        select word, row_number() over (order by cnt desc, word) as rank
        from counts
    ) where rank <= {VOCAB_K}
), per_doc as (
    select w.doc_id,
        count(*) as n_tokens,
        sum(case when v.vword is null then 1 else 0 end) as n_oov,
        count(distinct case when v.vword is null then w.word end) as distinct_oov
    from w left join vocab v on w.word = v.vword
    group by w.doc_id
)
select d.doc_id, d.lang,
    cast(coalesce(p.n_tokens, 0) as bigint) as n_tokens,
    cast(coalesce(p.n_oov, 0) as bigint) as n_oov,
    cast(coalesce(p.distinct_oov, 0) as bigint) as distinct_oov,
    round(case when p.n_tokens > 0
               then cast(p.n_oov as double) / p.n_tokens
               else cast(0.0 as double) end, 6) as oov_rate
from documents d left join per_doc p on d.doc_id = p.doc_id
"""


COVERAGE_K = 100


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for word ranks 1..COVERAGE_K, the
    cumulative share of the corpus token stream covered by the top-r
    words — the tokenizer-sizing curve (how big must the vocab be to
    cover X% of tokens). The knee of this curve is what decides K.

    Scale shape: word-grain counts are the same single partial-agg
    shuffle as vocab_top_words; the top-COVERAGE_K cut is
    TakeOrderedAndProject (per-partition heaps, never a global sort);
    the cumulative window runs over the K retained rows only. Coverage
    is exact bigints, one double division per output row.
    """
    counts = _doc_words(spark, sf_dir).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(COVERAGE_K)
    total = _doc_words(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_total"))
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "word",
            F.col("cnt").cast("long").alias("cnt"),
            F.sum("cnt")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_cnt"),
            "n_total",
        )
        .select(
            "rank",
            "word",
            "cnt",
            "cum_cnt",
            (F.col("cum_cnt").cast("double") / F.col("n_total").cast("double")).alias(
                "coverage"
            ),
        )
    )


def oracle_vocab_coverage() -> str:
    return f"""
with w as (
    select unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as word
    from documents
), counts as (
    select word, count(*) as cnt from w group by word
), total as (
    select count(*) as n_total from w
), ranked as (
    select word, cast(cnt as bigint) as cnt,
        cast(row_number() over (order by cnt desc, word) as bigint) as rank,
        cast(sum(cnt) over (order by cnt desc, word
            rows between unbounded preceding and current row) as bigint) as cum_cnt
    from counts
)
select rank, word, cnt, cum_cnt,
    cast(cum_cnt as double) / cast(n_total as double) as coverage
from ranked cross join total
where rank <= {COVERAGE_K}
"""
