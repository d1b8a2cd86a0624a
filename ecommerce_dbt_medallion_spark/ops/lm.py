"""N-gram language-model operators — the statistical-LM side of a
training-data pipeline: estimate a bigram model from the corpus, then
score every document under it (low-probability docs ≈ noisy/outlier
text, the classic cheap quality filter before expensive model-based
filtering).

Cross-engine float discipline:
- conditional probabilities are ONE exact-integer division
  (pair count / prefix count), engine-bit-identical;
- the per-document mean probability is an ORDERED left fold over the
  document's bigram sequence (Spark ``F.aggregate`` vs DuckDB
  ``list_aggregate(list(p ORDER BY pos), 'sum')``) — the fold-order
  trick verified bit-identical in round 1 (ops/similarity.py dot
  products). A groupBy sum of doubles would NOT hash-match.

Scale shape: tokenization+bigram explode is linear; model estimation is
two count shuffles (pair grain, then prefix grain); scoring joins the
doc bigram stream to the model at (w1, w2) — AQE skew-splits
stopword-pair hot keys; the per-doc fold state is bounded by document
length (docs are bounded; the collect_list is per doc, never per corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, w1, w2) — ordered bigram stream per document."""
    docs = load_table(spark, sf_dir, "documents")
    # NB: the pattern goes through F.lit, NOT an F.expr SQL string —
    # Spark SQL string literals eat the backslash in '\w+'
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)).alias(
            "t"
        ),
    )
    return (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(t[i-1] as w1, t[i] as w2))"
                )
            ).alias("pos", "bg"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "bg.w1", "bg.w2")
    )


def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE bigram model: p(w2|w1) = n(w1,w2) / n(w1,·)."""
    bi = _doc_bigrams(spark, sf_dir)
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    pc = bc.groupBy("w1").agg(F.sum("n_pair").alias("n_prefix"))
    return bc.join(pc, "w1").select(
        "w1",
        "w2",
        "n_pair",
        "n_prefix",
        (F.col("n_pair").cast("double") / F.col("n_prefix")).alias("prob"),
    )


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram probability per document under the corpus model
    (ordered-fold sum → one division; bit-identical across engines)."""
    bi = _doc_bigrams(spark, sf_dir).localCheckpoint(eager=False)
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    pc = bc.groupBy("w1").agg(F.sum("n_pair").alias("n_prefix"))
    lm = bc.join(pc, "w1").select(
        "w1",
        "w2",
        (F.col("n_pair").cast("double") / F.col("n_prefix")).alias("prob"),
    )
    joined = bi.join(lm, ["w1", "w2"])
    per_doc = (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "prob"))),
                    lambda s: s.prob,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("prob_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("prob_sum") / F.col("n_bigrams")).alias("lm_score"),
        )
    )
    return per_doc


_ORACLE_BIGRAM_BASE = f"""
with toks as (
    select doc_id, regexp_extract_all(lower(text), '{WORD_RE}') as t
    from documents
),
pos as (
    select doc_id, t, unnest(range(1, len(t))) as i
    from toks where len(t) >= 2
),
bi as (
    select doc_id, cast(i - 1 as bigint) as pos,
        t[cast(i as int)] as w1, t[cast(i as int) + 1] as w2
    from pos
),
bc as (select w1, w2, count(*) as n_pair from bi group by 1, 2),
pc as (select w1, cast(sum(n_pair) as bigint) as n_prefix from bc group by 1)
"""


def oracle_bigram_lm() -> str:
    return (
        _ORACLE_BIGRAM_BASE
        + """
select bc.w1, bc.w2, bc.n_pair, pc.n_prefix,
    cast(bc.n_pair as double) / pc.n_prefix as prob
from bc join pc using (w1)
"""
    )


def oracle_doc_lm_score() -> str:
    return (
        _ORACLE_BIGRAM_BASE
        + """,
lm as (
    select bc.w1, bc.w2, cast(bc.n_pair as double) / pc.n_prefix as prob
    from bc join pc using (w1)
),
joined as (
    select b.doc_id, b.pos, lm.prob
    from bi b join lm on lm.w1 = b.w1 and lm.w2 = b.w2
)
select doc_id, count(*) as n_bigrams,
    list_aggregate(list(prob order by pos), 'sum') / count(*) as lm_score
from joined
group by doc_id
"""
    )
