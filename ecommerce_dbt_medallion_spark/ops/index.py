"""Inverted index builder (term -> document posting list) — the
retrieval-side artifact of a training-data / search pipeline.

Postings are emitted as a comma-joined STRING, not an array column: the
driver's canonicalizer sorts result columns with pandas and cannot hash
python lists (round-1 `multimodal_extract` lesson), and a string is
just as diff-able.

Scale design — the stopword problem: at corpus scale a hot term's
posting list is unbounded, and an unconditional ``collect_list`` would
accumulate billions of ids in one aggregation state. The index
therefore computes document frequency FIRST (count-only shuffle, no
list state, map-side combined), and materializes postings ONLY for
terms with df <= POSTINGS_DF_CAP — a production index blocks or
tier-compresses hotter terms anyway. Hot terms keep their df with NULL
postings. Both the cap filter and the in-list sort are deterministic,
so the output is engine-exact. The per-term sort runs on bounded
(<= cap) arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

POSTINGS_DF_CAP = 1000


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, postings) with postings = comma-joined sorted doc_ids
    for terms with df <= POSTINGS_DF_CAP, NULL for hotter terms."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
            ).alias("term"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # reused by the df pass and the postings pass
    )
    df_tbl = toks.groupBy("term").agg(F.count("*").alias("df"))
    small_terms = df_tbl.where(F.col("df") <= POSTINGS_DF_CAP).select("term")
    postings = (
        toks.join(small_terms, "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return df_tbl.join(postings, "term", "left").select("term", "df", "postings")


def oracle_inverted_index() -> str:
    return f"""
with raw as (
    select doc_id,
        unnest(regexp_extract_all(lower(text), '{WORD_RE}')) as term
    from documents
),
toks as (select distinct doc_id, term from raw),
dfreq as (select term, count(*) as df from toks group by term),
p as (
    select t.term,
        string_agg(cast(t.doc_id as varchar), ',' order by t.doc_id) as postings
    from toks t
    join dfreq d on d.term = t.term and d.df <= {POSTINGS_DF_CAP}
    group by t.term
)
select d.term, d.df, p.postings
from dfreq d left join p using (term)
"""
