"""Hashed-n-gram linear quality classifier over ``documents`` — the
model-based quality-filter stage of an LLM data pipeline (fastText-style
linear inference via the hashing trick), the rung of the curation ladder
above the heuristic ``text_quality_score`` and the statistical
``doc_lm_score``. Reference scope: the LLM-data-pipeline mandate; no
reference-file counterpart — engine depth beyond it.

Model: features are word unigrams + bigrams hashed into a fixed
256-bucket space (md5 2-hex-prefix — the repo's engine-portable hash
family); the weight vector is a fixed (pretend-trained) integer table in
centi-units derived from a seed lexicon of clean-prose vs junk/spam
grams, so collisions behave exactly like production feature hashing.
The score is the classic linear margin

    margin = intercept + weight_sum / (n_grams · SCALE)

with ``weight_sum`` an exact bigint fold — inference is SQL-native model
scoring fused into the corpus scan, the same design as
``churn_risk_score`` (models/gold.py) on the mart side.

Scale shape (100 TB): ONE projection — tokenize, hash, fold the literal
weight map, divide. Zero shuffle, zero Python, whole-stage codegen; the
weight table rides in the expression (a create_map literal), never a
join. At production vocabulary sizes the map literal grows with the
BUCKET count (fixed), not the lexicon or the corpus.

Determinism / oracle notes: bucket ids are md5 hex strings (no hex→int
conversion); weight sums are exact integers (commutative — fold order
free); the margin is ONE IEEE division plus one addition written
identically in both engines. The DuckDB oracle scores by explode + join
against the same generated bucket-weight VALUES table — value-identical
because the integer sums agree exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.text import WORD_RE
from ecommerce_dbt_medallion_spark.sources.registry import load_table

CLS_SALT = "#cls1"
CLS_SCALE = 100  # weights are integer centi-units
CLS_INTERCEPT = 0.002

# Seed lexicon (pretend-trained): positive weights = clean-prose signal
# grams, negative = junk/spam signal grams. Centi-unit integers.
CLS_LEXICON: dict[str, int] = {
    "the": 10,
    "a": 5,
    "and": 25,
    "of": 20,
    "is": 20,
    "table": 40,
    "query": 30,
    "data": 30,
    "join": 20,
    "the table": 15,
    "the line": 10,
    "slow": -40,
    "junk": -60,
    "spam": -80,
    "click": -50,
    "buy": -40,
    "free": -50,
    "xxx": -90,
    "zzz": -90,
    "a a": -25,
    "slow slow": -50,
    "big big": -30,
}


def cls_bucket_weights() -> dict[str, int]:
    """Lexicon folded into the hashed bucket space: bucket (2-hex md5
    prefix) → summed integer weight. Deterministic; shared verbatim by
    the Spark literal map and the oracle VALUES table."""
    bw: dict[str, int] = {}
    for gram, w in CLS_LEXICON.items():
        b = hashlib.md5((gram + CLS_SALT).encode()).hexdigest()[:2]
        bw[b] = bw.get(b, 0) + w
    return dict(sorted(bw.items()))


def _gram_bucket(g: Column) -> Column:
    return F.substring(F.md5(F.concat(g, F.lit(CLS_SALT))), 1, 2)


def doc_quality_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#36a: hashed-n-gram linear quality classification per document.

    Unigrams + bigrams → 256 hash buckets → literal-map weight lookup →
    exact-integer margin numerator → one division + intercept → label.
    Pure projection (plan-pinned: no Exchange, no Python worker).
    """
    bw = cls_bucket_weights()
    wmap = F.create_map(
        *[c for k, v in bw.items() for c in (F.lit(k), F.lit(v))]
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)).alias(
            "__t"
        ),
    )
    bigrams = F.when(
        F.size("__t") >= 2,
        F.expr(
            "transform(sequence(1, size(__t) - 1), "
            "i -> concat(__t[i-1], ' ', __t[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(F.col("__t"), bigrams)
    weight_sum = F.aggregate(
        grams,
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.coalesce(F.element_at(wmap, _gram_bucket(g)), F.lit(0)).cast("long"),
    )
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(grams).cast("long").alias("n_grams"),
        weight_sum.alias("weight_sum"),
    )
    margin = F.lit(CLS_INTERCEPT) + F.col("weight_sum").cast("double") / (
        F.col("n_grams") * CLS_SCALE
    ).cast("double")
    return scored.select(
        "doc_id",
        "lang",
        "source",
        "n_grams",
        "weight_sum",
        F.when(F.col("n_grams") > 0, F.round(margin, 6)).alias("quality_margin_r6"),
        F.when(F.col("n_grams") == 0, F.lit("empty"))
        .when(margin > 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("quality_label"),
    )


# ----------------------------------------- calibration (round-14 queue)

CAL_BUCKETS = 64
CAL_DECILES = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


def junk_unigrams() -> list[str]:
    """The planted-junk reference label's vocabulary: the LEXICON's
    negative-weight unigrams (the generator's word pool includes them,
    so their presence is the planted ground-truth signal). Shared
    verbatim by the Spark literal array and the oracle list."""
    return sorted(g for g, w in CLS_LEXICON.items() if w < 0 and " " not in g)


def doc_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built round 13 (VERDICT r12 #4b), registered at the round-14
    window head (VERDICT r13 #1):
    the classifier-calibration report for ``doc_quality_classify`` —
    margin deciles vs the planted junk label, the operating-point sweep
    a deployment reads before picking a filter threshold (which decile
    of the margin actually separates planted junk from clean prose, and
    what keep-share each operating point implies).

    Reference label: ``planted_junk`` = the doc's token stream contains
    at least one negative-lexicon unigram (:func:`junk_unigrams`) — a
    label INDEPENDENT of the hashing trick, so bucket collisions and
    the bigram features are what the calibration measures.

    Scale shape (100 TB): ONE corpus projection computes margin AND the
    planted flag (no doc-grain join-back); decile boundaries come from
    the shared equi-width-histogram estimator (ops/sketch.py — never
    ntile's global sort); assignment is a 9-value broadcast array
    filter; the report grain is ≤10 rows.

    Determinism: deciles cut on the ROUNDED ``quality_margin_r6`` basis
    (the value the certified classifier key publishes); boundary
    arithmetic is the shared estimator, bit-identical by the
    lm_score_source_mix precedent; rates are ONE division each, rounded.
    """
    from ecommerce_dbt_medallion_spark.ops.sketch import hist_quantile_estimates

    bw = cls_bucket_weights()
    wmap = F.create_map(
        *[c for k, v in bw.items() for c in (F.lit(k), F.lit(v))]
    )
    # The local documents table is ONE parquet split, so the interpreted
    # HOF scoring fold below would run in a single task (the shingle_rows
    # lesson — measured 7.7 s for this 10-row report at sf0.1, 0.7 s
    # parallelized). CONDITIONAL repartition: only when the scan has
    # fewer splits than cores — at 100 TB the input is multi-split and
    # adding a corpus-wide token exchange would be a real regression, so
    # the scale plan stays the pure scan→aggregate shape
    # (doc_quality_classify, the plan-pinned pure projection, is left
    # untouched either way).
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0)).alias(
            "__t"
        ),
    )
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par, "doc_id")
    bigrams = F.when(
        F.size("__t") >= 2,
        F.expr(
            "transform(sequence(1, size(__t) - 1), "
            "i -> concat(__t[i-1], ' ', __t[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(F.col("__t"), bigrams)
    weight_sum = F.aggregate(
        grams,
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.coalesce(F.element_at(wmap, _gram_bucket(g)), F.lit(0)).cast("long"),
    )
    junk_arr = F.array(*[F.lit(t) for t in junk_unigrams()])
    raw_margin = (
        F.lit(CLS_INTERCEPT)
        + F.col("weight_sum").cast("double")
        / (F.col("n_grams") * CLS_SCALE).cast("double")
    )
    scored = (
        docs.select(
            "doc_id",
            F.size(grams).cast("long").alias("n_grams"),
            weight_sum.alias("weight_sum"),
            F.arrays_overlap("__t", junk_arr).alias("planted_junk"),
        )
        .where(F.col("n_grams") > 0)  # unscoreable docs have no margin
        # keep must be decided on the UNROUNDED margin — the certified
        # classifier's quality_label is `margin > 0` pre-rounding, and a
        # keep_share computed on the rounded basis would disagree with
        # the classifier's actual decisions at the rounding boundary.
        # Deciles still cut on the rounded published value.
        .select(
            F.round(raw_margin, 6).alias("m"),
            (raw_margin > 0).alias("keep"),
            "planted_junk",
        )
        .localCheckpoint(eager=False)
    )
    barr = F.broadcast(
        hist_quantile_estimates(
            scored.select(F.col("m").alias("x")), CAL_DECILES, CAL_BUCKETS
        ).agg(F.sort_array(F.collect_list("est")).alias("barr"))
    )
    assigned = scored.crossJoin(barr).select(
        F.size(F.filter(F.col("barr"), lambda bnd: F.col("m") > bnd))
        .cast("long")
        .alias("decile"),
        "m",
        "keep",
        "planted_junk",
    )
    g = assigned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("planted_junk"), 1).otherwise(0))
        .cast("long")
        .alias("n_planted"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("__keep"),
        F.min("m").alias("min_margin"),
        F.max("m").alias("max_margin"),
    )
    return g.select(
        "decile",
        "n_docs",
        "n_planted",
        F.round(
            F.col("n_planted").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("junk_rate_r6"),
        F.round(
            F.col("__keep").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("keep_share_r6"),
        "min_margin",
        "max_margin",
    )


def oracle_doc_quality_calibration() -> str:
    bw = cls_bucket_weights()
    vals = ", ".join(f"('{k}', {v})" for k, v in bw.items())
    junk = ", ".join(f"'{t}'" for t in junk_unigrams())
    b = CAL_BUCKETS
    ps = ", ".join(f"cast({p} as double)" for p in CAL_DECILES)
    raw_margin = (
        f"(cast({CLS_INTERCEPT} as double) "
        f"+ cast(coalesce(s.weight_sum, 0) as double) "
        f"/ cast(len(g.gs) * {CLS_SCALE} as double))"
    )
    margin = f"round({raw_margin}, 6)"
    return f"""
with t as (
    select doc_id, regexp_extract_all(lower(text), '{WORD_RE}') as t
    from documents
),
g as materialized (
    select doc_id, t,
        list_concat(t, case when len(t) >= 2
            then list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
            else cast([] as varchar[]) end) as gs
    from t
),
w(bucket, wt) as (select * from (values {vals}) v(bucket, wt)),
ex as (select doc_id, unnest(gs) as gm from g),
gw as (select doc_id, substr(md5(gm || '{CLS_SALT}'), 1, 2) as bucket from ex),
s as (
    select gw.doc_id, cast(sum(coalesce(w.wt, 0)) as bigint) as weight_sum
    from gw left join w using (bucket)
    group by 1
),
scored as materialized (
    select {margin} as m,
        {raw_margin} > 0 as keep,
        list_has_any(g.t, [{junk}]) as planted_junk
    from g left join s using (doc_id)
    where len(g.gs) > 0
),
rng as (select min(m) as lo, max(m) as hi, count(*) as n from scored),
hist as (
    select
        cast(case when r.hi = r.lo then 0
             else least({b} - 1, floor((sc.m - r.lo) / (r.hi - r.lo) * {b}))
        end as bigint) as bucket,
        r.lo, r.hi, r.n, count(*) as cnt
    from scored sc cross join rng r
    group by 1, 2, 3, 4
),
cum as (
    select *, sum(cnt) over (
        order by bucket rows between unbounded preceding and current row
    ) as cum
    from hist
),
ps as (select unnest([{ps}]) as p),
hits as (
    select p, bucket, lo, hi, n, cnt, cum,
        cast(ceil(p * n) as bigint) as target,
        row_number() over (partition by p order by bucket) as rn
    from cum cross join ps
    where cum >= ceil(p * n)
),
bounds as (
    select p,
        lo + (bucket + (target - (cum - cnt)) / cnt) * ((hi - lo) / {b}) as est
    from hits where rn = 1
),
barr as (select list(est order by est) as barr from bounds),
assigned as (
    select cast(len(list_filter(ba.barr, x -> sc.m > x)) as bigint) as decile,
        sc.m, sc.keep, sc.planted_junk
    from scored sc cross join barr ba
),
gg as (
    select decile,
        cast(count(*) as bigint) as n_docs,
        cast(sum(case when planted_junk then 1 else 0 end) as bigint)
            as n_planted,
        cast(sum(case when keep then 1 else 0 end) as bigint) as keepn,
        min(m) as min_margin,
        max(m) as max_margin
    from assigned
    group by 1
)
select decile, n_docs, n_planted,
    round(cast(n_planted as double) / cast(n_docs as double), 6)
        as junk_rate_r6,
    round(cast(keepn as double) / cast(n_docs as double), 6)
        as keep_share_r6,
    min_margin, max_margin
from gg
"""


def oracle_doc_quality_classify() -> str:
    bw = cls_bucket_weights()
    vals = ", ".join(f"('{k}', {v})" for k, v in bw.items())
    margin = (
        f"cast({CLS_INTERCEPT} as double) "
        f"+ cast(coalesce(s.weight_sum, 0) as double) "
        f"/ cast(len(gs) * {CLS_SCALE} as double)"
    )
    return f"""
with t as (
    select doc_id, lang, source,
        regexp_extract_all(lower(text), '{WORD_RE}') as t
    from documents
),
g as materialized (
    select doc_id, lang, source,
        list_concat(t, case when len(t) >= 2
            then list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
            else cast([] as varchar[]) end) as gs
    from t
),
w(bucket, wt) as (select * from (values {vals}) v(bucket, wt)),
ex as (select doc_id, unnest(gs) as g from g),
gw as (select doc_id, substr(md5(g || '{CLS_SALT}'), 1, 2) as bucket from ex),
s as (
    select gw.doc_id, cast(sum(coalesce(w.wt, 0)) as bigint) as weight_sum
    from gw left join w using (bucket)
    group by 1
)
select g.doc_id, g.lang, g.source,
    cast(len(gs) as bigint) as n_grams,
    cast(coalesce(s.weight_sum, 0) as bigint) as weight_sum,
    case when len(gs) > 0 then round({margin}, 6) end as quality_margin_r6,
    case when len(gs) = 0 then 'empty'
         when ({margin}) > 0 then 'keep'
         else 'drop' end as quality_label
from g left join s using (doc_id)
"""
