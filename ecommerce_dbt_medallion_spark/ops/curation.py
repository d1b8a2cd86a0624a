"""Corpus curation composition ops — the decision layer of a training-
data pipeline: disjoint dataset splits, quality-aware duplicate-cluster
canonicalization, and the end-to-end attrition funnel.

Reference analogue: none (the reference's scope is the medallion mart);
these extend the `documents`-table operator family mandated by the
build brief, composing the already-oracled primitives (quality score,
exact/near dedup, cluster labels, decontamination) into the shapes a
100 TB pretraining run actually consumes.

Scale notes:
- ``dataset_split`` / ``dataset_split_stats`` are pure hash filters /
  one small aggregation — scan-bound, zero shuffle (split) or one
  shuffle at (split, lang) grain (stats; cardinality ≈ dozens).
- ``dedup_keep_best`` rides on dedup_clusters' converged labels; the
  only new work is a broadcast-size join of cluster labels against the
  quality projection and a per-cluster window (partition = cluster_id,
  fan-in = cluster size — bounded by construction for near-dup cliques).
- ``curation_funnel`` is ONE pass over the flag table + a 6-bucket
  conditional aggregation (map-side partials, single row out), then a
  driver-free unpivot via ``stack``. No per-stage rescans: each stage's
  predicate is a cumulative AND over already-computed booleans.

Determinism: the split assignment reuses the md5-hex-prefix recipe from
ops.sampling (fixed-width lowercase hex compares lexicographically ==
numerically in both engines); keep-best ties break on doc_id; funnel
percentages are a single double division of exact bigint counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.graph import (
    dedup_clusters,
    oracle_dedup_clusters,
)
from ecommerce_dbt_medallion_spark.ops.sampling import _hex_threshold
from ecommerce_dbt_medallion_spark.ops.scrub import (
    BENCH_MOD,
    decontaminate,
    oracle_decontaminate,
)
from ecommerce_dbt_medallion_spark.ops.text import (
    corpus_curation,
    oracle_corpus_curation,
    oracle_text_quality_score,
    text_quality_score,
)
from ecommerce_dbt_medallion_spark.sources.registry import load_table

SPLIT_SALT = "#split1"
TRAIN_FRAC = 0.8
VAL_FRAC = 0.1  # val cut = TRAIN_FRAC + VAL_FRAC; remainder is test


def _split_bucket(col: Column) -> Column:
    return F.substring(
        F.md5(F.concat(col.cast("string"), F.lit(SPLIT_SALT))), 1, 8
    )


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#34m: deterministic disjoint train/val/test assignment.

    split = f(md5(doc_id)) alone — reproducible across runs, engines,
    and repartitionings; a pure projection (zero shuffle, scan-bound at
    100 TB). Distinct from sampling: every doc gets exactly one split.
    """
    t_train = F.lit(_hex_threshold(TRAIN_FRAC))
    t_val = F.lit(_hex_threshold(TRAIN_FRAC + VAL_FRAC))
    b = _split_bucket(F.col("doc_id"))
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.when(b < t_train, "train").when(b < t_val, "val").otherwise("test").alias(
            "split"
        ),
    )


def oracle_dataset_split() -> str:
    t_train = _hex_threshold(TRAIN_FRAC)
    t_val = _hex_threshold(TRAIN_FRAC + VAL_FRAC)
    return f"""
select doc_id, lang, source, cast(n_chars as bigint) as n_chars,
    case when substring(md5(cast(doc_id as varchar) || '{SPLIT_SALT}'), 1, 8) < '{t_train}'
         then 'train'
         when substring(md5(cast(doc_id as varchar) || '{SPLIT_SALT}'), 1, 8) < '{t_val}'
         then 'val'
         else 'test' end as split
from documents
"""


def dataset_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#34n: per-(split, lang) manifest stats — doc counts, char volume,
    and each cell's share of the corpus. The global-total window runs
    over the AGGREGATED frame (|splits|×|langs| rows), the bounded-
    window-after-aggregation pattern used by the gold marts."""
    agg = (
        dataset_split(spark, sf_dir)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    total = F.sum("docs").over(Window.partitionBy())
    return agg.select(
        "split",
        "lang",
        "docs",
        "total_chars",
        F.round(F.col("docs").cast("double") / total, 6).alias("doc_share"),
    )


def oracle_dataset_split_stats() -> str:
    return f"""
with s as ({oracle_dataset_split()})
select split, lang,
    cast(count(*) as bigint) as docs,
    cast(sum(n_chars) as bigint) as total_chars,
    round(cast(count(*) as double) / sum(count(*)) over (), 6) as doc_share
from s
group by split, lang
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#34o: quality-aware canonicalization of near-duplicate clusters —
    instead of keeping the min-id member (dedup_clusters), keep the
    HIGHEST-QUALITY member of each cluster (ties → lowest doc_id), the
    policy an LLM corpus actually wants.

    Rides on the converged connected-components labels; adds one join
    against the quality projection and a per-cluster window whose
    fan-in is the cluster size (near-dup cliques are small by
    construction, so the window is balanced at any corpus scale).
    """
    labels = dedup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id", "cluster_size"
    )
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        labels.join(quality, "doc_id")
        .withColumn("is_kept", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "cluster_size", "quality_score", "is_kept")
    )


def oracle_dedup_keep_best() -> str:
    return f"""
with cl as (
    select * from ({oracle_dedup_clusters()})
), q as (
    select doc_id, quality_score from ({oracle_text_quality_score()})
)
select doc_id, cluster_id, cluster_size, quality_score,
    row_number() over (partition by cluster_id
                       order by quality_score desc, doc_id asc) = 1 as is_kept
from cl join q using (doc_id)
"""


FUNNEL_STAGES = [
    "raw",
    "train_pool",
    "long_enough",
    "good_quality",
    "exact_canonical",
    "decontaminated",
]


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#34p: end-to-end curation attrition report — how many documents
    (and characters) survive each cumulative pipeline stage:
    raw → drop benchmark docs → length floor → quality floor → exact-
    dedup canonical → decontaminated.

    One pass: the per-doc boolean flags come from the already-oracled
    corpus_curation and decontaminate ops, the funnel itself is a single
    6-bucket conditional aggregation (map-side partials, one output
    row) unpivoted with ``stack`` — no per-stage rescans of the corpus.
    """
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    cur = corpus_curation(spark, sf_dir).select(
        "doc_id", "is_canonical", "long_enough", "good_quality"
    )
    dec = decontaminate(spark, sf_dir).select("doc_id", "contaminated")
    flags = base.join(cur, "doc_id").join(dec, "doc_id", "left")
    cum: list[Column] = [F.lit(True)]
    cum.append(cum[0] & (F.col("doc_id") % BENCH_MOD != 0))
    cum.append(cum[1] & F.col("long_enough"))
    cum.append(cum[2] & F.col("good_quality"))
    cum.append(cum[3] & F.col("is_canonical"))
    cum.append(cum[4] & ~F.coalesce(F.col("contaminated"), F.lit(False)))
    aggs = []
    for i, c in enumerate(cum, start=1):
        aggs.append(
            F.coalesce(F.sum(F.when(c, 1)), F.lit(0)).cast("long").alias(f"d{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(c, F.col("n_chars"))), F.lit(0))
            .cast("long")
            .alias(f"ch{i}")
        )
    one = flags.agg(*aggs)
    stack_args = ", ".join(
        f"cast({i} as bigint), '{name}', d{i}, ch{i}"
        for i, name in enumerate(FUNNEL_STAGES, start=1)
    )
    return one.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {stack_args})"
        " as (stage_idx, stage, docs, total_chars)",
        "d1 as raw_docs",
    ).select(
        "stage_idx",
        "stage",
        "docs",
        "total_chars",
        F.round(F.col("docs").cast("double") / F.col("raw_docs"), 6).alias(
            "pct_of_raw"
        ),
    )


def oracle_curation_funnel() -> str:
    stage_selects = []
    for i, name in enumerate(FUNNEL_STAGES, start=1):
        stage_selects.append(
            f"select cast({i} as bigint) as stage_idx, '{name}' as stage,"
            f" d{i} as docs, ch{i} as total_chars,"
            f" round(cast(d{i} as double) / d1, 6) as pct_of_raw from s"
        )
    union = "\nunion all\n".join(stage_selects)
    sums = []
    for i in range(1, len(FUNNEL_STAGES) + 1):
        sums.append(
            f"cast(coalesce(sum(case when c{i} then 1 end), 0) as bigint) as d{i}"
        )
        sums.append(
            f"cast(coalesce(sum(case when c{i} then n_chars end), 0) as bigint) as ch{i}"
        )
    sums_sql = ",\n        ".join(sums)
    return f"""
with cur as (
    select * from ({oracle_corpus_curation()})
), dec as (
    select doc_id, contaminated from ({oracle_decontaminate()})
), f as (
    select b.doc_id, b.n_chars,
        true as c1,
        (b.doc_id % {BENCH_MOD}) <> 0 as c2,
        (b.doc_id % {BENCH_MOD}) <> 0 and cur.long_enough as c3,
        (b.doc_id % {BENCH_MOD}) <> 0 and cur.long_enough
            and cur.good_quality as c4,
        (b.doc_id % {BENCH_MOD}) <> 0 and cur.long_enough
            and cur.good_quality and cur.is_canonical as c5,
        (b.doc_id % {BENCH_MOD}) <> 0 and cur.long_enough
            and cur.good_quality and cur.is_canonical
            and not coalesce(dec.contaminated, false) as c6
    from (select doc_id, n_chars from documents) b
    join cur using (doc_id)
    left join dec using (doc_id)
), s as (
    select
        {sums_sql}
    from f
)
{union}
"""


# ------------------------------------------- per-source robust profile

PROFILE_MAD_K = 3  # |len - median| > K*MAD flags a length outlier


def _grouped_median(vals: DataFrame, grp: str, col: str, out: str) -> DataFrame:
    """(grp, lower-median of col) via VALUE-GRAIN cumulative counts:
    group to (grp, distinct value) — bounded by the value range, not the
    row count — cumulative-sum within grp over that bounded set, take
    the smallest value whose cumulative count reaches ceil(n/2). The
    scale-safe grouped median: the obvious per-group row_number window
    carries every ROW through the sort; this carries every VALUE.
    """
    cnt = vals.groupBy(grp, col).agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(grp)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cnt.withColumn("__cum", F.sum("__c").over(w))
    tot = vals.groupBy(grp).agg(F.count(F.lit(1)).alias("__n"))
    return (
        cum.join(F.broadcast(tot), grp)
        .where(F.col("__cum") >= F.expr("(__n + 1) div 2"))
        .groupBy(grp)
        .agg(F.min(col).alias(out))
    )


def source_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length profile with ROBUST center/spread:
    median and MAD (median absolute deviation) of n_chars plus the count
    of MAD-outliers — the curation dashboard that catches a source
    shipping truncated or concatenated documents. Robust statistics are
    the right tool here precisely because the outliers being hunted
    poison mean/stddev.

    Determinism: medians are exact order statistics on bigints (no
    quantile_disc/percentile builtins — engines disagree on
    interpolation), the outlier test |dev| > K·MAD is pure integer
    comparison, and no float aggregation exists anywhere in the plan.

    Scale shape: two grouped value-grain medians (_grouped_median —
    windows over the bounded distinct-length set per source, never the
    row set), each broadcast back at |sources| rows; plus one partial-
    aggregated rollup. The fact table is scanned twice but never
    shuffled at row grain.
    """
    # lazily checkpointed: vals feeds the median's value-grain counts,
    # the dev projection AND the final rollup — without the checkpoint
    # the plan re-scans the source once per consumer (audited: 13
    # shuffle nodes → 7)
    vals = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.col("n_chars").cast("bigint").alias("len"))
        .localCheckpoint(eager=False)
    )
    med = _grouped_median(vals, "source", "len", "med_chars")
    devs = vals.join(F.broadcast(med), "source").select(
        "source", "len", "med_chars", F.abs(F.col("len") - F.col("med_chars")).alias("dev")
    ).localCheckpoint(eager=False)
    mad = _grouped_median(devs, "source", "dev", "mad_chars")
    return (
        devs.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("len").alias("min_chars"),
            F.max("len").alias("max_chars"),
            F.max("med_chars").alias("med_chars"),
            F.max("mad_chars").alias("mad_chars"),
            F.sum(
                F.when(F.col("dev") > PROFILE_MAD_K * F.col("mad_chars"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def oracle_source_length_profile() -> str:
    return f"""
with vals as (
    select source, cast(n_chars as bigint) as len from documents
),
vcnt as (select source, len, count(*) as c from vals group by 1, 2),
vcum as (
    select source, len,
        sum(c) over (partition by source order by len
                     rows between unbounded preceding and current row) as cum
    from vcnt
),
tot as (select source, count(*) as n from vals group by 1),
med as (
    select v.source, min(v.len) as med_chars
    from vcum v join tot t on v.source = t.source
    where v.cum >= (t.n + 1) // 2
    group by 1
),
devs as (
    select v.source, v.len, m.med_chars,
        abs(v.len - m.med_chars) as dev
    from vals v join med m on v.source = m.source
),
dcnt as (select source, dev, count(*) as c from devs group by 1, 2),
dcum as (
    select source, dev,
        sum(c) over (partition by source order by dev
                     rows between unbounded preceding and current row) as cum
    from dcnt
),
dtot as (select source, count(*) as n from devs group by 1),
mad as (
    select d.source, min(d.dev) as mad_chars
    from dcum d join dtot t on d.source = t.source
    where d.cum >= (t.n + 1) // 2
    group by 1
)
select d.source,
    count(*) as n_docs,
    min(d.len) as min_chars,
    max(d.len) as max_chars,
    max(d.med_chars) as med_chars,
    max(m.mad_chars) as mad_chars,
    cast(sum(case when d.dev > {PROFILE_MAD_K} * m.mad_chars then 1 else 0 end)
         as bigint) as n_outliers
from devs d join mad m on d.source = m.source
group by 1
"""


# ------------------------------------------- quality threshold sweep

SWEEP_STEP_I = 500  # threshold grid step on the 1e4 integer score basis


def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention curve over the quality score — for each candidate
    filter cutoff t in {0.00, 0.05, ..., 0.95}, how many documents and
    how many words survive ``quality_score >= t``. This is the table a
    curation run reads BEFORE committing to a cutoff: at 100 TB you
    sweep once and pick the threshold that hits the target token
    budget, instead of re-running the filter per candidate value.

    Determinism: the score (already round(,4), bit-identical
    cross-engine — certified via text_quality_score) is moved onto an
    integer basis (×10000) so threshold comparisons are exact integer
    comparisons; fractions are divisions of exact bigints.

    NULL-score docs (empty/whitespace-only text — unscoreable) count in
    the totals but retain at NO threshold, including 0.0: a quality
    cutoff drops what it cannot score. Identical NULL semantics both
    engines (NULL >= t is not true).

    Scale shape: ONE doc-grain aggregation collapses the corpus to a
    ≤10001-row (score value, docs, words) histogram; the 20-threshold
    sweep is a broadcast non-equi join against that bounded state —
    the fact table is scanned once and never rejoined.
    """
    q = text_quality_score(spark, sf_dir).select(
        F.round(F.col("quality_score") * 10000).cast("bigint").alias("score_i"),
        F.col("n_words"),
    )
    hist = q.groupBy("score_i").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_words").alias("words")
    ).localCheckpoint(eager=False)
    # totals from the BOUNDED histogram (its NULL-score group keeps the
    # sum corpus-complete) — the corpus itself is scanned exactly once
    totals = hist.agg(
        F.sum("docs").alias("total_docs"),
        F.sum("words").alias("total_words"),
    )
    grid = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(9500), F.lit(SWEEP_STEP_I))).alias(
            "t_i"
        )
    )
    swept = (
        hist.join(F.broadcast(grid), F.col("score_i") >= F.col("t_i"))
        .groupBy("t_i")
        .agg(
            F.sum("docs").alias("docs_retained"),
            F.sum("words").alias("words_retained"),
        )
    )
    # thresholds with zero survivors must still appear (grid-complete)
    swept = grid.join(swept, "t_i", "left").select(
        "t_i",
        F.coalesce("docs_retained", F.lit(0)).alias("docs_retained"),
        F.coalesce("words_retained", F.lit(0)).alias("words_retained"),
    )
    return swept.crossJoin(F.broadcast(totals)).select(
        (F.col("t_i") / 10000.0).alias("threshold"),
        F.col("docs_retained").cast("bigint").alias("docs_retained"),
        F.round(F.col("docs_retained") / F.col("total_docs"), 4).alias("docs_frac"),
        F.col("words_retained").cast("bigint").alias("words_retained"),
        F.round(F.col("words_retained") / F.col("total_words"), 4).alias(
            "words_frac"
        ),
    )


def oracle_quality_threshold_sweep() -> str:
    return f"""
with q as materialized (
    select cast(round(quality_score * 10000) as bigint) as score_i,
           n_words
    from ({oracle_text_quality_score()})
),
hist as (
    select score_i, count(*) as docs, sum(n_words) as words
    from q group by 1
),
totals as (select count(*) as total_docs, sum(n_words) as total_words from q),
grid as (select unnest(range(0, 10000, {SWEEP_STEP_I})) as t_i),
swept as (
    select g.t_i,
        coalesce(sum(h.docs), 0) as docs_retained,
        coalesce(sum(h.words), 0) as words_retained
    from grid g left join hist h on h.score_i >= g.t_i
    group by 1
)
select s.t_i / 10000.0 as threshold,
    cast(s.docs_retained as bigint) as docs_retained,
    round(cast(s.docs_retained as double) / t.total_docs, 4) as docs_frac,
    cast(s.words_retained as bigint) as words_retained,
    round(cast(s.words_retained as double) / t.total_words, 4) as words_frac
from swept s cross join totals t
"""
