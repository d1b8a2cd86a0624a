"""Int8 scalar quantization of embedding vectors — the compression
stage of a vector-search index build (store 64 bytes instead of 256,
rerank survivors against full-precision vectors).

Scale notes (100 TB): one narrow projection per vector — no shuffle,
no UDFs. The per-element transforms are interpreted HOFs (not
codegen'd), which is acceptable here because the work is O(dim) per
row with materialized intermediates (no nested-lambda recompute); at
cluster scale this stays scan-bound and embarrassingly parallel.

Determinism / oracle notes: float→double widening is exact in both
engines; x/scale is one double division; round() is half-away-from-
zero in both Spark (BigDecimal HALF_UP) and DuckDB; the reconstruction
error is an ORDERED left fold (element order fixed), which the
playbook-verified list_aggregate/sum equivalence makes bit-identical —
rounded to 6 decimals anyway for belt and braces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ONE dimensionality constant with the k-means family, or the
# mapInPandas matmul and the oracle flattens silently drift when the
# embeddings dimensionality changes
from ecommerce_dbt_medallion_spark.ops.cluster import KM_DIM as GRAM_DIM
from ecommerce_dbt_medallion_spark.sources.registry import load_table

QBITS_MAX = 127  # int8 symmetric range


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization with reconstruction error.

    q_i = round(x_i / scale), scale = max|x| / 127; output carries the
    scale, an md5 over the quantized codes (the index payload), and the
    L2 reconstruction error.
    """
    emb = F.col("embedding").cast("array<double>")
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("__e", emb)
        .withColumn(
            "__absmax",
            F.aggregate(
                F.col("__e"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
            ),
        )
        .withColumn(
            "__scale",
            F.when(F.col("__absmax") > 0, F.col("__absmax") / QBITS_MAX).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "__q",
            F.when(
                F.col("__absmax") > 0,
                F.transform(
                    F.col("__e"),
                    lambda x: F.round(x / F.col("__scale")).cast("long"),
                ),
            ).otherwise(F.transform(F.col("__e"), lambda x: F.lit(0).cast("long"))),
        )
    )
    err2 = F.aggregate(
        F.zip_with(
            F.col("__e"),
            F.col("__q"),
            lambda x, q: (x - q * F.col("__scale")) * (x - q * F.col("__scale")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return vecs.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.round(F.col("__scale"), 6).alias("scale"),
        F.md5(F.concat_ws(",", F.col("__q").cast("array<string>"))).alias("q_hash"),
        F.round(F.sqrt(err2), 6).alias("l2_err"),
        F.aggregate(
            F.col("__q"), F.lit(0).cast("long"), lambda a, q: a + F.abs(q)
        ).alias("q_l1_norm"),
    )


def oracle_embedding_quantize() -> str:
    return f"""
with v as (
    select vec_id, label, embedding::double[] as e
    from embeddings
), scaled as (
    select vec_id, label, e,
        list_aggregate(list_transform(e, x -> abs(x)), 'max') as absmax
    from v
), q as (
    select vec_id, label, e,
        case when absmax > 0 then absmax / {QBITS_MAX} else cast(0.0 as double) end as scale,
        case when absmax > 0
             then list_transform(e, x -> cast(round(x / (absmax / {QBITS_MAX})) as bigint))
             else list_transform(e, x -> cast(0 as bigint)) end as qs
    from scaled
)
select vec_id,
    cast(label as bigint) as label,
    round(scale, 6) as scale,
    md5(array_to_string(qs, ',')) as q_hash,
    round(sqrt(coalesce(list_aggregate(
        list_transform(range(1, len(e) + 1),
                       i -> (e[i] - qs[i] * scale) * (e[i] - qs[i] * scale)),
        'sum'), cast(0.0 as double))), 6) as l2_err,
    cast(coalesce(list_aggregate(list_transform(qs, x -> abs(x)), 'sum'), 0) as bigint)
        as q_l1_norm
from q
"""


# ---------------------------------------------------- Gram / covariance



def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Gram-matrix accumulation over the quantized
    embedding corpus — the input every PCA / whitening / covariance-
    conditioning stage of an embedding pipeline starts from. Output is
    the upper triangle (dim_a ≤ dim_b, 1-based): raw second-moment
    sums plus the per-dimension first-moment sums needed to form the
    covariance downstream, and second_moment = sum_ab / n as the one
    analytic double.

    Scale shape (100 TB): the d×d Gram of an N×d matrix is the
    textbook map-side-combinable aggregate — each partition reduces its
    rows to ONE d×d partial (here via an Arrow-batched mapInPandas
    doing an int64 matmul per batch: O(b·d²) work emitting d²/2 rows,
    NEVER the N·d² exploded self-join, which at 100 TB would shuffle
    2080× the corpus), then a (d²/2)-row groupBy folds partials. The
    only shuffle carries ≤ batches × d²/2 partial rows.

    Determinism / oracle notes: components share cluster.py's ONE
    quantization recipe (floor(v·1e6 + 0.5), exact in both engines);
    every sum is bigint — associative, commutative, partition-order
    free (|q| ≤ 5.8e5 on unit-normalized inputs ⇒ q² ≤ 3.4e11: int64
    holds the corpus sum through ~10M vectors; a 100 TB deployment
    re-scales KM_SCALE or splits the fold). The DuckDB oracle restates
    the same sums from an N·d² flatten-join — affordable at oracle SF,
    value-identical by exactness. second_moment is ONE IEEE division
    of exact integers (sum_ab < 2^53 at oracle SFs).
    """
    from ecommerce_dbt_medallion_spark.ops.cluster import _quantize_embeddings

    q = _quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return gram_finalize(gram_partial_sums(q))


def gram_partial_sums(q: DataFrame) -> DataFrame:
    """(vec_id, q) → one (dim_a, dim_b, n_part, sab_part, sa_part,
    sb_part) row per upper-triangle cell, folded across the frame: the
    ONE partial-Gram definition the batch key and the streaming
    maintenance share (exact bigint cells — associative, commutative,
    so ANY regrouping of rows, partitions or micro-batches sums to the
    same state)."""

    def _partials(batches):
        import numpy as np
        import pandas as pd

        iu_a, iu_b = np.triu_indices(GRAM_DIM)
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.array([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            G = Q.T @ Q
            s = Q.sum(axis=0)
            yield pd.DataFrame(
                {
                    "dim_a": iu_a + 1,
                    "dim_b": iu_b + 1,
                    "n_part": np.int64(len(Q)),
                    "sab_part": G[iu_a, iu_b],
                    "sa_part": s[iu_a],
                    "sb_part": s[iu_b],
                }
            )

    partials = q.mapInPandas(
        _partials,
        schema=(
            "dim_a int, dim_b int, n_part bigint, sab_part bigint,"
            " sa_part bigint, sb_part bigint"
        ),
    )
    return partials.groupBy("dim_a", "dim_b").agg(
        F.sum("n_part").alias("n_part"),
        F.sum("sab_part").alias("sab_part"),
        F.sum("sa_part").alias("sa_part"),
        F.sum("sb_part").alias("sb_part"),
    )


# Documented int64-safety bound for the Gram fold: |q| ≤ ~5.8e5 on
# unit-normalized inputs ⇒ q² ≤ 3.4e11, and 1e7 vectors × 3.4e11 ≈
# 3.4e18 < 2^63 ≈ 9.2e18 (headroom ~2.7×). Beyond this, Spark's
# non-ANSI bigint sum would wrap SILENTLY (DuckDB's hugeint would not)
# — so the bound is enforced loudly at publish time, not just noted.
GRAM_SAFE_N_VECS = 10_000_000


def gram_finalize(state: DataFrame) -> DataFrame:
    """Partial-sum state rows → the published Gram report (merging
    across whatever tags the state still carries).

    Publishing raises if the accumulated vector count exceeds
    ``GRAM_SAFE_N_VECS``: past the documented bound the bigint cells
    could have wrapped, and a wrapped covariance must fail the
    pipeline, not feed PCA. The check is an EAGER driver-side
    validation over the state frame (cells × batch-tags rows —
    metadata-scale), not a row-level expression on an output column:
    a column-attached guard would be silently removed by Catalyst
    column pruning for any consumer that projects it away (the
    round-12 review catch).

    The merged (dim_a, dim_b) sums are localCheckpoint(eager)'d ONCE:
    the guard's max-n scan and the published select both read the
    checkpointed cells, so the upstream partial-sum computation runs a
    single time (the round-12 version recomputed it — ~2× compute per
    publish). The checkpoint is executor-memory-resident, which is fine
    for this frame: post-merge state is exactly GRAM_DIM(GRAM_DIM+1)/2
    cells regardless of corpus size."""
    merged = (
        state.groupBy("dim_a", "dim_b")
        .agg(
            F.sum("n_part").alias("n_vecs"),
            F.sum("sab_part").alias("sum_ab"),
            F.sum("sa_part").alias("sum_a"),
            F.sum("sb_part").alias("sum_b"),
        )
        .localCheckpoint(eager=True)
    )
    mx = merged.agg(F.max("n_vecs").alias("mx")).collect()[0]["mx"]
    if mx is not None and mx > GRAM_SAFE_N_VECS:
        raise ValueError(
            f"gram_finalize: {mx} vectors exceeds the int64-safe bound "
            f"{GRAM_SAFE_N_VECS} — re-scale KM_SCALE or shard the Gram "
            "state before publishing"
        )
    return (
        merged
        .select(
            F.col("dim_a").cast("long").alias("dim_a"),
            F.col("dim_b").cast("long").alias("dim_b"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("sum_ab").cast("long").alias("sum_ab"),
            F.col("sum_a").cast("long").alias("sum_a"),
            F.col("sum_b").cast("long").alias("sum_b"),
            (
                F.col("sum_ab").cast("double") / F.col("n_vecs").cast("double")
            ).alias("second_moment"),
        )
    )


def oracle_embedding_gram_matrix() -> str:
    from ecommerce_dbt_medallion_spark.ops.cluster import KM_SCALE

    return f"""
with q as (
    select vec_id, list_transform(embedding,
        v -> cast(floor(cast(v as double) * {KM_SCALE}.0 + 0.5) as bigint)) as q
    from embeddings
), flat as (
    select vec_id, t.range as dim, q.q[t.range] as v
    from q cross join range(1, {GRAM_DIM} + 1) t
)
select a.dim as dim_a, b.dim as dim_b,
    cast(count(*) as bigint) as n_vecs,
    cast(sum(a.v * b.v) as bigint) as sum_ab,
    cast(sum(a.v) as bigint) as sum_a,
    cast(sum(b.v) as bigint) as sum_b,
    cast(sum(a.v * b.v) as double) / cast(count(*) as double) as second_moment
from flat a join flat b
  on a.vec_id = b.vec_id and a.dim <= b.dim
group by 1, 2
"""


# ------------------------------------------------- per-label centroid drift

def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-distribution drift — the corpus-monitoring
    report an embedding pipeline runs per ingest slice (does segment X
    sit where the corpus sits, or has its distribution moved?): for
    every ``label``, squared L2 distance between the label centroid and
    the GLOBAL centroid, plus the label centroid's squared norm.

    Determinism: per-(label, dim) sums are exact bigints over
    cluster.py's ONE quantization recipe (map-side combinable,
    partition-order free); each centroid component is ONE exact-integer
    IEEE division; the two d-term squared sums fold in FIXED dim order
    (array_sort + left fold ⇔ DuckDB list(… order by dim) +
    list_aggregate 'sum' — the playbook-verified bit-identical pair
    embedding_quantize already relies on).

    Scale shape (100 TB): one narrow posexplode pass → (labels × d)-row
    aggregate with map-side combine; the global centroid derives from
    the SAME aggregate (no second corpus pass); everything after runs
    at (labels × d) metadata scale. Drift values are in quantized
    units² (KM_SCALE² × cosine-space units) — comparisons across labels
    and across runs are what the report is for.
    """
    from ecommerce_dbt_medallion_spark.ops.cluster import _quantize_embeddings

    e = load_table(spark, sf_dir, "embeddings")
    q = _quantize_embeddings(e, "label")
    per_ld = (
        q.select("label", F.posexplode("q").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
    )
    per_d = per_ld.groupBy("dim").agg(
        F.sum("sv").alias("gsv"), F.sum("n").alias("gn")
    )
    diffs = per_ld.join(per_d, "dim").select(
        "label",
        "dim",
        "n",
        (F.col("sv").cast("double") / F.col("n").cast("double")).alias("m_l"),
        (F.col("gsv").cast("double") / F.col("gn").cast("double")).alias("m_g"),
    )
    folded = (
        diffs.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dim").alias("dim"),
                        ((F.col("m_l") - F.col("m_g")) * (F.col("m_l") - F.col("m_g"))).alias("d2"),
                        (F.col("m_l") * F.col("m_l")).alias("c2"),
                    )
                )
            ).alias("terms"),
        )
    )
    zero = F.lit(0.0).cast("double")
    return folded.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.aggregate("terms", zero, lambda a, t: a + t["d2"]).alias("drift_sq"),
        F.aggregate("terms", zero, lambda a, t: a + t["c2"]).alias(
            "centroid_norm_sq"
        ),
    )


def oracle_embedding_centroid_drift() -> str:
    from ecommerce_dbt_medallion_spark.ops.cluster import KM_SCALE

    return f"""
with q as (
    select vec_id, label, list_transform(embedding,
        v -> cast(floor(cast(v as double) * {KM_SCALE}.0 + 0.5) as bigint)) as q
    from embeddings
), flat as (
    select label, t.range as dim, q.q[t.range] as v
    from q cross join range(1, {GRAM_DIM} + 1) t
), per_ld as (
    select label, dim, sum(v) as sv, count(*) as n
    from flat group by label, dim
), per_d as (
    select dim, sum(sv) as gsv, sum(n) as gn from per_ld group by dim
), diffs as (
    select label, per_ld.dim, n,
        cast(sv as double) / cast(n as double) as m_l,
        cast(gsv as double) / cast(gn as double) as m_g
    from per_ld join per_d using (dim)
)
select cast(label as bigint) as label,
    cast(max(n) as bigint) as n_vecs,
    list_aggregate(list((m_l - m_g) * (m_l - m_g) order by dim), 'sum')
        as drift_sq,
    list_aggregate(list(m_l * m_l order by dim), 'sum') as centroid_norm_sq
from diffs
group by label
"""
