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

