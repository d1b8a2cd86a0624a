"""Embedding similarity operators over ``embeddings`` (SURVEY.md §2
#19-21): brute-force cosine top-k (the correctness baseline), cosine
near-dup pairs, and a random-hyperplane LSH variant (the scale path).

Cosine math: zip_with + left-fold aggregate in DOUBLE — verified
bit-identical to DuckDB's ordered list fold, so the brute-force ops have
full value-level oracles (floats included). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import (
    ANN_N_QUERIES,
    ANN_TOPK,
    EMBEDDING_DUP_THRESHOLD_04,
)
from ecommerce_dbt_medallion_spark.sources.registry import load_table


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm2 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return e.select("vec_id", "label", vec.alias("vec"), F.sqrt(norm2).alias("norm"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#20: brute-force cosine top-k for the first ANN_N_QUERIES vectors.

    The query set is broadcast (tiny by construction); the corpus streams
    through one pass — at 100 TB this is the standard brute-force rerank
    shape: no shuffle of the corpus, only the final per-query top-k.
    """
    e = _emb(spark, sf_dir)
    q = F.broadcast(
        e.where(F.col("vec_id") < ANN_N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
        )
    )
    cos = _dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        e.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_TOPK)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cosine", 6).alias("cosine_r6"),
        )
    )


_DOT_SQL = (
    "list_aggregate(list_transform(range(1, 65), "
    "i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double)), 'sum')"
)
_NORM_SQL = (
    "sqrt(list_aggregate(list_transform(range(1, 65), "
    "i -> cast({t}.embedding[i] as double) * cast({t}.embedding[i] as double)), 'sum'))"
)


def oracle_ann_cosine_topk() -> str:
    na = _NORM_SQL.format(t="a")
    nb = _NORM_SQL.format(t="b")
    return f"""
with scored as (
    select a.vec_id as query_id, b.vec_id as neighbor_id,
           {_DOT_SQL} / ({na} * {nb}) as cosine
    from embeddings a join embeddings b on b.vec_id <> a.vec_id
    where a.vec_id < {ANN_N_QUERIES}
),
ranked as (
    select query_id, neighbor_id, cosine,
           row_number() over (partition by query_id
                              order by cosine desc, neighbor_id asc) as rank
    from scored
)
select query_id, cast(rank as bigint) as rank, neighbor_id,
       round(cosine, 6) as cosine_r6
from ranked where rank <= {ANN_TOPK}
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#19: all-pairs cosine near-duplicates above threshold.

    O(n²) verification baseline — the scale path is ann_topk_lsh's bucketed
    candidate generation; this exact variant is the oracle-checkable truth.
    """
    e = _emb(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= EMBEDDING_DUP_THRESHOLD_04)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine_r6"))
    )


def oracle_dedup_embedding_cosine() -> str:
    na = _NORM_SQL.format(t="a")
    nb = _NORM_SQL.format(t="b")
    return f"""
select a.vec_id as vec_a, b.vec_id as vec_b,
       round({_DOT_SQL} / ({na} * {nb}), 6) as cosine_r6
from embeddings a join embeddings b on a.vec_id < b.vec_id
where {_DOT_SQL} / ({na} * {nb}) >= {EMBEDDING_DUP_THRESHOLD_04}
"""


N_HYPERPLANES = 6   # planes per table → 64 buckets each
N_LSH_TABLES = 4    # independent tables; candidates = union over tables


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#21: multi-table random-hyperplane LSH → bucketed candidates →
    exact rerank.

    Hyperplane (t, p) weight for dimension d is a deterministic
    pseudo-random derived from xxhash64 of (t*planes+p)*64+d —
    reproducible across runs and cluster sizes with zero driver-side
    state. Per table, the 6-bit sign pattern is the bucket key; candidates
    are the union over 4 tables (standard recall/cost dial), scored pairs
    come from an equi-join on (table, bucket) — the 100-TB path: no
    corpus crossJoin. Rows-only check: agreement with brute force is
    asserted in tests/test_ops.py.
    """
    e = _emb(spark, sf_dir)

    def bucket_col(t: int) -> Column:
        planes = F.transform(
            F.sequence(F.lit(0), F.lit(N_HYPERPLANES - 1)),
            lambda p: F.aggregate(
                F.zip_with(
                    F.col("vec"),
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda x, d: x
                    * (
                        (F.xxhash64((p + F.lit(t * N_HYPERPLANES)) * 64 + d) % 1000).cast(
                            "double"
                        )
                        / 1000.0
                    ),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
        return F.concat_ws(
            "", F.transform(planes, lambda s: F.when(s >= 0, "1").otherwise("0"))
        )

    bucketed = e.select(
        "vec_id",
        "vec",
        "norm",
        F.posexplode(F.array(*[bucket_col(t) for t in range(N_LSH_TABLES)])).alias(
            "table_id", "bucket"
        ),
    )
    a = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        "table_id",
        "bucket",
    ).where(F.col("query_id") < ANN_N_QUERIES)
    cos = _dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        bucketed.join(a, ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_TOPK)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cosine", 6).alias("cosine_r6"),
        )
    )


IVF_N_LISTS = 16
IVF_N_PROBE = 3
IVF_KMEANS_ITERS = 5


def _ivf_centroids(e: DataFrame) -> DataFrame:
    """Deterministic Lloyd's k-means over the corpus, expressed as joins
    and aggregations (no MLlib dependency, no driver-side loops over
    data): seeds are the first IVF_N_LISTS vectors by vec_id; each
    iteration is one assign (cross join small centroid set, broadcast)
    + one mean-reduce. Iteration count is fixed — at 100 TB this is
    IVF_KMEANS_ITERS passes over the corpus, the standard IVF build cost.
    """
    centroids = F.broadcast(
        e.orderBy("vec_id").limit(IVF_N_LISTS).select(
            F.col("vec_id").alias("list_id"), F.col("vec").alias("cvec")
        )
    )
    for _ in range(IVF_KMEANS_ITERS):
        dist = F.aggregate(
            F.zip_with(F.col("vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        assigned = (
            e.crossJoin(centroids)
            .withColumn("dist", dist)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("list_id"))
                ),
            )
            .where(F.col("rn") == 1)
        )
        # mean of member vectors per list: explode to (list, dim, value)
        means = (
            assigned.select(
                "list_id", F.posexplode(F.col("vec")).alias("dim", "v")
            )
            .groupBy("list_id", "dim")
            .agg(F.avg("v").alias("mv"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mv"))).alias("pairs"))
            .select(
                "list_id",
                F.transform(F.col("pairs"), lambda p: p["mv"]).alias("cvec"),
            )
        )
        centroids = F.broadcast(means)
    return centroids


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#21b: IVF (inverted-file) ANN — k-means coarse quantizer, probe
    the IVF_N_PROBE nearest lists per query, exact cosine rerank inside
    the probed lists.

    The 100 TB shape: corpus is assigned to lists once (narrow pass +
    broadcast centroids), stored clustered by list_id; each query scans
    only ~N_PROBE/N_LISTS of the corpus. Rows-only inventory entry;
    tests assert agreement with brute force on surfaced pairs and
    recall sanity.
    """
    e = _emb(spark, sf_dir)
    centroids = _ivf_centroids(e)

    dist = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    assigned = (
        e.crossJoin(centroids)
        .withColumn("dist", dist)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("list_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "vec", "norm", "list_id")
    )
    queries = (
        e.where(F.col("vec_id") < ANN_N_QUERIES)
        .crossJoin(centroids)
        .withColumn("dist", dist)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("list_id"))
            ),
        )
        .where(F.col("rn") <= IVF_N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
            "list_id",
        )
    )
    cos = _dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        assigned.join(F.broadcast(queries), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_TOPK)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cosine", 6).alias("cosine_r6"),
        )
    )
