"""Deterministic corpus clustering — integer-quantized Lloyd's k-means
over the ``embeddings`` table (SURVEY.md §2 #35a).

Topic-style clustering is the standard corpus-organization step of an
LLM data pipeline (cluster → per-cluster dedup/sample/balance). MLlib's
KMeans is seeded-random and float-summed, so its assignments are not
reproducible across partitionings, let alone engines. This operator
instead quantizes every embedding component to a scaled integer
(``floor(v * 1e6 + 0.5)``) and runs Lloyd's iterations entirely in
bigint arithmetic:

- squared L2 distances are exact bigints → the argmin (tie-broken on
  cluster id) is deterministic under ANY partitioning;
- centroid updates sum bigints — associative and commutative, so
  map-side partial aggregation works and the result is partition-order
  free. Contrast with the IVF coarse quantizer
  (similarity.py:_ivf_centroids), which keeps float semantics and must
  fold member values in a FIXED vec_id order via collect_list — correct
  but unable to use partial aggregation. At 100 TB the integer variant
  is the one that scales: each iteration is one broadcast-join pass
  over the corpus plus a (k × dim)-row aggregate.
- the new centroid component is floor(sum / n) — one double division
  from exact integers, bit-identical on both engines.

Seeds are the first KM_K vectors by vec_id (deterministic, no RNG).
Iteration count is fixed at KM_ITERS update rounds + a final assign;
convergence-to-fixpoint would make runtime data-dependent, which a
production pipeline schedules as "N rounds per day" anyway. Clusters
that lose all members simply drop out (both engines agree).

Plan shape per iteration: corpus ⋈ broadcast(centroids) → N×K narrow
rows → groupBy(vec_id) min(struct) (single shuffle at corpus grain) →
posexplode members → groupBy(cluster, dim) with map-side combine
(k·dim output rows). The centroid set (k × dim ≤ a few KB) is collected
to the driver between iterations — metadata-scale, like the lakehouse
file lists, not a data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import ANN_N_QUERIES, ANN_TOPK
from ecommerce_dbt_medallion_spark.sources.registry import load_table

KM_K = 8  # clusters
KM_ITERS = 2  # centroid-update rounds (a final assign pass follows)
KM_SCALE = 1_000_000  # component quantization: floor(v * SCALE + 0.5)
KM_DIM = 64


def _quantize_embeddings(e: DataFrame, *extra: str) -> DataFrame:
    """(vec_id, embedding) → (vec_id, *extra, q): the ONE quantization
    recipe every integer-k-means consumer shares — batch loaders and
    the streamed ann_index_maintain micro-batches must quantize
    identically or stored codes drift from the batch-built index.
    ``extra`` carries source columns (e.g. label) through the SAME
    projection so consumers never re-scan or self-join to recover
    them."""
    q = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * F.lit(float(KM_SCALE)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    return e.select("vec_id", *extra, q.alias("q"))


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quantize_embeddings(load_table(spark, sf_dir, "embeddings"))


def _sqdist_int(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _group_mean_q(rows: DataFrame, group: str) -> DataFrame:
    """(group, q) rows → (group, cq) integer mean vectors: exact bigint
    per-dim sums (order-free, map-side combinable), floor(sum/n) as the
    single fp op, dim-sorted reassembly. ONE definition of the
    determinism contract every integer-k-means consumer shares —
    _train, kmeans_embeddings and nearest_centroid_classify previously
    carried three copies (round-10 review)."""
    return (
        rows.select(group, F.posexplode("q").alias("dim", "v"))
        .groupBy(group, "dim")
        .agg(F.sum("v").alias("sv"), F.count("*").alias("n"))
        .select(
            group,
            "dim",
            F.floor(F.col("sv").cast("double") / F.col("n")).cast("long").alias(
                "comp"
            ),
        )
        .groupBy(group)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "comp"))).alias("pairs"))
        .select(group, F.transform(F.col("pairs"), lambda p: p["comp"]).alias("cq"))
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cluster, dist): nearest centroid, ties to lowest cluster id.

    groupBy + min(struct(dist, cluster)) — lexicographic struct min is the
    argmin with deterministic tie-break, and unlike a row_number window it
    partially aggregates map-side.
    """
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        F.struct(
            _sqdist_int(F.col("q"), F.col("cq")).alias("dist"),
            F.col("cluster").alias("cluster"),
        ).alias("dc"),
    )
    return scored.groupBy("vec_id").agg(F.min("dc").alias("m")).select(
        "vec_id", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist")
    )


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#35a: deterministic k-means assignments (vec_id, cluster, dist)."""
    # vec_id-hash repartition (not round-robin): the per-iteration
    # argmin groupBy and the update join both key on vec_id, so every
    # downstream exchange reuses this one partitioning. The lazy
    # checkpoint stops the quantize+scan subtree re-running once per
    # assign/update consumer (2·ITERS + 1 of them). CONDITIONAL
    # (VERDICT r14 #3): a multi-split corpus skips the extra exchange.
    vectors = _quantized(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < par:
        vectors = vectors.repartition(par, "vec_id")
    vectors = vectors.localCheckpoint(eager=False)
    return _assign(vectors, _train(vectors, KM_K, KM_ITERS)).orderBy("vec_id")


def oracle_kmeans_embeddings() -> str:
    dist = (
        "cast(list_aggregate(list_transform(range(1, %d), "
        "i -> (v.q[i]-c.cq[i])*(v.q[i]-c.cq[i])), 'sum') as bigint)" % (KM_DIM + 1)
    )
    parts = [
        f"""q as (
  select vec_id, list_transform(embedding,
    v -> cast(floor(cast(v as double) * {KM_SCALE}.0 + 0.5) as bigint)) as q
  from embeddings
)""",
        f"""qd as (
  select vec_id, t.range as dim, q.q[t.range] as v
  from q cross join range(1, {KM_DIM + 1}) t
)""",
        f"c0 as (select vec_id as cluster, q as cq from q where vec_id < {KM_K})",
    ]
    for i in range(KM_ITERS):
        parts.append(
            f"""a{i} as (
  select vec_id, cluster from (
    select v.vec_id, c.cluster,
      row_number() over (partition by v.vec_id
        order by {dist} asc, c.cluster asc) as rn
    from q v cross join c{i} c
  ) where rn = 1
)"""
        )
        parts.append(
            f"""c{i + 1} as (
  select cluster, list(comp order by dim) as cq from (
    select a.cluster, t.dim,
      cast(floor(cast(sum(t.v) as double) / count(*)) as bigint) as comp
    from a{i} a join qd t using (vec_id)
    group by a.cluster, t.dim
  ) group by cluster
)"""
        )
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select vec_id, cluster, dist from (
  select v.vec_id, c.cluster, {dist} as dist,
    row_number() over (partition by v.vec_id
      order by {dist} asc, c.cluster asc) as rn
  from q v cross join c{KM_ITERS} c
) where rn = 1 order by vec_id"""
    )


# ------------------------------------------------ product quantization

PQ_M = 4  # sub-spaces
PQ_SUB = KM_DIM // PQ_M  # dims per sub-space
PQ_K = 16  # codewords per sub-space (4 bits)
PQ_ITERS = 2


def _train(vectors: DataFrame, k: int, iters: int) -> DataFrame:
    """Integer Lloyd's on (vec_id, q) — the kmeans_embeddings loop
    factored for reuse (PQ trains it once per sub-space)."""
    centroids = vectors.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), F.col("q").alias("cq")
    )
    for _ in range(iters):
        assigned = _assign(vectors, centroids)
        centroids = _group_mean_q(
            assigned.join(vectors, "vec_id").select("cluster", "q"), "cluster"
        )
    return centroids


def pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: the 64-dim embedding split into PQ_M
    sub-vectors, each assigned to one of PQ_K codewords trained by the
    SAME deterministic integer Lloyd's as kmeans_embeddings — a vector
    compresses to M·log2(K) = 16 bits (vs int8's 512), the codebook
    layer of a billion-vector IVF-PQ index. Output: per-vector code
    tuple + exact bigint total distortion (the quantization error that
    decides K/M sizing).

    Determinism: everything inherits kmeans' integer arithmetic —
    sub-space argmin ties break on code id; distortion is an exact sum
    of per-sub-space bigint squared distances. Scale shape: per
    sub-space, train cost = kmeans at dim/M; the assign passes reuse
    ONE vec_id-partitioned checkpointed corpus, and the M result
    frames join on the co-partitioned vec_id key.
    """
    # conditional single-split fan-out (VERDICT r14 #3)
    vectors = _quantized(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < par:
        vectors = vectors.repartition(par, "vec_id")
    vectors = vectors.localCheckpoint(eager=False)
    out = None
    dist_cols = []
    for m in range(PQ_M):
        sub = vectors.select(
            "vec_id", F.slice("q", m * PQ_SUB + 1, PQ_SUB).alias("q")
        ).localCheckpoint(eager=False)
        centroids = _train(sub, PQ_K, PQ_ITERS)
        part = _assign(sub, centroids).select(
            "vec_id",
            F.col("cluster").cast("bigint").alias(f"code{m}"),
            F.col("dist").alias(f"dist{m}"),
        )
        out = part if out is None else out.join(part, "vec_id")
        dist_cols.append(f"dist{m}")
    return out.select(
        "vec_id",
        *[f"code{m}" for m in range(PQ_M)],
        sum(F.col(c) for c in dist_cols).cast("bigint").alias("distortion"),
    )


def oracle_pq_quantize() -> str:
    def sub_dist(m: int) -> str:
        return (
            "cast(list_aggregate(list_transform(range(1, %d), "
            "i -> (v.q[i]-c.cq[i])*(v.q[i]-c.cq[i])), 'sum') as bigint)"
            % (PQ_SUB + 1)
        )

    parts = [
        f"""q as materialized (
  select vec_id, list_transform(embedding,
    v -> cast(floor(cast(v as double) * {KM_SCALE}.0 + 0.5) as bigint)) as q
  from embeddings
)"""
    ]
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        d = sub_dist(m)
        parts.append(
            f"qm{m} as materialized (select vec_id, q[{lo}:{hi}] as q from q)"
        )
        parts.append(
            f"""qd{m} as materialized (
  select vec_id, t.range as dim, q.q[t.range] as v
  from qm{m} q cross join range(1, {PQ_SUB + 1}) t
)"""
        )
        parts.append(
            f"cm{m}_0 as materialized (select vec_id as cluster, q as cq "
            f"from qm{m} where vec_id < {PQ_K})"
        )
        for i in range(PQ_ITERS):
            parts.append(
                f"""am{m}_{i} as materialized (
  select vec_id, cluster from (
    select v.vec_id, c.cluster,
      row_number() over (partition by v.vec_id
        order by {d} asc, c.cluster asc) as rn
    from qm{m} v cross join cm{m}_{i} c
  ) where rn = 1
)"""
            )
            parts.append(
                f"""cm{m}_{i + 1} as materialized (
  select cluster, list(comp order by dim) as cq from (
    select a.cluster, t.dim,
      cast(floor(cast(sum(t.v) as double) / count(*)) as bigint) as comp
    from am{m}_{i} a join qd{m} t using (vec_id)
    group by a.cluster, t.dim
  ) group by cluster
)"""
            )
        parts.append(
            f"""fm{m} as materialized (
  select vec_id, cast(cluster as bigint) as code{m}, dist from (
    select v.vec_id, c.cluster, {d} as dist,
      row_number() over (partition by v.vec_id
        order by {d} asc, c.cluster asc) as rn
    from qm{m} v cross join cm{m}_{PQ_ITERS} c
  ) where rn = 1
)"""
        )
    joins = " ".join(f"join fm{m} using (vec_id)" for m in range(1, PQ_M))
    codes = ", ".join(f"code{m}" for m in range(PQ_M))
    dists = " + ".join(f"fm{m}.dist" for m in range(PQ_M))
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select vec_id, {codes}, cast({dists} as bigint) as distortion
from fm0 {joins}
"""
    )


# ----------------------------------- nearest-centroid classification


def nearest_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: nearest-centroid (Rocchio) classification audit over
    the labeled embeddings — the standard cheap probe of embedding
    quality in an LLM data pipeline (are the labels linearly separable
    in embedding space?), and the supervised sibling of
    kmeans_embeddings. Returns the CONFUSION MATRIX
    (true_label, predicted_label, n_vectors).

    Same determinism discipline as the k-means family: components
    quantize to scaled bigints, per-label centroid sums are exact
    integer aggregation (order-free, map-side combinable),
    floor(sum/n) is the single fp op, and squared-L2 argmin ties break
    to the lowest label. Plan shape: ONE corpus pass against a
    broadcast (|labels| × dim) centroid table, then a |labels|²-row
    confusion agg — no corpus shuffle beyond the vec-grain argmin.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qexpr = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * F.lit(float(KM_SCALE)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    # conditional single-split fan-out (VERDICT r14 #3)
    vectors = e.select(
        "vec_id", F.col("label").cast("int").alias("label"), qexpr.alias("q")
    )
    par = spark.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < par:
        vectors = vectors.repartition(par, "vec_id")
    vectors = vectors.localCheckpoint(eager=False)
    centroids = _group_mean_q(vectors.select("label", "q"), "label").select(
        F.col("label").alias("clabel"), "cq"
    )
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "label",
        F.struct(
            _sqdist_int(F.col("q"), F.col("cq")).alias("dist"),
            F.col("clabel").alias("clabel"),
        ).alias("dc"),
    )
    pred = scored.groupBy("vec_id", "label").agg(F.min("dc").alias("m")).select(
        "label", F.col("m.clabel").alias("predicted_label")
    )
    return (
        pred.groupBy("label", "predicted_label")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .select(
            F.col("label").alias("true_label"),
            F.col("predicted_label").cast("int").alias("predicted_label"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
        )
        .orderBy("true_label", "predicted_label")
    )


def oracle_nearest_centroid_classify() -> str:
    dist = (
        "cast(list_aggregate(list_transform(range(1, %d), "
        "i -> (v.q[i]-c.cq[i])*(v.q[i]-c.cq[i])), 'sum') as bigint)" % (KM_DIM + 1)
    )
    return f"""
with q as (
  select vec_id, cast(label as int) as label, list_transform(embedding,
    v -> cast(floor(cast(v as double) * {KM_SCALE}.0 + 0.5) as bigint)) as q
  from embeddings
),
cent as (
  select label as clabel, list(comp order by dim) as cq from (
    select q.label, t.range as dim,
      cast(floor(cast(sum(q.q[t.range]) as double) / count(*)) as bigint) as comp
    from q cross join range(1, {KM_DIM + 1}) t
    group by q.label, t.range
  ) group by label
),
pred as (
  select vec_id, label, clabel as predicted_label from (
    select v.vec_id, v.label, c.clabel,
      row_number() over (partition by v.vec_id
        order by {dist} asc, c.clabel asc) as rn
    from q v cross join cent c
  ) where rn = 1
)
select label as true_label, cast(predicted_label as int) as predicted_label,
       cast(count(*) as bigint) as n_vectors
from pred group by 1, 2 order by 1, 2
"""


# ------------------------------------------------ IVF-PQ ANN search

IVFPQ_LISTS = 8  # coarse inverted lists
IVFPQ_PROBE = 2  # lists probed per query
# Deterministic TRAINING SAMPLE bound (vec_id < this): standard IVF-PQ
# practice — quantizers train on a bounded sample (~256·k points), only
# assignment/encoding touches the full corpus, so training cost stops
# growing with corpus size. At the test SFs below the bound, the sample
# IS the corpus (results unchanged there); the DuckDB oracle applies
# the identical bound, so the sampled training stays hash-gated.
IVFPQ_TRAIN_MAX = 1024


def _ivfpq_residuals(vectors: DataFrame, coarse: DataFrame) -> DataFrame:
    """(vec_id, list_id, r): coarse-assign each vector and subtract its
    list centroid — exact integer residuals, pointwise per vector, so
    the result is independent of which batch a vector arrives in (the
    property ann_index_maintain's streamed encoding relies on)."""
    coarse_b = F.broadcast(
        coarse.select(F.col("cluster").alias("list_id"), F.col("cq").alias("lq"))
    )
    return (
        _assign(vectors, coarse)
        .select("vec_id", F.col("cluster").alias("list_id"))
        .join(vectors, "vec_id")
        .join(coarse_b, "list_id")
        .select(
            "vec_id",
            "list_id",
            F.zip_with("q", "lq", lambda x, y: x - y).alias("r"),
        )
    )


def _lloyd_local(ids, Q, k: int, iters: int):
    """Driver-side bit-exact twin of ``_train`` (integer Lloyd's) over a
    BOUNDED sample: ``ids`` int64 (n,), ``Q`` int64 (n, d). Returns
    (cluster_ids, centroids) as int64 arrays, centroids row-ordered by
    ascending cluster id.

    Exactness contract (pinned by
    tests/test_ops.py::test_ivfpq_local_training_matches_distributed):
    distances are exact int64 sums of squares (no overflow: components
    are quantized to ~1e6, so a 64-dim squared distance tops out near
    2.6e14 « 2^63); the argmin tie-breaks to the LOWEST cluster id
    because centroid rows are kept sorted by id and ``argmin`` returns
    the first minimum; the centroid update is the same single fp op as
    ``_group_mean_q`` — float64(sum)/n, floored — and both engines
    (and numpy) share IEEE-754 double division, so the result is
    bit-identical. Clusters that lose all members drop out, exactly as
    the distributed groupBy does."""
    import numpy as np

    sel = ids < k
    clusters = ids[sel]
    order = np.argsort(clusters)
    clusters = clusters[order]
    C = Q[sel][order]
    for _ in range(iters):
        d = Q[:, None, :] - C[None, :, :]
        dist = (d * d).sum(axis=2)
        assign = np.argmin(dist, axis=1)
        new_ids, new_rows = [], []
        for j in range(len(clusters)):
            members = Q[assign == j]
            if len(members) == 0:
                continue
            s = members.sum(axis=0, dtype=np.int64)
            new_ids.append(clusters[j])
            new_rows.append(
                np.floor(s.astype(np.float64) / len(members)).astype(np.int64)
            )
        clusters = np.asarray(new_ids, dtype=np.int64)
        C = np.asarray(new_rows, dtype=np.int64).reshape(len(new_ids), -1)
    return clusters, C


def _ivfpq_encode_local(spark, rows, coarse_rows, codebook_rows):
    """Driver-side bit-exact twin of ``_ivfpq_encode`` for a BOUNDED
    vector set (the ann_index_maintain bootstrap seed, ≤ ANN_INDEX_BOOT
    rows by construction): coarse argmin (int64, ties to the lowest
    cluster id — centroid rows sorted by id, argmin takes the first
    minimum), exact integer residual, per-sub-space codebook argmin.
    Returns (vec_id, list_id, code0..code{M-1}) Python rows ready for
    createDataFrame. Pinned against the distributed encoder by
    tests/test_ops.py::test_ivfpq_local_encode_matches_distributed."""
    import numpy as np

    if not rows or not coarse_rows:
        # degenerate empty seed / empty-corpus codebooks (ADVICE r14):
        # the distributed encoder returns an empty frame here; the
        # 1-D empty np arrays below would raise instead
        return []
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    Q = np.asarray([r["q"] for r in rows], dtype=np.int64)

    def _sorted_cb(crows):
        crows = sorted(crows, key=lambda r: r["cluster"])
        return (
            np.asarray([r["cluster"] for r in crows], dtype=np.int64),
            np.asarray([r["cq"] for r in crows], dtype=np.int64),
        )

    cids, C = _sorted_cb(coarse_rows)
    d = Q[:, None, :] - C[None, :, :]
    a = np.argmin((d * d).sum(axis=2), axis=1)
    list_ids = cids[a]
    R = Q - C[a]
    codes = []
    for m in range(PQ_M):
        kids, K = _sorted_cb(codebook_rows[m])
        sub = R[:, m * PQ_SUB : (m + 1) * PQ_SUB]
        dm = sub[:, None, :] - K[None, :, :]
        am = np.argmin((dm * dm).sum(axis=2), axis=1)
        codes.append(kids[am])
    return [
        (int(ids[i]), int(list_ids[i]), *[int(c[i]) for c in codes])
        for i in range(len(ids))
    ]


def _ivfpq_train(vectors: DataFrame):
    """Train the coarse quantizer + PQ_M residual codebooks on the
    bounded deterministic sample vec_id < IVFPQ_TRAIN_MAX. Returns
    (coarse, [codebook_0..codebook_{M-1}]), each (cluster, cq).
    Training cost is O(sample) regardless of corpus size; the sample
    residuals here equal the full-corpus residuals restricted to the
    sample (residuals are pointwise), so training on a bootstrap slice
    and training inside the one-shot batch pipeline yield byte-equal
    codebooks — the invariant that lets ann_index_maintain share
    oracle_ann_topk_ivfpq verbatim.

    Round 14: training runs DRIVER-SIDE. The sample is structurally
    bounded by the dial (≤ IVFPQ_TRAIN_MAX rows × KM_DIM longs ≈ 0.5 MB
    — metadata-scale, like the lakehouse file lists), yet the lazy
    distributed chain it replaces was 5 Lloyd's trainings × ~8 stages
    of crossJoin/explode/groupBy on ~1k rows — measured ~12 s of pure
    fixed job overhead per pipeline construction at sf0.1, which the
    construction-timed ann_topk_ivfpq* and ann_index_maintain keys each
    paid per bench run. One bounded collect + exact numpy Lloyd's
    (see _lloyd_local) computes identical codebooks in milliseconds;
    the corpus-scale encode/search stay fully distributed."""
    import numpy as np

    rows = (
        vectors.where(F.col("vec_id") < IVFPQ_TRAIN_MAX)
        .select("vec_id", "q")
        .collect()
    )
    if not rows:
        # degenerate empty corpus: keep the distributed body's behavior
        # (empty centroid frames) without special-casing consumers
        sample = vectors.where(F.col("vec_id") < IVFPQ_TRAIN_MAX)
        coarse = _train(sample, IVFPQ_LISTS, KM_ITERS).localCheckpoint(
            eager=False
        )
        res_s = _ivfpq_residuals(sample, coarse).localCheckpoint(eager=False)
        return coarse, [
            _train(
                res_s.select(
                    "vec_id", F.slice("r", m * PQ_SUB + 1, PQ_SUB).alias("q")
                ),
                PQ_K,
                PQ_ITERS,
            ).localCheckpoint(eager=False)
            for m in range(PQ_M)
        ]

    spark = vectors.sparkSession
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    Q = np.asarray([r["q"] for r in rows], dtype=np.int64)
    cids, C = _lloyd_local(ids, Q, IVFPQ_LISTS, KM_ITERS)
    # sample residuals against the FINAL coarse centroids (the same
    # assign _ivfpq_residuals performs, restricted to the sample)
    d = Q[:, None, :] - C[None, :, :]
    assign = np.argmin((d * d).sum(axis=2), axis=1)
    R = Q - C[assign]

    def _df(cl, M):
        return spark.createDataFrame(
            [(int(c), [int(x) for x in row]) for c, row in zip(cl, M)],
            "cluster long, cq array<bigint>",
        )

    coarse = _df(cids, C)
    codebooks = []
    for m in range(PQ_M):
        sub = R[:, m * PQ_SUB : (m + 1) * PQ_SUB]
        codebooks.append(_df(*_lloyd_local(ids, sub, PQ_K, PQ_ITERS)))
    return coarse, codebooks


def _ivfpq_encode(
    vectors: DataFrame, coarse: DataFrame, codebooks: list[DataFrame]
) -> DataFrame:
    """ONE corpus pass: coarse-assign + residual + per-sub-space PQ code
    (vec_id, list_id, code0..code{M-1}) against FROZEN codebooks —
    broadcast joins only, no shuffle wider than the corpus itself."""
    res = _ivfpq_residuals(vectors, coarse).localCheckpoint(eager=False)
    codes = res.select("vec_id", "list_id")
    for m in range(PQ_M):
        sub = res.select(
            "vec_id", F.slice("r", m * PQ_SUB + 1, PQ_SUB).alias("q")
        )
        codes = codes.join(
            _assign(sub, codebooks[m]).select(
                "vec_id", F.col("cluster").alias(f"code{m}")
            ),
            "vec_id",
        )
    return codes


def _ivfpq_probe(queries: DataFrame, coarse: DataFrame) -> DataFrame:
    """(query_id, list_id, qr): each query's IVFPQ_PROBE nearest lists
    with its residual against each. Standalone so a stored-index search
    can resolve WHICH lists it will touch (metadata-scale: queries ×
    lists) and file-skip the code scan before reading any code row."""
    coarse_b = F.broadcast(
        coarse.select(F.col("cluster").alias("list_id"), F.col("cq").alias("lq"))
    )
    return (
        queries.crossJoin(coarse_b)
        .select(
            F.col("vec_id").alias("query_id"),
            "list_id",
            F.zip_with("q", "lq", lambda x, y: x - y).alias("qr"),
            F.struct(
                _sqdist_int(F.col("q"), F.col("lq")).alias("d"),
                F.col("list_id").alias("l"),
            ).alias("dl"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("dl.d"), F.asc("dl.l")
                )
            ),
        )
        .where(F.col("rn") <= IVFPQ_PROBE)
        .select("query_id", "list_id", "qr")
    )


def _ivfpq_search(
    queries: DataFrame, coarse: DataFrame, codebooks: list[DataFrame],
    codes: DataFrame, topk: int = ANN_TOPK,
) -> DataFrame:
    """Probe each query's IVFPQ_PROBE nearest lists and rank candidates
    by asymmetric distance (per-(query,list) LUTs over the codebooks,
    summed across sub-spaces). ``codes`` may come from the in-plan
    encoder or from a STORED lakehouse code table — the search never
    touches original vectors. ``topk`` widens the cut for consumers
    that rerank a candidate pool (ann_topk_ivfpq_rerank)."""
    qprobe = _ivfpq_probe(queries, coarse)

    # asymmetric-distance lookup tables: exact bigint distance from
    # each probed query residual sub-vector to every codeword
    luts = []
    for m in range(PQ_M):
        lut = (
            qprobe.select(
                "query_id",
                "list_id",
                F.slice("qr", m * PQ_SUB + 1, PQ_SUB).alias("qsub"),
            )
            .crossJoin(
                F.broadcast(
                    codebooks[m].select(
                        F.col("cluster").alias(f"code{m}"),
                        F.col("cq").alias("cw"),
                    )
                )
            )
            .select(
                "query_id",
                "list_id",
                f"code{m}",
                _sqdist_int(F.col("qsub"), F.col("cw")).alias(f"d{m}"),
            )
        )
        luts.append(F.broadcast(lut))

    # candidates: codes in probed lists; adist = Σ_m LUT[m][code_m]
    cand = codes.join(
        F.broadcast(qprobe.select("query_id", "list_id")), "list_id"
    ).where(F.col("vec_id") != F.col("query_id"))
    for m in range(PQ_M):
        cand = cand.join(luts[m], ["query_id", "list_id", f"code{m}"])
    adist = sum(F.col(f"d{m}") for m in range(PQ_M))
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", adist.cast("bigint").alias("adist"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            "adist",
        )
    )


def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: IVF-PQ asymmetric-distance ANN search — the
    billion-vector memory shape (Jégou et al., "Product Quantization
    for Nearest Neighbor Search"): a coarse quantizer routes each
    vector to one of IVFPQ_LISTS inverted lists; the RESIDUAL
    (vector − list centroid) compresses to PQ_M 4-bit codes; a query
    probes its IVFPQ_PROBE nearest lists and scores candidates by
    ASYMMETRIC distance — exact query-residual-to-codeword distances
    summed over sub-spaces via a per-(query, list) lookup table,
    never touching the original vectors.

    Everything runs in the k-means family's exact scaled-integer
    arithmetic (quantize → bigint sums → floor(sum/n) centroids), so
    codes, lookup tables, and ranks are partition-order free and the
    DuckDB oracle replays the ENTIRE pipeline — training included —
    value for value. Output distances are exact bigints.

    Scale shape: both quantizers train on the bounded deterministic
    sample vec_id < IVFPQ_TRAIN_MAX (training cost is O(sample), never
    O(corpus); at test SFs under the bound the sample IS the corpus),
    then ONE corpus pass assigns + encodes everything
    (broadcast centroids/codebooks), store codes clustered by list_id.
    A query touches ~PROBE/LISTS of the code table and the LUT joins
    are broadcast (Q × PROBE × M × K rows ≈ KBs); the 16-bit codes are
    what makes 1e9+ vectors fit a cluster's RAM at 100 TB.
    """
    par = spark.sparkContext.defaultParallelism
    vectors = (
        _quantized(spark, sf_dir)
        .repartition(par, "vec_id")
        .localCheckpoint(eager=False)
    )
    coarse, codebooks = _ivfpq_train(vectors)
    codes = _ivfpq_encode(vectors, coarse, codebooks).localCheckpoint(
        eager=False
    )
    return _ivfpq_search(
        vectors.where(F.col("vec_id") < ANN_N_QUERIES), coarse, codebooks, codes
    )


def _oracle_ivfpq_parts():
    """The shared DuckDB CTE chain of the IVF-PQ pipeline — coarse
    k-means training, residual PQ codebook training, encoding, probing,
    LUT construction — ending at the ``codes``/``qp``/``lut{m}`` CTEs.
    Returns (parts, lut_joins, adist_expr); oracle_ann_topk_ivfpq and
    oracle_ann_topk_ivfpq_rerank append their own final stages, so the
    two replays can never drift."""
    full_dist = (
        "cast(list_aggregate(list_transform(range(1, %d), "
        "i -> (v.q[i]-c.cq[i])*(v.q[i]-c.cq[i])), 'sum') as bigint)" % (KM_DIM + 1)
    )
    sub_dist = (
        "cast(list_aggregate(list_transform(range(1, %d), "
        "i -> (v.q[i]-c.cq[i])*(v.q[i]-c.cq[i])), 'sum') as bigint)" % (PQ_SUB + 1)
    )
    parts = [
        f"""q as materialized (
  select vec_id, list_transform(embedding,
    v -> cast(floor(cast(v as double) * {KM_SCALE}.0 + 0.5) as bigint)) as q
  from embeddings
)""",
        f"""qd as materialized (
  select vec_id, t.range as dim, q.q[t.range] as v
  from q cross join range(1, {KM_DIM + 1}) t
)""",
        f"c0 as (select vec_id as cluster, q as cq from q where vec_id < {IVFPQ_LISTS})",
    ]
    for i in range(KM_ITERS):
        parts.append(
            f"""a{i} as materialized (
  select vec_id, cluster from (
    select v.vec_id, c.cluster,
      row_number() over (partition by v.vec_id
        order by {full_dist} asc, c.cluster asc) as rn
    from q v cross join c{i} c
    where v.vec_id < {IVFPQ_TRAIN_MAX}
  ) where rn = 1
)"""
        )
        parts.append(
            f"""c{i + 1} as materialized (
  select cluster, list(comp order by dim) as cq from (
    select a.cluster, t.dim,
      cast(floor(cast(sum(t.v) as double) / count(*)) as bigint) as comp
    from a{i} a join qd t using (vec_id)
    group by a.cluster, t.dim
  ) group by cluster
)"""
        )
    cz = f"c{KM_ITERS}"
    parts.append(
        f"""acorp as materialized (
  select vec_id, cluster as list_id,
    list_transform(range(1, {KM_DIM + 1}), i -> qv[i] - cqv[i]) as r
  from (
    select v.vec_id, c.cluster, v.q as qv, c.cq as cqv,
      row_number() over (partition by v.vec_id
        order by {full_dist} asc, c.cluster asc) as rn
    from q v cross join {cz} c
  ) where rn = 1
)"""
    )
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        parts.append(
            f"rm{m} as materialized (select vec_id, r[{lo}:{hi}] as q from acorp)"
        )
        parts.append(
            f"""rmd{m} as materialized (
  select vec_id, t.range as dim, q.q[t.range] as v
  from rm{m} q cross join range(1, {PQ_SUB + 1}) t
)"""
        )
        parts.append(
            f"pc{m}_0 as (select vec_id as cluster, q as cq from rm{m} "
            f"where vec_id < {PQ_K})"
        )
        for i in range(PQ_ITERS):
            parts.append(
                f"""pa{m}_{i} as materialized (
  select vec_id, cluster from (
    select v.vec_id, c.cluster,
      row_number() over (partition by v.vec_id
        order by {sub_dist} asc, c.cluster asc) as rn
    from rm{m} v cross join pc{m}_{i} c
    where v.vec_id < {IVFPQ_TRAIN_MAX}
  ) where rn = 1
)"""
            )
            parts.append(
                f"""pc{m}_{i + 1} as materialized (
  select cluster, list(comp order by dim) as cq from (
    select a.cluster, t.dim,
      cast(floor(cast(sum(t.v) as double) / count(*)) as bigint) as comp
    from pa{m}_{i} a join rmd{m} t using (vec_id)
    group by a.cluster, t.dim
  ) group by cluster
)"""
            )
        parts.append(
            f"""pf{m} as materialized (
  select vec_id, cluster as code{m} from (
    select v.vec_id, c.cluster,
      row_number() over (partition by v.vec_id
        order by {sub_dist} asc, c.cluster asc) as rn
    from rm{m} v cross join pc{m}_{PQ_ITERS} c
  ) where rn = 1
)"""
        )
    code_joins = " ".join(f"join pf{m} using (vec_id)" for m in range(PQ_M))
    code_cols = ", ".join(f"code{m}" for m in range(PQ_M))
    parts.append(
        f"codes as materialized (select a.vec_id, a.list_id, {code_cols} "
        f"from acorp a {code_joins})"
    )
    parts.append(
        f"""qp as materialized (
  select query_id, list_id, qr from (
    select v.vec_id as query_id, c.cluster as list_id,
      list_transform(range(1, {KM_DIM + 1}), i -> v.q[i] - c.cq[i]) as qr,
      row_number() over (partition by v.vec_id
        order by {full_dist} asc, c.cluster asc) as rn
    from q v cross join {cz} c
    where v.vec_id < {ANN_N_QUERIES}
  ) where rn <= {IVFPQ_PROBE}
)"""
    )
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        d = (
            "cast(list_aggregate(list_transform(range(1, %d), "
            "i -> (v.qsub[i]-c.cq[i])*(v.qsub[i]-c.cq[i])), 'sum') as bigint)"
            % (PQ_SUB + 1)
        )
        parts.append(
            f"""lut{m} as materialized (
  select v.query_id, v.list_id, c.cluster as code{m}, {d} as d{m}
  from (select query_id, list_id, qr[{lo}:{hi}] as qsub from qp) v
  cross join pc{m}_{PQ_ITERS} c
)"""
        )
    lut_joins = " ".join(
        f"join lut{m} using (query_id, list_id, code{m})" for m in range(PQ_M)
    )
    adist = " + ".join(f"d{m}" for m in range(PQ_M))
    return parts, lut_joins, adist


def oracle_ann_topk_ivfpq() -> str:
    """DuckDB replay of the ENTIRE IVF-PQ pipeline — coarse k-means
    training, residual PQ codebook training, encoding, probing, LUT
    scoring — unrolled as chained CTEs. All-integer arithmetic, so
    every code and rank matches Spark exactly."""
    parts, lut_joins, adist = _oracle_ivfpq_parts()
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select query_id, cast(rank as bigint) as rank, vec_id as neighbor_id,
       cast(adist as bigint) as adist
from (
  select query_id, vec_id, {adist} as adist,
    row_number() over (partition by query_id
      order by {adist} asc, vec_id asc) as rank
  from codes
  join (select query_id, list_id from qp) using (list_id)
  {lut_joins}
  where vec_id <> query_id
) where rank <= {ANN_TOPK}
"""
    )


# ------------------------------------- IVF-PQ exact-rerank final stage

IVFPQ_RERANK_C = 20  # PQ-approximate candidates reranked exactly per query


def ann_topk_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11 (VERDICT r10 #4): the standard production IVF-PQ serving
    shape — PQ-approximate top-C candidate pool (C = IVFPQ_RERANK_C),
    then EXACT integer distance on just those C original vectors, then
    top-k. PQ distances are lossy (codeword, not vector); reranking a
    small pool recovers most of the lost ordering at O(C) exact
    distance evaluations per query instead of O(corpus) — the accuracy
    dial every deployed IVF-PQ index runs
    (Jégou et al., §IV "re-ranking").

    Scale shape: the candidate pool (queries × C rows) is
    metadata-sized and BROADCAST into the corpus join, so the exact
    stage is one broadcast-semi pass over the vector table — point
    lookups by vec_id, never a second corpus scan per query. All
    arithmetic stays exact bigint, so the DuckDB oracle replays
    training + encode + probe + rerank value for value.
    """
    vectors, queries, pool = _ivfpq_family(spark, sf_dir)
    return _ivfpq_rerank(
        vectors, queries, pool.select("query_id", "neighbor_id")
    )


def _ivfpq_family(spark: SparkSession, sf_dir: str):
    """ONE train + encode + top-C probe shared by every IVF-PQ
    consumer: returns (vectors, queries, pool) where ``pool`` is the
    PQ-approximate top-IVFPQ_RERANK_C candidate frame (rank included —
    its rank <= ANN_TOPK prefix IS the raw PQ top-k, same ordering).
    ann_topk_ivfpq_rerank and similarity.ann_recall_report both build
    from this, so the served index and the calibration report can
    never train or probe differently (round-11 review)."""
    par = spark.sparkContext.defaultParallelism
    vectors = (
        _quantized(spark, sf_dir)
        .repartition(par, "vec_id")
        .localCheckpoint(eager=False)
    )
    coarse, codebooks = _ivfpq_train(vectors)
    codes = _ivfpq_encode(vectors, coarse, codebooks).localCheckpoint(
        eager=False
    )
    queries = vectors.where(F.col("vec_id") < ANN_N_QUERIES)
    pool = _ivfpq_search(
        queries, coarse, codebooks, codes, topk=IVFPQ_RERANK_C
    ).localCheckpoint(eager=False)
    return vectors, queries, pool


def _ivfpq_rerank(
    vectors: DataFrame, queries: DataFrame, pool: DataFrame
) -> DataFrame:
    """Exact-rerank final stage: score the (query_id, neighbor_id)
    candidate ``pool`` by exact integer distance against the original
    quantized vectors and keep the top ANN_TOPK. The pool is
    metadata-sized (queries x IVFPQ_RERANK_C), so both joins broadcast
    it - point lookups, never a second corpus scan per query."""
    exact = (
        vectors.join(
            F.broadcast(pool),
            vectors["vec_id"] == pool["neighbor_id"],
        )
        .select("query_id", "neighbor_id", F.col("q").alias("nq"))
        .join(
            F.broadcast(
                queries.select(
                    F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            _sqdist_int(F.col("qq"), F.col("nq")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_TOPK)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


def oracle_ann_topk_ivfpq_rerank() -> str:
    """Shares the full IVF-PQ CTE chain with oracle_ann_topk_ivfpq,
    then replays the rerank: top-C by asymmetric distance, exact
    integer distance on the original quantized vectors, top-k."""
    parts, lut_joins, adist = _oracle_ivfpq_parts()
    exact_dist = (
        "cast(list_aggregate(list_transform(range(1, %d), "
        "i -> (qv.q[i]-nv.q[i])*(qv.q[i]-nv.q[i])), 'sum') as bigint)"
        % (KM_DIM + 1)
    )
    parts.append(
        f"""pool as materialized (
  select query_id, vec_id from (
    select query_id, vec_id,
      row_number() over (partition by query_id
        order by {adist} asc, vec_id asc) as arank
    from codes
    join (select query_id, list_id from qp) using (list_id)
    {lut_joins}
    where vec_id <> query_id
  ) where arank <= {IVFPQ_RERANK_C}
)"""
    )
    return (
        "with "
        + ",\n".join(parts)
        + f"""
select query_id, cast(rank as bigint) as rank, neighbor_id,
       cast(dist as bigint) as dist
from (
  select p.query_id, p.vec_id as neighbor_id, {exact_dist} as dist,
    row_number() over (partition by p.query_id
      order by {exact_dist} asc, p.vec_id asc) as rank
  from pool p
  join q qv on qv.vec_id = p.query_id
  join q nv on nv.vec_id = p.vec_id
) where rank <= {ANN_TOPK}
"""
    )
