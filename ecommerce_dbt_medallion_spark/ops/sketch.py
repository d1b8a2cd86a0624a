"""Engine-portable frequency / quantile sketches.

Two sketch operators whose state is EXACT integer or fixed-order float
math, so — unlike HLL (models/events.sketch_distinct_users, rows-only
by design) — they carry full DuckDB value oracles:

- ``cms_user_counts``: a count-min sketch (Cormode & Muthukrishnan)
  over the events fact. Buckets are 2-hex-digit md5 prefixes (256
  buckets x 4 salted rows), so both engines compute identical cells
  without any hex→int conversion; counters are plain bigint sums. The
  estimate for a key is the min over its 4 cells — ≥ the true count by
  construction (asserted in tests and visible in the output).
- ``histogram_quantiles``: equi-width-histogram quantile estimation
  over the payments fact — the scale path for percentiles: two linear
  scans (min/max, then 256-bucket counts), never a global sort. The
  in-bucket linear interpolation is a fixed-order double expression,
  identical across engines.

Sketch sizing at 100 TB: CMS cells are fixed (1024 counters) at any
input size — the shuffle is at cell grain after map-side combine.
The histogram is 256 rows post-aggregation; the cumulative window runs
on those 256 rows, not the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.models.events import load_events

CMS_ROWS = 4
CMS_SALT = "#cms"

HIST_BUCKETS = 256
HIST_QUANTILES = (0.5, 0.9, 0.95, 0.99)


def _cms_bucket(col, i: int):
    """2-hex-char bucket of md5(key || salt || row) — portable string
    bucket, no integer conversion needed."""
    return F.substring(
        F.md5(F.concat(col.cast("string"), F.lit(f"{CMS_SALT}{i}"))), 1, 2
    )


def cms_cell_structs(col):
    """The (row_i, bucket) cell array for one key column — ONE
    definition of the CMS cell shape (consumed by the batch key and
    both sides of the streaming heavy-hitter key; round-9 review:
    three inline copies were a silent-drift risk)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                _cms_bucket(col, i).alias("bucket"),
            )
            for i in range(CMS_ROWS)
        ]
    )


def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch estimate vs true per-user event counts."""
    ev = load_events(spark, sf_dir).select("user_id")
    cell_structs = cms_cell_structs(F.col("user_id"))
    cells = (
        ev.select(F.explode(cell_structs).alias("rb"))
        .select("rb.row_i", "rb.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count("*").alias("cell_count"))
    )
    users = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    probes = users.select(
        "user_id", "true_count", F.explode(cell_structs).alias("rb")
    ).select("user_id", "true_count", "rb.row_i", "rb.bucket")
    return (
        probes.join(F.broadcast(cells), ["row_i", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cell_count").alias("est_count"))
        .select(
            "user_id",
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overestimate"),
        )
    )


def oracle_cms_user_counts() -> str:
    rows = ", ".join(str(i) for i in range(CMS_ROWS))
    return f"""
with ev as (select user_id from events),
salts as (select unnest([{rows}]) as row_i),
cells as (
    select s.row_i,
        substr(md5(cast(e.user_id as varchar) || '{CMS_SALT}' || s.row_i), 1, 2)
            as bucket,
        count(*) as cell_count
    from ev e cross join salts s
    group by 1, 2
),
users as (select user_id, count(*) as true_count from ev group by 1),
est as (
    select u.user_id, u.true_count, min(c.cell_count) as est_count
    from users u
    cross join salts s
    join cells c
      on c.row_i = s.row_i
     and c.bucket = substr(md5(cast(u.user_id as varchar) || '{CMS_SALT}' || s.row_i), 1, 2)
    group by 1, 2
)
select user_id, est_count, true_count,
    est_count - true_count as overestimate
from est
"""


def hist_quantile_estimates(
    values: DataFrame, quantiles, n_buckets: int
) -> DataFrame:
    """THE equi-width-histogram quantile estimator (one column ``x`` in;
    rows (p, n, est) out): for each p, target rank = ceil(p·n); walk
    the cumulative histogram to the first bucket reaching it; linearly
    interpolate inside. Error is bounded by one bucket width — the
    right trade at scale, where exact percentile means a global sort.

    ONE definition on purpose: the interpolation's expression ORDER is
    load-bearing for Spark/DuckDB bit-identity (the repo's float
    discipline), and two keys consume it — ``histogram_quantiles``
    (payments) and ``ops.lm.lm_score_source_mix`` (decile boundaries).
    A future parity fix lands here once, for both."""
    rng = F.broadcast(
        values.agg(
            F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("*").alias("n")
        )
    )
    b = F.lit(n_buckets)
    idx = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            b - 1,
            F.floor((F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * b),
        )
    )
    hist = (
        values.crossJoin(rng)
        .groupBy(idx.cast("long").alias("bucket"), "lo", "hi", "n")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "cum",
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    ps = F.explode(F.array(*[F.lit(p) for p in quantiles])).alias("p")
    hits = (
        hist.select("*", ps)
        .withColumn("target", F.ceil(F.col("p") * F.col("n")))
        .where(F.col("cum") >= F.col("target"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("p").orderBy("bucket")
            ),
        )
        .where(F.col("rn") == 1)
    )
    width = (F.col("hi") - F.col("lo")) / b
    return hits.select(
        "p",
        "n",
        (
            F.col("lo")
            + (
                F.col("bucket")
                + (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
            )
            * width
        ).alias("est"),
    )


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile estimates over payment amounts
    (:func:`hist_quantile_estimates` — the shared estimator)."""
    from ecommerce_dbt_medallion_spark.models.silver import silver_payments_for_agg

    # id-free payments path: the histogram only reads amounts, so skip
    # the payment_key row_number window over the biggest fact
    # (value-identical for amount columns; same trick as the gold marts)
    amt = (
        silver_payments_for_agg(spark, sf_dir)
        .select(F.col("payment_amount").cast("double").alias("x"))
        .localCheckpoint(eager=False)
    )
    return hist_quantile_estimates(amt, HIST_QUANTILES, HIST_BUCKETS).select(
        F.col("p").alias("quantile"),
        F.col("n").alias("n_rows"),
        F.col("est").alias("est_value"),
    )


def oracle_histogram_quantiles() -> str:
    from ecommerce_dbt_medallion_spark.oracle import assemble

    ps = ", ".join(str(p) for p in HIST_QUANTILES)
    final = f"""
, amt as (select cast(payment_amount as double) as x from silver_payments),
rng as (select min(x) as lo, max(x) as hi, count(*) as n from amt),
hist as (
    select
        cast(case when r.hi = r.lo then 0
             else least({HIST_BUCKETS} - 1,
                        floor((a.x - r.lo) / (r.hi - r.lo) * {HIST_BUCKETS}))
        end as bigint) as bucket,
        r.lo, r.hi, r.n, count(*) as cnt
    from amt a cross join rng r
    group by 1, 2, 3, 4
),
cumh as (
    select *, sum(cnt) over (order by bucket
        rows between unbounded preceding and current row) as cum
    from hist
),
hits as (
    select c.*, p.p, ceil(p.p * c.n) as target,
        row_number() over (partition by p.p order by c.bucket) as rn
    from cumh c
    cross join (select unnest([{ps}]) as p) p
    where c.cum >= ceil(p.p * c.n)
)
select p as quantile, n as n_rows,
    lo + (bucket + (target - (cum - cnt)) / cnt) * ((hi - lo) / {HIST_BUCKETS})
        as est_value
from hits where rn = 1
"""
    return assemble("silver_payments", final_select=final)


# ------------------------------------------------- mergeable quantile sketch

# Round 8 (SURVEY §2 #37c): the MERGEABLE sibling of histogram_quantiles.
# histogram_quantiles' equi-width buckets depend on the dataset's
# [min, max] — two states built over different data cannot merge. This
# sketch's buckets are FIXED (data-independent): exact for 0..9, then
# 90 per decimal decade keyed by (digit count, two leading digits) of
# the integer cents — HdrHistogram's decimal idea. Properties:
#  - state is a bounded count vector (≤ ~1300 cells for bigint cents):
#    per-partition states merge by ELEMENTWISE SUM, the same combine
#    HLL registers use in sketch_user_overlap — streaming/cross-shard
#    compatible, associative and commutative by construction;
#  - relative value error ≤ ~1/20 (one bucket spans [d, d+1) of the
#    two leading digits), independent of data size;
#  - everything is integer/string math both engines share — no libm,
#    no float accumulation — so the key is fully hash-gated.
QSK_QUANTILES = ((50, 100), (90, 100), (95, 100), (99, 100))


def _qsk_bucket(cents):
    """Fixed bucket id of non-negative integer ``cents``: 0..9 exact,
    then (digits-2)*90 + (lead2-10) + 11."""
    s = cents.cast("string")
    d = F.length(s)
    lead2 = F.substring(s, 1, 2).cast("int")
    return F.when(cents <= 9, cents.cast("int")).otherwise(
        (d - 2) * 90 + (lead2 - 10) + 11
    )


def _qsk_lower(bucket):
    """Deterministic representative (bucket LOWER bound) — two leading
    digits re-padded with zeros via string math (no float pow)."""
    nzeros = F.floor((bucket - 11) / 90).cast("int")
    lead2 = ((bucket - 11) % 90 + 10).cast("int")
    return F.when(bucket <= 9, bucket.cast("bigint")).otherwise(
        F.concat(lead2.cast("string"), F.repeat(F.lit("0"), nzeros)).cast("bigint")
    )


def quantile_sketch_state(df: DataFrame, cents_col: str, group_cols: list[str]) -> DataFrame:
    """Build the sketch STATE: one (group, bucket, cnt) row per occupied
    cell. States over disjoint data (partitions, micro-batches, shards)
    merge with :func:`merge_sketch_states` — a groupBy-sum, i.e.
    elementwise vector addition."""
    return (
        df.select(*group_cols, _qsk_bucket(F.col(cents_col)).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_sketch_states(*states: DataFrame) -> DataFrame:
    """Elementwise combine of sketch states sharing a group schema."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    gcols = [c for c in out.columns if c not in ("bucket", "cnt")]
    return out.groupBy(*gcols, "bucket").agg(F.sum("cnt").alias("cnt"))


def _qsk_quantiles_from_state(state: DataFrame, group_col: str) -> DataFrame:
    """Extract the fixed quantile set from a state: integer target rank
    r = ceil(q·n) against the bucket-ordered cumulative count; the
    estimate is the first admitting bucket's lower bound. ONE pass over
    the state (≤1300 rows per group, never the fact): the quantile set
    is a broadcast 4-row table cross-joined in, not a 4-way plan union —
    the union shape re-scanned the SOURCE once per quantile
    (plan-audited, round 8)."""
    spark = state.sparkSession
    w = Window.partitionBy(group_col).orderBy("bucket")
    cum = state.select(
        group_col,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(group_col)).alias("n"),
    )
    qdf = spark.createDataFrame(
        [(num, den, num / 100.0) for num, den in QSK_QUANTILES],
        "qnum int, qden int, q double",
    )
    # ceil(qnum*n/qden) in pure integers: (qnum*n + qden - 1) div qden
    return (
        cum.join(F.broadcast(qdf))
        .where(F.col("cum") >= F.expr("(qnum * n + qden - 1) div qden"))
        .groupBy(group_col, "q", "n")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            group_col,
            "q",
            F.col("n").cast("long").alias("n"),
            _qsk_lower(F.col("bucket")).alias("est_cents"),
        )
    )


def quantile_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#37c: per-priority order-value quantiles from MERGEABLE sketch
    states, plus an ALL row over the merged global state.

    Plan shape (audited round 8): ONE fact scan — each row contributes
    its cell to both its own group and the ALL group via a constant
    2-element explode, and map-side partial aggregation reduces the
    exchange to ≤ 2× the state's cell count before the shuffle. The
    resulting ALL cells are BY CONSTRUCTION the elementwise sum of the
    per-group states (the same algebra :func:`merge_sketch_states`
    applies to independently-built shards — exercised directly by the
    merge-associativity property test)."""
    from ecommerce_dbt_medallion_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        # the repo's exact-money recipe: double → decimal(18,2) (HALF_UP
        # in both engines) → integer cents
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    both = quantile_sketch_state(
        orders.select(
            F.explode(F.array(F.col("grp"), F.lit("ALL"))).alias("grp"),
            "cents",
        ),
        "cents",
        ["grp"],
    )
    return _qsk_quantiles_from_state(both, "grp").orderBy("grp", "q")


def oracle_quantile_sketch_mergeable() -> str:
    qvals = ", ".join(f"({num}, {den}, {num / 100.0})" for num, den in QSK_QUANTILES)
    return f"""
with base as (
    select o_orderpriority as grp,
        cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents
    from orders
),
bucketed as (
    select grp,
        case when cents <= 9 then cast(cents as int)
             else (length(cast(cents as varchar)) - 2) * 90
                  + (cast(substr(cast(cents as varchar), 1, 2) as int) - 10) + 11
        end as bucket
    from base
),
state as (
    select grp, bucket, count(*) as cnt from bucketed group by grp, bucket
),
merged as (
    select grp, bucket, cnt from state
    union all
    select 'ALL' as grp, bucket, sum(cnt) as cnt from state group by bucket
),
cum as (
    select grp, bucket,
        sum(cnt) over (partition by grp order by bucket) as cum,
        sum(cnt) over (partition by grp) as n
    from merged
),
q(qnum, qden, q) as (values {qvals}),
hit as (
    select grp, q, n, min(bucket) as bucket
    from cum cross join q
    where cum >= (qnum * n + qden - 1) // qden
    group by grp, q, n
)
select grp, q, cast(n as bigint) as n,
    case when bucket <= 9 then cast(bucket as bigint)
         else cast(
            cast((bucket - 11) % 90 + 10 as varchar)
            || repeat('0', (bucket - 11) // 90) as bigint)
    end as est_cents
from hit
order by grp, q
"""
