"""Extended star-schema analytics over the full testdata schema.

The medallion models cover the e-commerce core (customers/orders/
payments); these marts exercise the remaining dimension tables the way a
warehouse user would — and demonstrate the explicit ``broadcast()`` path
for provably-small dims (region: 5 rows, nation: 25 — broadcast is
correct at ANY fact scale, unlike the data-dependent AQE broadcasts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.sources.registry import load_table



def _discounted_rev():
    """The exact-decimal discounted revenue expression —
    extendedprice(18,2) x (1 - discount(4,2)) widened to (18,4). These
    PRECISIONS are the cross-engine contract (the oracles restate them
    digit for digit); one definition, not eight copies (round-7
    review)."""
    return (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")


def sales_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by customer region/nation: lineitem ⋈ orders ⋈ customer ⋈
    broadcast(nation ⋈ region). One fact shuffle per join key; the dim
    side never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
    rev = _discounted_rev()
    return (
        li.select("l_orderkey", rev.alias("rev_dec"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("region_name", "nation_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum("rev_dec").alias("rev_sum_dec"),
        )
        .select(
            "region_name",
            "nation_name",
            "n_lineitems",
            "n_orders",
            F.col("rev_sum_dec").cast("double").alias("total_revenue"),
            (F.col("rev_sum_dec").cast("double") / F.col("n_lineitems")).alias("avg_lineitem_revenue"),
        )
    )


ORACLE_SALES_BY_REGION = """
select
    r.r_name as region_name,
    n.n_name as nation_name,
    count(*) as n_lineitems,
    count(distinct l.l_orderkey) as n_orders,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
          * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))) as double) as total_revenue,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
          * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))) as double) / count(*) as avg_lineitem_revenue
from lineitem l
join orders o on l.l_orderkey = o.o_orderkey
join customer c on o.o_custkey = c.c_custkey
join nation n on c.c_nationkey = n.n_nationkey
join region r on n.n_regionkey = r.r_regionkey
group by r.r_name, n.n_name
"""


def supplier_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part type and supplier nation — the supplier-side
    rollup (part is broadcastable at these SFs; at 100 TB part scales
    with catalog size, so it stays a shuffle join — only nation is
    explicitly broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", F.col("n_name").alias("supplier_nation")
        )
    )
    rev = _discounted_rev()
    return (
        li.select("l_partkey", "l_suppkey", rev.alias("rev_dec"), F.col("l_quantity"))
        .join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_type", "supplier_nation")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"),
            F.sum("rev_dec").alias("rev_sum_dec"),
        )
        .select(
            F.col("p_type").alias("part_type"),
            "supplier_nation",
            "n_lineitems",
            F.col("qty_dec").cast("double").alias("total_quantity"),
            F.col("rev_sum_dec").cast("double").alias("total_revenue"),
        )
    )


ORACLE_SUPPLIER_PART_REVENUE = """
select
    p.p_type as part_type,
    n.n_name as supplier_nation,
    count(*) as n_lineitems,
    cast(sum(cast(l.l_quantity as decimal(18,2))) as double) as total_quantity,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
          * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))) as double) as total_revenue
from lineitem l
join part p on l.l_partkey = p.p_partkey
join supplier s on l.l_suppkey = s.s_suppkey
join nation n on s.s_nationkey = n.n_nationkey
group by p.p_type, n.n_name
"""


def customer_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-customer order-value distribution (median / p90 / IQR).

    Exercises Spark's exact median/percentile aggregates (sort-based
    within each group; at 100 TB this is the same single shuffle as any
    customer-grain aggregate — approx_percentile is the knob if exact
    order statistics aren't required). Verified bit-identical to DuckDB's
    median/quantile_cont.

    KNOWN deviation from the repo's rank-based-order-statistics
    convention (SURVEY §3): this key deliberately exercises the
    BUILTIN percentile aggregates and has been hash-identical to
    quantile_cont at three SFs across two driver rounds — both engines
    interpolate lower + frac·(higher−lower) on exact doubles. If an
    engine upgrade ever flips a ulp here, the fix is the
    shipping_delay_stats cumulative-count recipe.
    """
    from ecommerce_dbt_medallion_spark.models.silver import silver_orders

    amt = F.col("order_amount").cast("double")
    return (
        silver_orders(spark, sf_dir)
        .groupBy("customer_key")
        .agg(
            F.count("order_key").alias("n_orders"),
            F.median(amt).alias("median_order_value"),
            F.percentile(amt, F.lit(0.25)).alias("p25_order_value"),
            F.percentile(amt, F.lit(0.9)).alias("p90_order_value"),
        )
        .select(
            "customer_key",
            "n_orders",
            "median_order_value",
            "p25_order_value",
            "p90_order_value",
            (F.col("p90_order_value") - F.col("p25_order_value")).alias("p25_p90_spread"),
        )
    )


ORACLE_CUSTOMER_ORDER_PERCENTILES_FINAL = """
select
    customer_key,
    count(order_key) as n_orders,
    median(cast(order_amount as double)) as median_order_value,
    quantile_cont(cast(order_amount as double), 0.25) as p25_order_value,
    quantile_cont(cast(order_amount as double), 0.9) as p90_order_value,
    quantile_cont(cast(order_amount as double), 0.9)
        - quantile_cont(cast(order_amount as double), 0.25) as p25_p90_spread
from silver_orders
group by customer_key
"""


N_PROMOS = 20
PROMO_SPACING_DAYS = 120
PROMO_LENGTH_DAYS = 45


def range_join_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: orders attributed to synthetic promotion
    windows (order_date BETWEEN promo_start AND promo_end).

    Spark would execute a raw range predicate as BroadcastNestedLoopJoin —
    fine for 20 promos, quadratic at a million intervals. The scalable
    formulation used here BINS both sides to months: each promo explodes
    to its covered month bins, orders join on month-bin EQUALITY first
    (hash join), then the exact BETWEEN filters within the bin. Promos
    are deterministic (fixed epoch + spacing) so DuckDB reproduces them.
    """
    promos = spark.range(N_PROMOS).select(
        F.col("id").alias("promo_id"),
        F.date_add(F.lit("1992-01-01").cast("date"),
                   (F.col("id") * PROMO_SPACING_DAYS).cast("int")).alias("promo_start"),
        F.date_add(F.lit("1992-01-01").cast("date"),
                   (F.col("id") * PROMO_SPACING_DAYS + PROMO_LENGTH_DAYS).cast("int")).alias("promo_end"),
    )
    promo_bins = promos.select(
        "*",
        F.explode(
            F.sequence(
                F.trunc("promo_start", "month"),
                F.trunc("promo_end", "month"),
                F.expr("interval 1 month"),
            )
        ).alias("month_bin"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount_dec"),
    ).withColumn("month_bin", F.trunc("order_date", "month"))

    joined = orders.join(F.broadcast(promo_bins), "month_bin").where(
        (F.col("order_date") >= F.col("promo_start"))
        & (F.col("order_date") <= F.col("promo_end"))
    )
    return (
        joined.groupBy("promo_id", "promo_start", "promo_end")
        .agg(
            F.count("order_id").alias("n_orders"),
            F.sum("amount_dec").alias("rev_dec"),
        )
        .select(
            "promo_id",
            "promo_start",
            "promo_end",
            "n_orders",
            F.col("rev_dec").cast("double").alias("promo_revenue"),
        )
    )


ORACLE_RANGE_JOIN_PROMO_REVENUE = f"""
with promos as (
    select
        r.range as promo_id,
        DATE '1992-01-01' + to_days(cast(r.range * {PROMO_SPACING_DAYS} as int)) as promo_start,
        DATE '1992-01-01' + to_days(cast(r.range * {PROMO_SPACING_DAYS} + {PROMO_LENGTH_DAYS} as int)) as promo_end
    from range({N_PROMOS}) r
)
select
    p.promo_id,
    p.promo_start,
    p.promo_end,
    count(o.o_orderkey) as n_orders,
    cast(sum(cast(o.o_totalprice as decimal(18,2))) as double) as promo_revenue
from orders o
join promos p
  on cast(o.o_orderdate as date) between p.promo_start and p.promo_end
group by p.promo_id, p.promo_start, p.promo_end
"""


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS mart: revenue at nation, region, and grand-total
    grains in ONE aggregation pass (``rollup`` — Catalyst expands the
    grouping sets before the single shuffle; three separate groupBys
    would scan the fact three times).

    grouping_id() (bitmask, identical semantics in DuckDB) labels the
    grain; collapsed keys surface as 'ALL' so the output is null-free.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
    rev = _discounted_rev()
    return (
        li.select("l_orderkey", rev.alias("rev_dec"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("region_name", "nation_name")
        .agg(
            F.grouping_id().cast("long").alias("grain"),
            F.count("*").alias("n_lineitems"),
            F.sum("rev_dec").alias("rev_sum_dec"),
        )
        .select(
            F.coalesce("region_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("nation_name", F.lit("ALL")).alias("nation_name"),
            "grain",
            "n_lineitems",
            F.col("rev_sum_dec").cast("double").alias("total_revenue"),
        )
    )


ORACLE_SALES_ROLLUP = """
select
    coalesce(r.r_name, 'ALL') as region_name,
    coalesce(n.n_name, 'ALL') as nation_name,
    cast(grouping_id(r.r_name, n.n_name) as bigint) as grain,
    count(*) as n_lineitems,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
          * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))) as double) as total_revenue
from lineitem l
join orders o on l.l_orderkey = o.o_orderkey
join customer c on o.o_custkey = c.c_custkey
join nation n on c.c_nationkey = n.n_nationkey
join region r on n.n_regionkey = r.r_regionkey
group by rollup(r.r_name, n.n_name)
"""


TOP_PARTS_K = 5


def top_parts_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 parts by revenue per supplier region.

    Aggregates the fact to (region, part) grain FIRST (one shuffle), then
    ranks with the two-stage salted top-k (ops.topk) — with only 5
    regions, a naive per-region window would funnel every part through 5
    partitions at 100 TB. The part-name join runs AFTER ranking, when the
    left side is 25 rows (AQE broadcasts it against the full part table).

    Revenue ranking compares exact decimals (engine-portable); ties break
    on part_key.
    """
    from ecommerce_dbt_medallion_spark.ops.topk import top_k_per_group

    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", F.col("r_name").alias("region_name")
        )
    )
    rev = _discounted_rev()
    by_part = (
        li.select("l_suppkey", "l_partkey", rev.alias("rev_dec"))
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("region_name", "l_partkey")
        .agg(F.count("*").alias("n_lineitems"), F.sum("rev_dec").alias("rev_dec"))
    )
    ranked = top_k_per_group(
        by_part,
        ["region_name"],
        [F.desc("rev_dec"), F.asc("l_partkey")],
        F.col("l_partkey"),
        TOP_PARTS_K,
        rank_alias="part_rank",
    )
    return (
        ranked.join(part.select("p_partkey", "p_name"), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "region_name",
            F.col("l_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            "part_rank",
            "n_lineitems",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


ORACLE_TOP_PARTS_PER_REGION = f"""
with by_part as (
    select
        r.r_name as region_name,
        l.l_partkey,
        count(*) as n_lineitems,
        sum(cast(cast(l.l_extendedprice as decimal(18,2))
            * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))) as rev_dec
    from lineitem l
    join supplier s on l.l_suppkey = s.s_suppkey
    join nation n on s.s_nationkey = n.n_nationkey
    join region r on n.n_regionkey = r.r_regionkey
    group by r.r_name, l.l_partkey
),
ranked as (
    select *, cast(row_number() over (
        partition by region_name order by rev_dec desc, l_partkey
    ) as bigint) as part_rank
    from by_part
)
select
    b.region_name,
    b.l_partkey as part_key,
    p.p_name as part_name,
    b.part_rank,
    b.n_lineitems,
    cast(b.rev_dec as double) as total_revenue
from ranked b
join part p on b.l_partkey = p.p_partkey
where b.part_rank <= {TOP_PARTS_K}
"""


STD_METHODS = [
    "credit_card",
    "bank_transfer",
    "paypal",
    "cash",
    "digital_wallet",
    "other",
]


def payment_method_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly payments reshaped wide: one column pair (amount, count)
    per standardized method — the pivot operator over the biggest fact.

    ``pivot`` is given the EXPLICIT method list: without it Spark runs an
    extra collect-distinct pass over the fact to discover the columns
    (a full scan at 100 TB) and the output schema becomes data-dependent.
    With the list, the pivot lowers to one shuffle at month grain with
    map-side partial aggregation per (month, method) — same cost as the
    long-format groupBy. Uses the id-free payments path (aggregation-only
    consumer; value-identical, skips the payment_key window over the
    fact).
    """
    from ecommerce_dbt_medallion_spark.models.silver import silver_payments_for_agg

    p = silver_payments_for_agg(spark, sf_dir).select(
        F.date_format("payment_date", "yyyy-MM").alias("payment_month"),
        "payment_method",
        F.col("payment_amount").alias("amount_dec"),
    )
    wide = (
        p.groupBy("payment_month")
        .pivot("payment_method", STD_METHODS)
        .agg(
            F.sum("amount_dec").alias("amount"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    cols = [F.col("payment_month")]
    for m in STD_METHODS:
        cols.append(
            F.coalesce(F.col(f"{m}_amount"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias(f"{m}_amount")
        )
        cols.append(F.coalesce(F.col(f"{m}_n"), F.lit(0)).cast("long").alias(f"{m}_n"))
    return wide.select(*cols)


def _pivot_oracle_cols() -> str:
    parts = []
    for m in STD_METHODS:
        parts.append(
            f"cast(coalesce(sum(case when payment_method = '{m}' "
            f"then payment_amount end), 0) as double) as {m}_amount"
        )
        parts.append(
            f"cast(count(case when payment_method = '{m}' then 1 end) "
            f"as bigint) as {m}_n"
        )
    return ",\n    ".join(parts)


def oracle_payment_method_pivot() -> str:
    from ecommerce_dbt_medallion_spark.oracle import assemble

    return assemble(
        "silver_payments",
        final_select=f"""
select strftime(payment_date, '%Y-%m') as payment_month,
    {_pivot_oracle_cols()}
from silver_payments
group by 1
""",
    )


ANOMALY_WINDOW_DAYS = 28
ANOMALY_MIN_DAYS = 14
ANOMALY_Z = 2.0


def revenue_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue anomaly detection: z-score over the trailing 28
    OBSERVED days of the completed-order revenue series.

    Window semantics (deliberate, round-7 review): the frame is
    ROW-based over the daily aggregate, so calendar days with zero
    completed orders do not enter the statistic and a gap stretches the
    wall-clock span beyond 28 days — "trailing 28 trading days", the
    convention financial rolling stats use. The zero-filled calendar
    variant is what `revenue_date_spine` exists to feed; both oracles
    mirror their Spark side exactly.

    Cross-engine float discipline: stddev()/var_samp() are NOT portable
    (Welford vs naive accumulation order), so the rolling moments are
    computed from EXACT integer cents — sum(cents) and sum(cents²) over
    the window are exact (bigint / decimal(38,0)) — and only then
    converted to double for mean/variance/sqrt in a fixed expression
    order both engines evaluate identically. The window runs AFTER
    date-grain aggregation (window input = days, not the fact), the
    standard bounded-window pattern.
    """
    from pyspark.sql import Window

    from ecommerce_dbt_medallion_spark.models.silver import silver_orders

    daily = (
        silver_orders(spark, sf_dir)
        .where(F.col("is_completed"))
        .groupBy("order_date")
        .agg(F.sum("order_amount").alias("rev_dec"))
        .select(
            "order_date",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.expr("cast(rev_dec * 100 as decimal(19,0))").alias("cents_dec"),
            F.expr("cast(cast(rev_dec * 100 as decimal(19,0)) as bigint)").alias(
                "cents"
            ),
        )
    )
    w = Window.orderBy("order_date").rowsBetween(-(ANOMALY_WINDOW_DAYS - 1), 0)
    wdw = daily.select(
        "order_date",
        "revenue",
        "cents",
        F.sum("cents").over(w).cast("double").alias("sum_c"),
        F.sum(F.col("cents_dec") * F.col("cents_dec")).over(w).cast("double").alias(
            "sumsq"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("n_window"),
    )
    mean = F.col("sum_c") / F.col("n_window")
    var = F.col("sumsq") / F.col("n_window") - mean * mean
    z = F.when(
        (var > 0) & (F.col("n_window") >= ANOMALY_MIN_DAYS),
        (F.col("cents").cast("double") - mean) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return wdw.select(
        "order_date",
        "revenue",
        "n_window",
        z.alias("zscore"),
        (F.abs(z) > ANOMALY_Z).alias("is_anomaly"),
    )


ORACLE_REVENUE_ANOMALY_FINAL = f"""
, daily as (
    select order_date, sum(order_amount) as rev_dec
    from silver_orders where is_completed group by order_date
),
c as (
    select order_date,
        cast(rev_dec as double) as revenue,
        cast(rev_dec * 100 as decimal(19,0)) as cents_dec,
        cast(cast(rev_dec * 100 as decimal(19,0)) as bigint) as cents
    from daily
),
wdw as (
    select order_date, revenue, cents,
        cast(sum(cents) over w as double) as sum_c,
        cast(sum(cents_dec * cents_dec) over w as double) as sumsq,
        cast(count(*) over w as bigint) as n_window
    from c
    window w as (order by order_date
                 rows between {ANOMALY_WINDOW_DAYS - 1} preceding and current row)
),
z as (
    select order_date, revenue, n_window,
        case when (sumsq / n_window - (sum_c / n_window) * (sum_c / n_window)) > 0
                  and n_window >= {ANOMALY_MIN_DAYS}
             then (cast(cents as double) - sum_c / n_window)
                  / sqrt(sumsq / n_window - (sum_c / n_window) * (sum_c / n_window))
             else cast(0.0 as double)
        end as zscore
    from wdw
)
select order_date, revenue, n_window, zscore,
    abs(zscore) > {ANOMALY_Z} as is_anomaly
from z
"""


REACTIVATION_GAP_DAYS = 90


def customer_ltv_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order running lifetime value + inter-order gap analysis:
    order sequence number, cumulative revenue, days since the previous
    order, and a reactivation flag (gap > REACTIVATION_GAP_DAYS).

    One shuffle on o_custkey; all three windows (row_number, running
    sum, lag) share the identical (custkey, date, orderkey) sort, so
    Spark evaluates them in a single Window physical node. Running sums
    are exact decimal; the double conversion happens once per output
    row. Scale: partition = customer (bounded order counts), no global
    sort anywhere.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount_dec"),
    )
    w = Window.partitionBy("o_custkey").orderBy("order_date", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_date = F.lag("order_date").over(w)
    gap = F.datediff(F.col("order_date"), prev_date)
    return orders.select(
        F.col("o_custkey").alias("customer_key"),
        F.col("o_orderkey").alias("order_key"),
        "order_date",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.col("amount_dec").cast("double").alias("order_amount"),
        F.sum("amount_dec").over(wsum).cast("double").alias("ltv_running"),
        gap.cast("long").alias("days_since_prev"),
        F.coalesce(gap > REACTIVATION_GAP_DAYS, F.lit(False)).alias("reactivated"),
    )


ORACLE_CUSTOMER_LTV_RUNNING = f"""
select
    o_custkey as customer_key,
    o_orderkey as order_key,
    cast(o_orderdate as date) as order_date,
    cast(row_number() over w as bigint) as order_seq,
    cast(cast(o_totalprice as decimal(18,2)) as double) as order_amount,
    cast(sum(cast(o_totalprice as decimal(18,2))) over (
        partition by o_custkey order by cast(o_orderdate as date), o_orderkey
        rows between unbounded preceding and current row
    ) as double) as ltv_running,
    cast(date_diff('day',
        lag(cast(o_orderdate as date)) over w,
        cast(o_orderdate as date)) as bigint) as days_since_prev,
    coalesce(date_diff('day',
        lag(cast(o_orderdate as date)) over w,
        cast(o_orderdate as date)) > {REACTIVATION_GAP_DAYS}, false) as reactivated
from orders
window w as (partition by o_custkey order by cast(o_orderdate as date), o_orderkey)
"""


def revenue_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily revenue: a generated date spine (dbt_utils.
    date_spine parity) left-joined to the daily order aggregate, zero-
    filled with an activity flag.

    The spine is sequence(min_date, max_date) exploded from the 1-row
    bounds aggregate — rows = days, data-independent of fact size; the
    daily aggregate is the only fact shuffle. At 100 TB the spine side
    is broadcast against the (tiny, post-agg) daily table.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount_dec"),
    )
    daily = orders.groupBy("order_date").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("amount_dec").alias("rev_dec"),
    )
    spine = (
        orders.agg(
            F.min("order_date").alias("d0"), F.max("order_date").alias("d1")
        )
        .select(
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    return (
        spine.join(daily, spine.day == daily.order_date, "left")
        .select(
            "day",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce(F.col("rev_dec").cast("double"), F.lit(0.0)).alias("revenue"),
            F.col("order_date").isNotNull().alias("has_orders"),
        )
    )


ORACLE_REVENUE_DATE_SPINE = """
with daily as (
    select cast(o_orderdate as date) as order_date,
        count(*) as n_orders,
        sum(cast(o_totalprice as decimal(18,2))) as rev_dec
    from orders
    group by 1
), bounds as (
    select min(cast(o_orderdate as date)) as d0, max(cast(o_orderdate as date)) as d1
    from orders
), spine as (
    select cast(unnest(generate_series(d0, d1, interval 1 day)) as date) as day
    from bounds
)
select s.day,
    cast(coalesce(d.n_orders, 0) as bigint) as n_orders,
    coalesce(cast(d.rev_dec as double), cast(0.0 as double)) as revenue,
    d.order_date is not null as has_orders
from spine s left join daily d on s.day = d.order_date
"""


# ------------------------------------------- SCD2 point-in-time join
# The canonical versioned-dimension lookup (dbt snapshot consumption
# side — runner.snapshot_scd2 builds such tables; this is the query
# that USES one): each fact row joins to the dimension version valid at
# its event date. Reference analogue: dbt snapshots (snapshots/ dir,
# check strategy) + every Kimball SCD2 mart.

# At or below the corpus's min o_orderdate (TPC-H: 1992-01-01) so
# version 0 covers EVERY fact row — the old 1994 epoch silently dropped
# two years of orders from the point-in-time join (round-7 review; the
# oracle shared the constant so parity hid it). One shared constant,
# interpolated into both engines.
SCD2_EPOCH = "1992-01-01"


def _scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized SCD2 customer-tier dimension: 1-3 versions per
    customer with deterministic custkey-derived validity windows (the
    same synthesis the DuckDB oracle re-states, so the join is fully
    value-checkable)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    n_last = (F.col("c_custkey") % 3).cast("int")
    dim = cust.select(
        "c_custkey",
        F.explode(F.sequence(F.lit(0), n_last)).alias("version_seq"),
    )
    base = F.to_date(F.lit(SCD2_EPOCH))
    step = (F.col("c_custkey") % 250 + 500).cast("int")
    return dim.select(
        "c_custkey",
        F.col("version_seq").cast("long").alias("version_seq"),
        F.date_add(base, F.col("version_seq") * step).alias("valid_from"),
        F.when(
            F.col("version_seq") < (F.col("c_custkey") % 3).cast("int"),
            F.date_add(base, (F.col("version_seq") + 1) * step),
        ).alias("valid_to"),
        F.concat(
            F.lit("tier_"), ((F.col("c_custkey") + F.col("version_seq")) % 5).cast("string")
        ).alias("tier"),
    )


def scd2_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every order picks the customer-tier version
    valid at its order date.

    Scale shape: EQUI-join on custkey (versions per key bounded by the
    dimension's churn, here <= 3) with the validity range as a residual
    filter — a key-partitioned hash/SMJ join, never a range-explosion
    BroadcastNestedLoopJoin. Exactly one version matches per fact row,
    so output cardinality = fact cardinality.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("order_date")
    )
    dim = _scd2_customer_dim(spark, sf_dir)
    return (
        orders.join(
            dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("order_date") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("order_date") < F.col("valid_to"))),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "order_date",
            "version_seq",
            "tier",
            F.datediff("order_date", "valid_from").cast("long").alias(
                "days_into_version"
            ),
        )
    )


ORACLE_SCD2_CUSTOMER_ORDERS = f"""
with dim as (
    select c_custkey,
        unnest(range(0, cast(c_custkey % 3 as int) + 1)) as version_seq
    from customer
),
v as (
    select c_custkey,
        cast(version_seq as bigint) as version_seq,
        date '{SCD2_EPOCH}' + cast(version_seq * (c_custkey % 250 + 500) as int)
            as valid_from,
        case when version_seq < c_custkey % 3
             then date '{SCD2_EPOCH}'
                  + cast((version_seq + 1) * (c_custkey % 250 + 500) as int)
        end as valid_to,
        'tier_' || cast((c_custkey + version_seq) % 5 as varchar) as tier
    from dim
)
select o.o_orderkey, o.o_custkey,
    cast(o.o_orderdate as date) as order_date,
    v.version_seq, v.tier,
    cast(date_diff('day', v.valid_from, cast(o.o_orderdate as date)) as bigint)
        as days_into_version
from orders o
join v on o.o_custkey = v.c_custkey
 and cast(o.o_orderdate as date) >= v.valid_from
 and (v.valid_to is null or cast(o.o_orderdate as date) < v.valid_to)
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary over lineitem: per
    (returnflag, linestatus), quantity/price/discount/charge rollups
    with averages, for lineitems shipped on or before the dataset's
    max shipdate minus 7 days (an as-of cutoff relative to the data,
    like the churn mart's BATCH_TS discipline — no wall-clock).

    The canonical one-pass scan-bound aggregate: every measure partially
    aggregates map-side; sums are exact decimals (charge at
    decimal(18,6): price(16,2) × disc(4,2) × tax(4,2) products stay
    exact), averages are single double divisions of exact sums —
    bit-portable. Group cardinality is the 6-cell flag×status matrix.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = li.agg(
        F.date_sub(F.max(F.to_date("l_shipdate")), 7).alias("cut")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.crossJoin(F.broadcast(cutoff))
        .where(F.to_date("l_shipdate") <= F.col("cut"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty_dec"),
            F.sum(price).alias("sum_base_dec"),
            F.sum((price * (F.lit(1) - disc)).cast("decimal(18,4)")).alias(
                "sum_disc_dec"
            ),
            F.sum(
                (price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("decimal(18,6)")
            ).alias("sum_charge_dec"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
            F.col("sum_base_dec").cast("double").alias("sum_base_price"),
            F.col("sum_disc_dec").cast("double").alias("sum_disc_price"),
            F.col("sum_charge_dec").cast("double").alias("sum_charge"),
            (F.col("sum_qty_dec").cast("double") / F.col("count_order")).alias(
                "avg_qty"
            ),
            (F.col("sum_base_dec").cast("double") / F.col("count_order")).alias(
                "avg_price"
            ),
            "count_order",
        )
    )


ORACLE_PRICING_SUMMARY = """
with cut as (
    select cast(max(cast(l_shipdate as date)) - interval 7 day as date) as c
    from lineitem
)
select
    l_returnflag,
    l_linestatus,
    cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
    cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_base_price,
    cast(sum(cast(cast(l_extendedprice as decimal(18,2))
        * (1 - cast(l_discount as decimal(4,2))) as decimal(18,4))) as double)
        as sum_disc_price,
    cast(sum(cast(cast(l_extendedprice as decimal(18,2))
        * (1 - cast(l_discount as decimal(4,2)))
        * (1 + cast(l_tax as decimal(4,2))) as decimal(18,6))) as double)
        as sum_charge,
    cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*) as avg_qty,
    cast(sum(cast(l_extendedprice as decimal(18,2))) as double) / count(*)
        as avg_price,
    count(*) as count_order
from lineitem, cut
where cast(l_shipdate as date) <= cut.c
group by 1, 2
"""


def shipping_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority: exact
    bigint day gaps (l_shipdate − o_orderdate) rolled up to the bounded
    priority domain, with an explicit rank-based median (the winsorized
    mart's portable order-statistic recipe, value-grain like
    source_length_profile — delays span a bounded day range, so the
    median window is calendar-bounded no matter the fact scale).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    gaps = li.select("l_orderkey", F.to_date("l_shipdate").alias("ship_d")).join(
        orders.select(
            "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("ord_d")
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff("ship_d", "ord_d").cast("bigint").alias("delay"),
    )
    cnt = gaps.groupBy("o_orderpriority", "delay").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("delay")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cnt.withColumn("cum", F.sum("c").over(w))
    tot = gaps.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("delay").alias("min_delay"),
        F.max("delay").alias("max_delay"),
        F.sum("delay").alias("sum_delay"),
    )
    med = (
        cum.join(F.broadcast(tot.select("o_orderpriority", "n")), "o_orderpriority")
        .where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("o_orderpriority")
        .agg(F.min("delay").alias("median_delay"))
    )
    return tot.join(med, "o_orderpriority").select(
        "o_orderpriority",
        F.col("n").alias("n_lineitems"),
        "min_delay",
        "median_delay",
        "max_delay",
        (F.col("sum_delay").cast("double") / F.col("n").cast("double")).alias(
            "avg_delay"
        ),
    )


ORACLE_SHIPPING_DELAY_STATS = """
with gaps as materialized (
    select o.o_orderpriority,
        cast(datediff('day', cast(o.o_orderdate as date),
                      cast(l.l_shipdate as date)) as bigint) as delay
    from lineitem l join orders o on l.l_orderkey = o.o_orderkey
),
cnt as (
    select o_orderpriority, delay, count(*) as c from gaps group by 1, 2
),
cum as (
    select o_orderpriority, delay,
        sum(c) over (partition by o_orderpriority order by delay
                     rows between unbounded preceding and current row) as cum
    from cnt
),
tot as materialized (
    select o_orderpriority, count(*) as n, min(delay) as min_delay,
        max(delay) as max_delay, sum(delay) as sum_delay
    from gaps group by 1
),
med as (
    select c.o_orderpriority, min(c.delay) as median_delay
    from cum c join tot t on c.o_orderpriority = t.o_orderpriority
    where c.cum >= (t.n + 1) // 2
    group by 1
)
select t.o_orderpriority, t.n as n_lineitems, t.min_delay, m.median_delay,
    t.max_delay,
    cast(t.sum_delay as double) / cast(t.n as double) as avg_delay
from tot t join med m on t.o_orderpriority = m.o_orderpriority
"""


def basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size histogram: how many orders contain s distinct parts,
    with each size's share of all orders — the merchandising view of
    basket composition (and the empirical justification for the
    bounded-fanout claim the co-purchase self-join relies on).

    Two partial-aggregated shuffles, both shrinking: order grain then
    size grain (size domain is single digits); share is exact bigints,
    one double division.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sizes = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("basket_size"))
    )
    dist = sizes.groupBy("basket_size").agg(F.count(F.lit(1)).alias("n_orders"))
    total = sizes.agg(F.count(F.lit(1)).alias("n_total"))
    return dist.crossJoin(F.broadcast(total)).select(
        F.col("basket_size").cast("long").alias("basket_size"),
        "n_orders",
        (F.col("n_orders").cast("double") / F.col("n_total").cast("double")).alias(
            "share"
        ),
    )


ORACLE_BASKET_SIZE_DISTRIBUTION = """
with sizes as materialized (
    select l_orderkey, count(distinct l_partkey) as basket_size
    from lineitem group by 1
),
dist as (select basket_size, count(*) as n_orders from sizes group by 1),
total as (select count(*) as n_total from sizes)
select cast(basket_size as bigint) as basket_size, n_orders,
    cast(n_orders as double) / cast(n_total as double) as share
from dist cross join total
"""


def returns_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return-rate mart: per ship month, total lineitem revenue
    vs revenue on returned lines (l_returnflag = 'R') — exact decimal
    sums, the rate as one double division. One shuffle at month grain
    with map-side partial conditional aggregation (no join, no pivot).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = _discounted_rev()
    agg = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned"),
        F.sum(rev).alias("rev_dec"),
        F.sum(F.when(F.col("l_returnflag") == "R", rev).otherwise(None)).alias(
            "ret_dec"
        ),
    )
    return agg.select(
        "ship_month",
        "n_lineitems",
        "n_returned",
        F.col("rev_dec").cast("double").alias("total_revenue"),
        F.coalesce(F.col("ret_dec").cast("double"), F.lit(0.0)).alias(
            "returned_revenue"
        ),
        (
            F.coalesce(F.col("ret_dec"), F.lit(0).cast("decimal(18,4)")).cast("double")
            / F.col("rev_dec").cast("double")
        ).alias("return_rate"),
    )


ORACLE_RETURNS_BY_MONTH = """
with agg as (
    select strftime(cast(l_shipdate as date), '%Y-%m') as ship_month,
        count(*) as n_lineitems,
        cast(sum(case when l_returnflag = 'R' then 1 else 0 end) as bigint)
            as n_returned,
        sum(cast(cast(l_extendedprice as decimal(18,2))
            * (1 - cast(l_discount as decimal(4,2))) as decimal(18,4))) as rev_dec,
        sum(case when l_returnflag = 'R' then
            cast(cast(l_extendedprice as decimal(18,2))
                 * (1 - cast(l_discount as decimal(4,2))) as decimal(18,4)) end)
            as ret_dec
    from lineitem group by 1
)
select ship_month, n_lineitems, n_returned,
    cast(rev_dec as double) as total_revenue,
    coalesce(cast(ret_dec as double), 0.0) as returned_revenue,
    cast(coalesce(ret_dec, cast(0 as decimal(18,4))) as double)
        / cast(rev_dec as double) as return_rate
from agg
"""


def discount_band_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by discount band (integer percent): volume, gross,
    discount given, net — the pricing-team mart that shows where margin
    goes. The band is exact integer math on the decimal discount
    (never float rounding); all money exact decimal until the boundary.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    band = (disc * 100).cast("bigint")
    given = (price * disc).cast("decimal(18,4)")
    agg = li.groupBy(band.alias("discount_pct")).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(price).alias("gross_dec"),
        F.sum(given).alias("given_dec"),
    )
    return agg.select(
        "discount_pct",
        "n_lineitems",
        F.col("gross_dec").cast("double").alias("gross_revenue"),
        F.col("given_dec").cast("double").alias("discount_given"),
        (F.col("gross_dec") - F.col("given_dec")).cast("double").alias("net_revenue"),
    )


ORACLE_DISCOUNT_BAND_ANALYSIS = """
select cast(cast(l_discount as decimal(4,2)) * 100 as bigint) as discount_pct,
    count(*) as n_lineitems,
    cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as gross_revenue,
    cast(sum(cast(cast(l_extendedprice as decimal(18,2))
        * cast(l_discount as decimal(4,2)) as decimal(18,4))) as double)
        as discount_given,
    cast(sum(cast(l_extendedprice as decimal(18,2)))
         - sum(cast(cast(l_extendedprice as decimal(18,2))
               * cast(l_discount as decimal(4,2)) as decimal(18,4))) as double)
        as net_revenue
from lineitem
group by 1
"""


def trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-to-region trade-flow matrix (TPC-H Q7 shape): revenue by
    (supplier region → customer region) pair. Two INDEPENDENT dimension
    lookups hang off the same fact row — both broadcast, so the fact
    table shuffles only for the final 25-cell rollup (map-side partial
    agg makes even that exchange carry one row per task per cell).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    geo = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", F.col("r_name").alias("rname")
    )
    # NO forced broadcast on the customer/supplier sides: those dims
    # scale with the data (customer is the LARGEST dimension) and a
    # pinned broadcast overrides AQE's size threshold — at 100 TB that
    # is a driver/executor OOM, not a join strategy (round-7 review;
    # the module's broadcast discipline reserves F.broadcast for the
    # provably-constant nation/region dims inside `geo`). AQE still
    # broadcasts them at small SFs where the estimates allow.
    cust_geo = customer.join(geo, customer.c_nationkey == geo.n_nationkey).select(
        "c_custkey", F.col("rname").alias("cust_region")
    )
    supp_geo = supplier.join(geo, supplier.s_nationkey == geo.n_nationkey).select(
        "s_suppkey", F.col("rname").alias("supp_region")
    )
    rev = _discounted_rev()
    return (
        li.select("l_orderkey", "l_suppkey", rev.alias("rev_dec"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_geo, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_geo, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("supp_region", "cust_region")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum("rev_dec").alias("rev_sum"),
        )
        .select(
            "supp_region",
            "cust_region",
            "n_lineitems",
            F.col("rev_sum").cast("double").alias("trade_revenue"),
            (F.col("supp_region") == F.col("cust_region")).alias("is_domestic"),
        )
    )


ORACLE_TRADE_FLOWS = """
with geo as materialized (
    select n.n_nationkey, r.r_name as rname
    from nation n join region r on n.n_regionkey = r.r_regionkey
)
select sg.rname as supp_region, cg.rname as cust_region,
    count(*) as n_lineitems,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
        * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))) as double)
        as trade_revenue,
    sg.rname = cg.rname as is_domestic
from lineitem l
join orders o on l.l_orderkey = o.o_orderkey
join customer c on o.o_custkey = c.c_custkey
join supplier s on l.l_suppkey = s.s_suppkey
join geo cg on c.c_nationkey = cg.n_nationkey
join geo sg on s.s_nationkey = sg.n_nationkey
group by sg.rname, cg.rname
"""

LATE_SHIP_DAYS = 60


def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-fulfillment report (TPC-H Q4 shape): per order priority, the
    count and share of orders with AT LEAST ONE lineitem shipped more
    than LATE_SHIP_DAYS days after the order date — an EXISTS semi-join,
    planned as LeftSemi so the fact side never duplicates rows (the
    plan-shape test pins it). Exact day arithmetic; the share is one
    double division of exact counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late_keys = (
        li.select("l_orderkey", F.to_date("l_shipdate").alias("ship_d"))
        .join(
            orders.select("o_orderkey", F.to_date("o_orderdate").alias("ord_d")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.datediff("ship_d", "ord_d") > LATE_SHIP_DAYS)
        .select("o_orderkey")
        .distinct()
    )
    flagged = orders.join(
        late_keys.withColumnRenamed("o_orderkey", "late_key"),
        orders.o_orderkey == F.col("late_key"),
        "left_semi",
    )
    per_prio = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    late_per_prio = flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late")
    )
    return (
        per_prio.join(late_per_prio, "o_orderpriority", "left")
        .na.fill({"n_late": 0})
        .select(
            "o_orderpriority",
            "n_orders",
            F.col("n_late").cast("bigint").alias("n_late"),
            (F.col("n_late").cast("double") / F.col("n_orders").cast("double")).alias(
                "late_share"
            ),
        )
    )


ORACLE_LATE_ORDER_PRIORITY = f"""
with late as (
    select distinct o.o_orderkey
    from orders o join lineitem l on l.l_orderkey = o.o_orderkey
    where datediff('day', cast(o.o_orderdate as date),
                   cast(l.l_shipdate as date)) > {LATE_SHIP_DAYS}
),
per_prio as (
    select o_orderpriority, count(*) as n_orders from orders group by 1
),
late_pp as (
    select o.o_orderpriority, count(*) as n_late
    from orders o join late t on o.o_orderkey = t.o_orderkey
    group by 1
)
select p.o_orderpriority, p.n_orders,
    cast(coalesce(l.n_late, 0) as bigint) as n_late,
    cast(coalesce(l.n_late, 0) as double) / cast(p.n_orders as double)
        as late_share
from per_prio p left join late_pp l on p.o_orderpriority = l.o_orderpriority
"""


HOT_BUCKET_MOD = 4  # every 4th partkey collapses into bucket 0 => ~25% hot


def skew_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup over a DELIBERATELY skewed join key, executed
    through ``ops.skew.salted_join`` — the gated proof that the manual
    salting path produces join-identical results (reference has no
    skew tooling; this is engine hardening for the 100 TB posture,
    where AQE cannot split a hot key that feeds a downstream agg).

    Shape: every 4th partkey collapses into bucket 0, so ~25% of all
    lineitems share ONE join key — the pathological hot-key case from
    bench_skew.py, but on the real tables and under the value oracle.
    The build side (per-bucket part stats) is unique per bucket and
    scales with |part|, so at 100 TB it is NOT broadcastable: we pin a
    shuffle-hash join via hint, and the salt scatters bucket 0 across
    16 reducers (plan shape asserted in tests/test_plans.py). The
    oracle is the PLAIN join — salting must be invisible in values.

    Determinism: per-row salt from (l_orderkey, l_linenumber), not
    rand(); money exact-decimal to the boundary; top-25 by revenue
    with bucket_key tiebreak.
    """
    from ecommerce_dbt_medallion_spark.ops.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def bucket(col: Column) -> Column:
        return F.when(col % HOT_BUCKET_MOD == 0, F.lit(0)).otherwise(col)

    dim = (
        part.groupBy(bucket(F.col("p_partkey")).alias("bucket_key"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).alias("retail_dec"),
        )
        # large-dim posture: forbid broadcast so the salted path is the
        # plan under test at every SF (at 100 TB |dim| ~ |part| anyway)
        .hint("shuffle_hash")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    probe = li.select(
        bucket(F.col("l_partkey")).alias("bucket_key"),
        rev.alias("rev_dec"),
        # deterministic per-row salt source (never rand() under the oracle)
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("row_id"),
    )
    joined = salted_join(
        probe, dim, "bucket_key", probe_salt_col=F.col("row_id")
    )
    return (
        joined.groupBy("bucket_key")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum("rev_dec").alias("rev_sum"),
            F.max("n_parts").alias("n_parts"),
            F.max("retail_dec").alias("retail_sum"),
        )
        .select(
            "bucket_key",
            "n_lineitems",
            "n_parts",
            F.col("rev_sum").cast("double").alias("bucket_revenue"),
            F.col("retail_sum").cast("double").alias("bucket_retail"),
        )
        .orderBy(F.desc("bucket_revenue"), "bucket_key")
        .limit(25)
    )


ORACLE_SKEW_SALTED_REVENUE = f"""
with dim as (
    select case when p_partkey % {HOT_BUCKET_MOD} = 0 then 0
                else p_partkey end as bucket_key,
        count(*) as n_parts,
        sum(cast(p_retailprice as decimal(18,2))) as retail_dec
    from part group by 1
),
probe as (
    select case when l_partkey % {HOT_BUCKET_MOD} = 0 then 0
                else l_partkey end as bucket_key,
        cast(cast(l_extendedprice as decimal(18,2))
            * (1 - cast(l_discount as decimal(4,2))) as decimal(18,4))
            as rev_dec
    from lineitem
)
select p.bucket_key, count(*) as n_lineitems,
    max(d.n_parts) as n_parts,
    cast(sum(p.rev_dec) as double) as bucket_revenue,
    cast(max(d.retail_dec) as double) as bucket_retail
from probe p join dim d on p.bucket_key = d.bucket_key
group by p.bucket_key
order by bucket_revenue desc, p.bucket_key
limit 25
"""


# --------------------------------------------------- shipping priority

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF_DAYS = 1200  # data-derived cutoff: min(o_orderdate) + this
Q3_TOPK = 10


def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape shipping priority: the ``Q3_TOPK`` unshipped
    orders (ordered before the cutoff, with lineitems shipping after
    it) with the highest outstanding revenue, for one market segment.
    The cutoff derives from the data (min orderdate + 1200 days — the
    BATCH_TS discipline, no wall-clock).

    Plan: segment filter cuts customer ~5× before its join; both fact
    joins shuffle on their natural keys with filters pushed to the
    scans; the exact-decimal revenue sum partially aggregates
    map-side; the top-K is TakeOrderedAndProject under a total order
    (revenue desc, orderdate asc, orderkey asc) — no global sort, and
    ties can't flap across engines or partitionings.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = orders.agg(
        F.date_add(F.to_date(F.min("o_orderdate")), Q3_CUTOFF_DAYS).alias("cut")
    )
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.crossJoin(F.broadcast(cutoff))
        .where(F.to_date("o_orderdate") < F.col("cut"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            li.crossJoin(F.broadcast(cutoff.select(F.col("cut").alias("cut2"))))
            .where(F.to_date("l_shipdate") > F.col("cut2")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_discounted_rev()).alias("rev_dec"))
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(Q3_TOPK)
    )


ORACLE_SHIPPING_PRIORITY_TOPK = f"""
with cut as (
    select cast(min(o_orderdate) as date) + {Q3_CUTOFF_DAYS} as cut
    from orders
)
select cast(l.l_orderkey as bigint) as l_orderkey,
    cast(o.o_orderdate as date) as o_orderdate,
    o.o_orderpriority,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
        * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4)))
        as double) as revenue
from customer c
join orders o on o.o_custkey = c.c_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
cross join cut
where c.c_mktsegment = '{Q3_SEGMENT}'
  and cast(o.o_orderdate as date) < cut.cut
  and cast(l.l_shipdate as date) > cut.cut
group by 1, 2, 3
order by revenue desc, o_orderdate, l_orderkey
limit {Q3_TOPK}
"""


# ----------------------------------------------- large volume customers

Q18_QTY_THRESHOLD = 200
Q18_TOPK = 20


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape large-volume customers: orders whose total
    lineitem quantity exceeds ``Q18_QTY_THRESHOLD``, with their
    customer, ranked by order value.

    Plan: the HAVING pre-aggregate runs FIRST on lineitem alone
    (map-side-combinable exact-decimal sum, grouped on the join key
    l_orderkey — so the subsequent orders join is co-partitioned and
    reuses the shuffle), shrinking the fact ~50× before any join; the
    qualifying-order set then joins orders and customer. Top-K is
    TakeOrderedAndProject under a total order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .where(F.col("qty_dec") > Q18_QTY_THRESHOLD)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.to_date("o_orderdate").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(Q18_TOPK)
    )


ORACLE_LARGE_VOLUME_CUSTOMERS = f"""
with big as (
    select l_orderkey,
        sum(cast(l_quantity as decimal(18,2))) as qty_dec
    from lineitem
    group by 1
    having qty_dec > {Q18_QTY_THRESHOLD}
)
select c.c_name,
    cast(c.c_custkey as bigint) as c_custkey,
    cast(o.o_orderkey as bigint) as o_orderkey,
    cast(o.o_orderdate as date) as o_orderdate,
    cast(o.o_totalprice as double) as o_totalprice,
    cast(b.qty_dec as double) as total_qty
from big b
join orders o on o.o_orderkey = b.l_orderkey
join customer c on c.c_custkey = o.o_custkey
order by o_totalprice desc, o_orderdate, o_orderkey
limit {Q18_TOPK}
"""


# ----------------------------------------------- local supplier volume

Q5_WINDOW_DAYS = 365


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape local-supplier volume: revenue per (region,
    nation) where the LINEITEM'S SUPPLIER and the ORDER'S CUSTOMER sit
    in the same nation, over the dataset's first year. The classic
    join-graph query (6 tables, one non-key equality s_nationkey =
    c_nationkey) that join ordering exists for.

    Plan: the date filter cuts orders at the scan; the two fact joins
    shuffle on their natural keys; nation/region are provably tiny and
    broadcast; the nation-match is a post-join filter on two already-
    carried int columns (never a join explosion). Revenue is the
    shared exact-decimal expression.
    """
    orders = load_table(spark, sf_dir, "orders")
    cut = orders.agg(
        F.date_add(F.to_date(F.min("o_orderdate")), Q5_WINDOW_DAYS).alias("hi")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.crossJoin(F.broadcast(cut))
        .where(F.to_date("o_orderdate") < F.col("hi"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(_discounted_rev()).alias("rev_dec"),
        )
        .select(
            "r_name",
            "n_name",
            F.col("n_lineitems").cast("long").alias("n_lineitems"),
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = f"""
with cut as (
    select cast(min(o_orderdate) as date) + {Q5_WINDOW_DAYS} as hi
    from orders
)
select r.r_name, n.n_name,
    cast(count(*) as bigint) as n_lineitems,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
        * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4)))
        as double) as revenue
from customer c
join orders o on o.o_custkey = c.c_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
join supplier s on s.s_suppkey = l.l_suppkey
              and s.s_nationkey = c.c_nationkey
join nation n on n.n_nationkey = c.c_nationkey
join region r on r.r_regionkey = n.n_regionkey
cross join cut
where cast(o.o_orderdate as date) < cut.hi
group by 1, 2
"""


# ------------------------------------------------- promo revenue share

PROMO_TYPE = "PROMO"


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape promotion effect as a monthly time series: per
    ship month, revenue from PROMO-type parts vs total, and the promo
    share in percent.

    Plan: one lineitem ⋈ part equi-join (part is the smaller side —
    AQE broadcasts it at test SF, shuffles at 100 TB), then a single
    month-grain conditional aggregate (map-side partials; the
    promo/total split is a CASE inside the same pass, not a second
    scan). Share = one double division of two exact decimal sums.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _discounted_rev()
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == PROMO_TYPE, rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).alias("promo_dec"),
            F.sum(rev).alias("total_dec"),
        )
        .select(
            "ship_month",
            F.col("promo_dec").cast("double").alias("promo_revenue"),
            F.col("total_dec").cast("double").alias("total_revenue"),
            F.round(
                F.lit(100.0) * F.col("promo_dec").cast("double")
                / F.col("total_dec").cast("double"),
                4,
            ).alias("promo_share_pct"),
        )
    )


ORACLE_PROMO_REVENUE_SHARE = f"""
with j as (
    select strftime(cast(l.l_shipdate as date), '%Y-%m') as ship_month,
        cast(cast(l.l_extendedprice as decimal(18,2))
            * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))
            as rev,
        p.p_type
    from lineitem l join part p on p.p_partkey = l.l_partkey
)
select ship_month,
    cast(sum(case when p_type = '{PROMO_TYPE}' then rev
                  else cast(0 as decimal(18,4)) end) as double)
        as promo_revenue,
    cast(sum(rev) as double) as total_revenue,
    round(100.0 * cast(sum(case when p_type = '{PROMO_TYPE}' then rev
                               else cast(0 as decimal(18,4)) end) as double)
          / cast(sum(rev) as double), 4) as promo_share_pct
from j
group by 1
"""


# ------------------------------------------- customer order distribution

# Q13's "special requests" exclusion class, mapped onto the priority
# column this schema has (orders 6-col schema; no o_comment exists).
Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape customer order-count distribution: for each
    order count k (counting only orders outside the excluded priority
    class), how many customers placed exactly k such orders — customers
    with none appear in the k=0 bucket.

    Plan: orders aggregate to customer grain FIRST (map-side partial
    count on o_custkey — the fact table collapses ~10x before any
    join), then ONE shuffle join against the customer key list with a
    zero-fill for orderless customers; the outer-join-then-count form
    would instead carry every order row through the join. The second
    aggregate runs at order-count grain (tiny by construction: at most
    max-orders-per-customer distinct groups).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        orders.where(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    return (
        cust.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .na.fill({"order_count": 0})
        .groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.col("order_count").cast("long").alias("order_count"),
            F.col("n_customers").cast("long").alias("n_customers"),
        )
    )


ORACLE_CUSTOMER_ORDER_DISTRIBUTION = f"""
with per_cust as (
    select c.c_custkey, count(o.o_orderkey) as order_count
    from customer c
    left join orders o
        on o.o_custkey = c.c_custkey
       and o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
    group by 1
)
select cast(order_count as bigint) as order_count,
    cast(count(*) as bigint) as n_customers
from per_cust
group by 1
"""


# ---------------------------------------------- small-quantity revenue

Q17_QTY_FRACTION = 0.5  # lines below this fraction of the part's avg qty


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shape small-quantity order revenue, reported per
    brand: revenue locked in lineitems whose quantity sits below
    ``Q17_QTY_FRACTION`` x that part's average quantity.

    Plan: the per-part average aggregates lineitem on l_partkey
    (map-side partials), then joins BACK to lineitem on the same key —
    Spark reuses the l_partkey hash partitioning across the agg and the
    join, and the part-dim join rides the identical key, so the whole
    pipeline is one shuffle family (no second exchange; the plan pin
    checks a single l_partkey exchange feeds the join). Determinism:
    l_quantity is integral (1..50), so the double average is EXACT
    (integer partial sums < 2^53 commute losslessly) — the threshold
    compare cannot flip between engines or partition orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(avg_q, F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < F.lit(Q17_QTY_FRACTION) * F.col("avg_qty"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev_dec"),
        )
        .select(
            "p_brand",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("rev_dec").cast("double").alias("small_qty_revenue"),
        )
    )


ORACLE_SMALL_QUANTITY_REVENUE = f"""
with avg_q as (
    select l_partkey as ap_key, avg(l_quantity) as avg_qty
    from lineitem
    group by 1
)
select p.p_brand,
    cast(count(*) as bigint) as n_lines,
    cast(sum(cast(l.l_extendedprice as decimal(18,2))) as double)
        as small_qty_revenue
from lineitem l
join avg_q a on a.ap_key = l.l_partkey
join part p on p.p_partkey = l.l_partkey
where l.l_quantity < {Q17_QTY_FRACTION} * a.avg_qty
group by 1
"""


# ------------------------------------------ idle high-balance customers

Q22_URGENT_PRIORITY = "1-URGENT"


def idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shape untapped-customer report: per market segment,
    customers whose account balance exceeds the average POSITIVE
    balance yet who have never placed an urgent order (the schema has
    no 7-year inactivity horizon; 'no urgent order' is this corpus's
    idle predicate).

    Plan: the global threshold is a one-row aggregate broadcast by
    crossJoin (never a shuffle); the no-urgent-orders predicate is a
    LeftAnti join on o_custkey (the plan pin checks it — EXISTS/IN
    rewrites that dedup-then-outer-join would double-shuffle);
    the final aggregate is segment-grain (5 groups). Determinism:
    the above-average compare runs in integer CENTS cross-multiplied
    (bal_cents * n_pos > sum_cents) — exact on both engines, no
    double-average ulp boundary.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    urgent = orders.where(
        F.col("o_orderpriority") == Q22_URGENT_PRIORITY
    ).select("o_custkey")
    return (
        cust.withColumn("bal_cents", cents)
        .crossJoin(F.broadcast(pos))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("bal_cents").alias("tot_cents"),
        )
        .select(
            "c_mktsegment",
            F.col("n_customers").cast("long").alias("n_customers"),
            (F.col("tot_cents").cast("double") / 100.0).alias("total_acctbal"),
        )
    )


ORACLE_IDLE_HIGH_BALANCE_CUSTOMERS = f"""
with pos as (
    select sum(cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint))
            as sum_cents,
        count(*) as n_pos
    from customer
    where c_acctbal > 0
),
eligible as (
    select c.c_mktsegment,
        cast(cast(c.c_acctbal as decimal(18,2)) * 100 as bigint) as bal_cents
    from customer c
    cross join pos
    where cast(cast(c.c_acctbal as decimal(18,2)) * 100 as bigint) * pos.n_pos
            > pos.sum_cents
      and not exists (
        select 1 from orders o
        where o.o_custkey = c.c_custkey
          and o.o_orderpriority = '{Q22_URGENT_PRIORITY}'
      )
)
select c_mktsegment,
    cast(count(*) as bigint) as n_customers,
    cast(sum(bal_cents) as double) / 100.0 as total_acctbal
from eligible
group by 1
"""


# ---------------------------------------------------- top supplier(s)

Q15_WINDOW_DAYS = 90


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shape top supplier: over the corpus's first
    ``Q15_WINDOW_DAYS`` days of shipments, the supplier(s) whose
    discounted revenue equals the maximum — ties all surface, exactly
    as Q15's view-based formulation requires.

    Plan: one l_suppkey-grain aggregate (map-side partials), the max is
    a one-row aggregate broadcast back over the supplier-grain rollup
    (never a global window/sort — supplier grain is NOT calendar-
    bounded, so the unpartitioned-window form would single-thread ~1e9
    rows at 100 TB), and the winner set joins the supplier dim. The
    rollup is lazily localCheckpoint-ed: both the max branch and the
    probe branch read the SAME materialized supplier-grain RDD, so the
    fact table is scanned once (the naive self-reference recomputes the
    whole lineitem aggregate twice — the plan test pins the single
    scan). Determinism: revenue and the max-equality compare stay in
    exact decimal; doubles appear only at the output boundary.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    cut = li.agg(
        F.date_add(F.to_date(F.min("l_shipdate")), Q15_WINDOW_DAYS).alias("hi")
    )
    per_supp = (
        li.crossJoin(F.broadcast(cut))
        .where(F.to_date("l_shipdate") < F.col("hi"))
        .groupBy("l_suppkey")
        .agg(F.sum(_discounted_rev()).alias("rev_dec"))
        .localCheckpoint(eager=False)
    )
    best = per_supp.agg(F.max("rev_dec").alias("max_dec"))
    return (
        per_supp.crossJoin(F.broadcast(best))
        .where(F.col("rev_dec") == F.col("max_dec"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


ORACLE_TOP_SUPPLIER_REVENUE = f"""
with cut as (
    select cast(min(l_shipdate) as date) + {Q15_WINDOW_DAYS} as hi
    from lineitem
),
per_supp as (
    select l.l_suppkey,
        sum(cast(cast(l.l_extendedprice as decimal(18,2))
            * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4)))
            as rev_dec
    from lineitem l cross join cut
    where cast(l.l_shipdate as date) < cut.hi
    group by 1
)
select cast(s.s_suppkey as bigint) as s_suppkey,
    s.s_name,
    cast(p.rev_dec as double) as total_revenue
from per_supp p
join supplier s on s.s_suppkey = p.l_suppkey
where p.rev_dec = (select max(rev_dec) from per_supp)
"""


# -------------------------------------------- part supplier diversity


def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shape supplier diversity: per (p_type, p_size), how
    many DISTINCT suppliers have shipped that part class — excluding
    suppliers in deficit (s_acctbal < 0; the schema has no complaint
    comments, deficit is this corpus's exclusion class).

    Plan: lineitem collapses to distinct (partkey, suppkey) pairs
    FIRST (~30x shrink of the fact before any join; Spark plans the
    count-distinct two-phase so no raw occurrence ships to one
    reducer), the exclusion is a LeftAnti against the FILTERED
    supplier set (tiny — broadcast at any scale, it's the deficit
    subset), and the part join carries only the pair grain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
    )
    return (
        pairs.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_type",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
        )
    )


ORACLE_PART_SUPPLIER_DIVERSITY = """
with pairs as (
    select distinct l_partkey, l_suppkey from lineitem
),
kept as (
    select p.* from pairs p
    where not exists (
        select 1 from supplier s
        where s.s_suppkey = p.l_suppkey and s.s_acctbal < 0
    )
)
select t.p_type, cast(t.p_size as bigint) as p_size,
    cast(count(distinct k.l_suppkey) as bigint) as supplier_cnt
from kept k join part t on t.p_partkey = k.l_partkey
group by 1, 2
"""


# ----------------------------------------------- disjunctive revenue

# Q19's OR-of-ANDs bands mapped onto this schema's brands/quantities.
Q19_BANDS = (
    ("Brand#12", 1, 11),
    ("Brand#23", 10, 20),
    ("Brand#34", 20, 30),
)


def disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape disjunctive-predicate revenue: discounted
    revenue of lineitems matching ANY (brand, quantity-band) clause,
    reported per brand.

    The point of this key is the OPTIMIZER shape: from the OR-of-ANDs
    Catalyst must still derive a pushable per-side residual — the
    brand disjunction reaches the part scan and the quantity-range
    disjunction reaches the lineitem scan as PushedFilters (plan test
    pins both), so at 100 TB the join sees only band-eligible rows
    from each side instead of filtering after the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    clause = None
    for brand, lo, hi in Q19_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
        )
        clause = c if clause is None else (clause | c)
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(clause)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_discounted_rev()).alias("rev_dec"),
        )
        .select(
            "p_brand",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("rev_dec").cast("double").alias("band_revenue"),
        )
    )


def _q19_sql_clause() -> str:
    return " or ".join(
        f"(p.p_brand = '{b}' and l.l_quantity >= {lo} and l.l_quantity <= {hi})"
        for b, lo, hi in Q19_BANDS
    )


ORACLE_DISJUNCTIVE_BAND_REVENUE = f"""
select p.p_brand,
    cast(count(*) as bigint) as n_lines,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
        * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4)))
        as double) as band_revenue
from lineitem l
join part p on p.p_partkey = l.l_partkey
where {_q19_sql_clause()}
group by 1
"""


# ----------------------------------------------- waiting suppliers (Q21)

Q21_TOPK = 10


def waiting_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shape waiting-supplier ranking: suppliers who were the
    SOLE late shipper on multi-supplier orders (their lineitem shipped
    > LATE_SHIP_DAYS after the order date while every co-supplier on
    the order shipped on time), counted per supplier.

    Spark-first rewrite: the textbook form is a double correlated
    EXISTS / NOT EXISTS self-join of lineitem — two extra scans and two
    shuffles of the biggest fact. Here one per-order aggregation
    computes (distinct suppliers, distinct LATE suppliers) and the
    qualifying pairs fall out of the same pass: supplier s on order o
    qualifies iff s is late on o AND n_suppliers > 1 AND
    n_late_suppliers == 1. The ORACLE states the classic EXISTS /
    NOT EXISTS form, so the hash gate proves the rewrite equivalent.
    Tie-break-free output (count per supplier, all 10 suppliers via
    a deterministic full ranking — no top-K tie flap: numwait desc,
    suppkey asc is a total order).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    lo = li.select("l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("ship_d")).join(
        orders.select("o_orderkey", F.to_date("o_orderdate").alias("ord_d")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    flagged = lo.select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff("ship_d", "ord_d") > LATE_SHIP_DAYS).alias("is_late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    sole_late = (
        flagged.where(F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
    )
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        # NO broadcast hint on supplier: it scales with SF (~10k rows ×
        # SF → ~1e9 at the 100 TB point) and a pinned F.broadcast
        # bypasses AQE's size check — an executor/driver OOM at 100×
        # (round-9 review). The probe side here is a supplier-grain
        # aggregate anyway, so AQE broadcasts whichever side is small
        # AT RUNTIME; the module's discipline reserves explicit hints
        # for the provably-constant nation/region dims.
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("numwait").cast("long").alias("numwait"),
        )
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(Q21_TOPK)
    )


ORACLE_WAITING_SUPPLIER_RANKING = f"""
with lo as (
    select l.l_orderkey, l.l_suppkey,
        date_diff('day', cast(o.o_orderdate as date),
                  cast(l.l_shipdate as date)) > {LATE_SHIP_DAYS} as is_late
    from lineitem l join orders o on l.l_orderkey = o.o_orderkey
)
select cast(s.s_suppkey as bigint) as s_suppkey, s.s_name,
    cast(count(*) as bigint) as numwait
from (
    select distinct l1.l_orderkey, l1.l_suppkey
    from lo l1
    where l1.is_late
      and exists (
        select 1 from lo l2
        where l2.l_orderkey = l1.l_orderkey
          and l2.l_suppkey <> l1.l_suppkey)
      and not exists (
        select 1 from lo l3
        where l3.l_orderkey = l1.l_orderkey
          and l3.l_suppkey <> l1.l_suppkey
          and l3.is_late)
) w
join supplier s on s.s_suppkey = w.l_suppkey
group by 1, 2
order by numwait desc, s_suppkey
limit {Q21_TOPK}
"""


# ------------------------------------------- min-cost supplier parts (Q2)

Q2_SIZE_MAX = 25


def min_cost_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape minimum-cost supplier: for every part in a size
    band, the supplier(s) whose best observed lineitem price equals the
    part's global minimum (the testdata has no partsupp table — the
    observed lineitem prices ARE the supply-cost relation, derived once
    and reused for both sides of the correlation).

    Spark-first decorrelation: the textbook correlated subquery
    ``ps.cost = (select min(cost) ... where partkey = p.partkey)``
    becomes one per-(part, supplier) MIN, one per-part MIN over it, and
    an equi-join back — two map-side-combinable aggregations and a
    narrow join instead of a per-row subquery. The ORACLE keeps the
    correlated form, so the gate proves the decorrelation. Exact
    decimal mins (no doubles until the final cast).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= Q2_SIZE_MAX)
    supp = load_table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("best_price")
    )
    part_min = ps.groupBy("l_partkey").agg(F.min("best_price").alias("min_price"))
    return (
        ps.join(part_min, "l_partkey")
        .where(F.col("best_price") == F.col("min_price"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        # NO broadcast hint on supplier (round-9 review): supplier
        # scales with SF, and a pinned hint overrides AQE's size
        # threshold — OOM at 100×. AQE still broadcasts it at SFs
        # where the runtime size estimate allows.
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_brand",
            F.col("p_size").cast("int").alias("p_size"),
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("best_price").cast("double").alias("best_price"),
        )
    )


ORACLE_MIN_COST_SUPPLIER_PARTS = f"""
with ps as (
    select l_partkey, l_suppkey,
        min(cast(l_extendedprice as decimal(18,2))) as best_price
    from lineitem group by 1, 2
)
select cast(p.p_partkey as bigint) as p_partkey, p.p_brand,
    cast(p.p_size as int) as p_size,
    cast(s.s_suppkey as bigint) as s_suppkey, s.s_name,
    cast(ps.best_price as double) as best_price
from ps
join part p on p.p_partkey = ps.l_partkey
join supplier s on s.s_suppkey = ps.l_suppkey
where p.p_size <= {Q2_SIZE_MAX}
  and ps.best_price = (
    select min(ps2.best_price) from ps ps2
    where ps2.l_partkey = ps.l_partkey)
"""


# --------------------------------------------- returned-item revenue (Q10)

Q10_TOPK = 20


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shape returned-item report: the ``Q10_TOPK`` customers
    who returned the most revenue (lineitems flagged 'R'), with their
    nation — the churn-risk list a returns desk works top-down.

    Plan: the returnflag filter cuts lineitem at the scan (~25% of the
    fact) before its only shuffle; orders carries custkey to the
    revenue grain; customer joins on the shrunken aggregate; nation
    broadcasts. Exact-decimal revenue; top-K is TakeOrderedAndProject
    under a total order (revenue desc, custkey asc).
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum(_discounted_rev()).alias("rev_dec"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(Q10_TOPK)
    )


ORACLE_RETURNED_ITEM_CUSTOMERS = f"""
select cast(c.c_custkey as bigint) as c_custkey, c.c_name, n.n_name,
    cast(c.c_acctbal as double) as c_acctbal,
    cast(sum(cast(cast(l.l_extendedprice as decimal(18,2))
        * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4)))
        as double) as revenue
from lineitem l
join orders o on l.l_orderkey = o.o_orderkey
join customer c on c.c_custkey = o.o_custkey
join nation n on n.n_nationkey = c.c_nationkey
where l.l_returnflag = 'R'
group by 1, 2, 3, 4
order by revenue desc, c_custkey
limit {Q10_TOPK}
"""


# ------------------------------------------------ market share (Q8)

Q8_SUPP_NATION = "NATION_1"
Q8_CUST_REGION = "ASIA"


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shape national market share: within one customer
    region, the share of yearly revenue supplied by one nation.

    Plan: ONE pass over the joined fact — the share is a conditional
    sum over the same rows as the denominator, so there is no second
    scan and no self-join; nation/region broadcast; both sums are
    exact decimals and the share is a single double division per year
    row (deterministic: one fp op on exact inputs).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_in_region = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .where(F.col("r_name") == Q8_CUST_REGION)
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    rev = _discounted_rev()
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == Q8_SUPP_NATION, rev)).alias(
                "nation_dec"
            ),
            F.sum(rev).alias("total_dec"),
        )
        .select(
            F.col("o_year").cast("int").alias("o_year"),
            F.coalesce(F.col("nation_dec").cast("double"), F.lit(0.0)).alias(
                "nation_revenue"
            ),
            F.col("total_dec").cast("double").alias("total_revenue"),
            (
                F.coalesce(F.col("nation_dec"), F.lit(0).cast("decimal(18,4)"))
                .cast("double")
                / F.col("total_dec").cast("double")
            ).alias("mkt_share"),
        )
    )


ORACLE_NATION_MARKET_SHARE = f"""
with fact as (
    select year(o.o_orderdate) as o_year,
        n2.n_name as supp_nation,
        cast(cast(l.l_extendedprice as decimal(18,2))
            * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4)) as rev
    from lineitem l
    join orders o on l.l_orderkey = o.o_orderkey
    join customer c on c.c_custkey = o.o_custkey
    join nation n on n.n_nationkey = c.c_nationkey
    join region r on r.r_regionkey = n.n_regionkey
    join supplier s on s.s_suppkey = l.l_suppkey
    join nation n2 on n2.n_nationkey = s.s_nationkey
    where r.r_name = '{Q8_CUST_REGION}'
)
select cast(o_year as int) as o_year,
    cast(coalesce(sum(case when supp_nation = '{Q8_SUPP_NATION}' then rev end), 0)
        as double) as nation_revenue,
    cast(sum(rev) as double) as total_revenue,
    cast(coalesce(sum(case when supp_nation = '{Q8_SUPP_NATION}' then rev end), 0)
        as double) / cast(sum(rev) as double) as mkt_share
from fact
group by 1
"""


# ------------------------------------------------ product profit (Q9)

Q9_NAME_TOKEN = "widget"


def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shape product-type profit by (supplier nation, order
    year) for parts whose name contains ``Q9_NAME_TOKEN``. The testdata
    has no partsupp supply cost, so cost = retailprice × quantity (a
    deterministic exact-decimal stand-in with the same join graph).

    Plan: the name filter is a pushed Contains on the part scan; parts
    then join the fact BEFORE orders so the fact shrinks at its first
    join; nation broadcasts; profit is one exact-decimal expression
    summed with map-side partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_NAME_TOKEN)
    )
    profit = (
        _discounted_rev()
        - (
            F.col("p_retailprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(18,2)")
        ).cast("decimal(18,4)")
    ).cast("decimal(28,4)")
    return (
        li.join(part.select("p_partkey", "p_retailprice"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "o_year")
        .agg(F.sum(profit).alias("profit_dec"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_year").cast("int").alias("o_year"),
            F.col("profit_dec").cast("double").alias("profit"),
        )
    )


ORACLE_PRODUCT_PROFIT_BY_NATION = f"""
select n.n_name as nation,
    cast(year(o.o_orderdate) as int) as o_year,
    cast(sum(cast(
        cast(cast(l.l_extendedprice as decimal(18,2))
            * (1 - cast(l.l_discount as decimal(4,2))) as decimal(18,4))
        - cast(cast(p.p_retailprice as decimal(18,2))
            * cast(l.l_quantity as decimal(18,2)) as decimal(18,4))
        as decimal(28,4))) as double) as profit
from lineitem l
join part p on p.p_partkey = l.l_partkey
join orders o on o.o_orderkey = l.l_orderkey
join supplier s on s.s_suppkey = l.l_suppkey
join nation n on n.n_nationkey = s.s_nationkey
where p.p_name like '%{Q9_NAME_TOKEN}%'
group by 1, 2
"""
