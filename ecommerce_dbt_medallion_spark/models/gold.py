"""Gold layer — business marts (reference parity).

Re-implements, Spark-first:
- models/gold/gold_customer_summary.sql (per-customer KPIs, RFM scores)
- models/gold/gold_order_metrics.sql    (daily grain + running windows)
- models/gold/gold_revenue_analysis.sql (monthly grain, MoM/YoY, pivot)

Determinism deltas (SURVEY.md §3):
- ``current_date()`` → ``as_of_date`` = max(order_date) over silver_orders,
  computed in-plan and broadcast (scale-safe scalar).
- ``mode(payment_method)`` (tie-nondeterministic) → deterministic mode:
  row_number over (count desc, method asc).
- Money: exact decimal sums internally, cast to double in final output;
  averages/rates are (exact sum → double) / bigint count — one fp division,
  engine-independent.

Scale notes:
- count(distinct order_key/payment_key) in the reference is rewritten to
  plain count(): the grain guarantees uniqueness (enforced by the DQ
  engine), and dropping DISTINCT removes a full Expand+shuffle at 100 TB.
  Real distincts (customer per day, payment methods, active months) kept.
- Customer/payment aggregations are single-shuffle: payments aggregate
  once on (customer_key, method), then tiny re-aggregations derive totals
  and the preferred method — one pass over the big fact instead of three.
- Ordered windows run only AFTER date/month-grain aggregation, where
  cardinality is days/months (bounded), so the single-partition window is
  safe at any input scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import BATCH_TS
from ecommerce_dbt_medallion_spark.models.silver import (
    silver_customers,
    silver_orders,
    silver_payments_for_agg,
)


def _dbl(c: Column) -> Column:
    return c.cast("double")


def _zero_dec() -> Column:
    return F.lit(0).cast("decimal(18,2)")


def _safe_div(num: Column, den: Column) -> Column:
    """num / den with NULL when den = 0 (both already double)."""
    return num / F.when(den != 0, den)


def _updated_at() -> Column:
    return F.lit(BATCH_TS).cast("timestamp")


def gold_customer_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/gold/gold_customer_summary.sql."""
    # silver_orders feeds three consumers (order aggs, the payments
    # join, as-of); checkpoint it so the orders⋈customers join runs once.
    # Payments use the id-free path: the mart only counts/sums payments,
    # so the payment-id sequence window is skipped (value-identical).
    o = silver_orders(spark, sf_dir).localCheckpoint(eager=True)
    return gold_customer_summary_df(
        silver_customers(spark, sf_dir),
        o,
        silver_payments_for_agg(spark, sf_dir, o),
    )


_BUCKETED_READY: set[str] = set()


def gold_customer_summary_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-facts variant of gold_customer_summary.

    Reads silver_orders_b / silver_payments_b — both bucketed+sorted on
    order_id — so the payments⋈orders join is shuffle-free (SortMergeJoin
    over pre-bucketed scans, zero Exchange). The join runs on order_id
    instead of order_key: order_key = md5(order_id) is 1:1, so the result
    is value-identical; order_id is the bucket key, order_key is not.
    This is the 100 TB shape: the dominant fact-fact shuffle is paid once
    at materialization time, then every mart build skips it.

    Materialization runs here (memoized per sf_dir) so the query is
    self-contained for the driver; it is setup, not query work.
    """
    if sf_dir not in _BUCKETED_READY:
        from ecommerce_dbt_medallion_spark.runner import materialize_bucketed_facts

        materialize_bucketed_facts(spark, sf_dir)
        _BUCKETED_READY.add(sf_dir)
    o = spark.table("silver_orders_b")
    p = spark.table("silver_payments_b")
    return gold_customer_summary_df(
        silver_customers(spark, sf_dir), o, p, payments_join_key="order_id"
    )


def gold_customer_summary_df(
    c: DataFrame, o: DataFrame, p: DataFrame, payments_join_key: str = "order_key"
) -> DataFrame:
    """Pure transformation: silver entities → customer summary mart.

    ``payments_join_key`` selects the p⋈o equi-join key; order_key (md5
    surrogate) and order_id (natural key) are 1:1 so the output is
    identical — bucketed callers pass the bucket key to keep the join
    shuffle-free.
    """
    completed = F.col("is_completed")
    amt = F.col("order_amount")

    customer_orders = o.groupBy("customer_key").agg(
        F.count("order_key").alias("total_orders"),
        F.count(F.when(completed, F.col("order_key"))).alias("completed_orders"),
        F.count(F.when(F.col("is_cancelled"), F.col("order_key"))).alias("cancelled_orders"),
        F.count(F.when(F.col("is_pending"), F.col("order_key"))).alias("pending_orders"),
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
        F.sum(F.when(completed, amt).otherwise(_zero_dec())).alias("total_revenue_dec"),
        F.sum(F.when(completed, amt)).alias("completed_amt_dec"),
        F.count(F.when(completed, amt)).alias("completed_amt_cnt"),
        F.max(amt).alias("max_order_value_dec"),
        F.min(F.when(completed, amt)).alias("min_order_value_dec"),
        F.countDistinct("order_year_month").alias("active_months"),
    )
    # customer_orders feeds two consumers (the mart join and the as_of
    # scalar); pay_by_method feeds two (totals and preferred-method).
    # Lazily checkpoint both so the fact scan+join+aggregate runs ONCE per
    # mart build instead of twice — these are customer-grain frames,
    # orders of magnitude smaller than the facts, so the materialized
    # blocks are small at any scale. eager=False keeps the work inside
    # the first action (honest timing) while still deduplicating it.
    customer_orders = customer_orders.localCheckpoint(eager=False)

    # One pass over the payments fact: aggregate to (customer, method) grain,
    # then derive both the per-customer totals and the deterministic mode.
    pay_by_method = (
        p.where(F.col("is_successful_payment"))
        .join(o.select(payments_join_key, "customer_key"), payments_join_key, "inner")
        .groupBy("customer_key", "payment_method")
        .agg(
            F.count("payment_key").alias("n_payments"),
            F.sum("payment_amount").alias("amt_dec"),
        )
    ).localCheckpoint(eager=False)
    customer_payments = pay_by_method.groupBy("customer_key").agg(
        F.sum("n_payments").cast("long").alias("total_payments"),
        F.count("payment_method").alias("unique_payment_methods"),
        F.sum("amt_dec").alias("total_paid_dec"),
    )
    rn = F.row_number().over(
        Window.partitionBy("customer_key").orderBy(
            F.desc("n_payments"), F.asc("payment_method")
        )
    )
    preferred = (
        pay_by_method.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("customer_key", F.col("payment_method").alias("preferred_payment_method"))
    )

    # as_of = global max(order_date) — derived from the customer-grain
    # aggregate already computed above (max of last_order_date), saving a
    # third full pass over silver_orders; identical value by associativity.
    as_of = F.broadcast(
        customer_orders.agg(F.max("last_order_date").alias("as_of_date"))
    )

    rev0 = F.coalesce(F.col("total_revenue_dec"), _zero_dec())
    dsl = F.datediff(F.col("as_of_date"), F.col("last_order_date"))

    return (
        c.join(customer_orders, "customer_key", "left")
        .join(customer_payments, "customer_key", "left")
        .join(preferred, "customer_key", "left")
        .crossJoin(as_of)
        .select(
            "customer_key",
            "customer_id",
            "full_name",
            "first_name",
            "last_name",
            "email",
            F.col("created_at").alias("customer_since"),
            F.coalesce(F.col("total_orders"), F.lit(0)).cast("long").alias("total_orders"),
            F.coalesce(F.col("completed_orders"), F.lit(0)).cast("long").alias("completed_orders"),
            F.coalesce(F.col("cancelled_orders"), F.lit(0)).cast("long").alias("cancelled_orders"),
            F.coalesce(F.col("pending_orders"), F.lit(0)).cast("long").alias("pending_orders"),
            _dbl(rev0).alias("lifetime_value"),
            F.coalesce(
                _dbl(F.col("completed_amt_dec")) / F.when(F.col("completed_amt_cnt") != 0, F.col("completed_amt_cnt")),
                F.lit(0.0),
            ).alias("avg_order_value"),
            _dbl(F.coalesce(F.col("max_order_value_dec"), _zero_dec())).alias("max_order_value"),
            _dbl(F.coalesce(F.col("min_order_value_dec"), _zero_dec())).alias("min_order_value"),
            F.coalesce(F.col("total_payments"), F.lit(0)).cast("long").alias("total_payments"),
            F.coalesce(F.col("unique_payment_methods"), F.lit(0)).cast("long").alias("unique_payment_methods"),
            _dbl(F.coalesce(F.col("total_paid_dec"), _zero_dec())).alias("total_paid_amount"),
            "preferred_payment_method",
            "first_order_date",
            "last_order_date",
            F.coalesce(
                F.datediff(F.col("last_order_date"), F.col("first_order_date")), F.lit(0)
            ).cast("long").alias("customer_lifetime_days"),
            F.coalesce(F.col("active_months"), F.lit(0)).cast("long").alias("active_months"),
            dsl.cast("long").alias("days_since_last_order"),
            F.when(rev0 >= 500, "High Value")
            .when(rev0 >= 200, "Medium Value")
            .when(rev0 > 0, "Low Value")
            .otherwise("No Revenue")
            .alias("customer_segment"),
            F.when(F.col("last_order_date").isNull(), "Never Ordered")
            .when(dsl <= 30, "Active")
            .when(dsl <= 90, "At Risk")
            .when(dsl <= 180, "Inactive")
            .otherwise("Churned")
            .alias("customer_status"),
            F.when(dsl <= 30, 3).when(dsl <= 90, 2).otherwise(1).cast("long").alias("recency_score"),
            F.when(F.coalesce(F.col("total_orders"), F.lit(0)) >= 5, 3)
            .when(F.coalesce(F.col("total_orders"), F.lit(0)) >= 2, 2)
            .otherwise(1)
            .cast("long")
            .alias("frequency_score"),
            F.when(rev0 >= 500, 3).when(rev0 >= 200, 2).otherwise(1).cast("long").alias("monetary_score"),
            _updated_at().alias("_updated_at"),
        )
    )


_DAILY_KEYS = [
    "order_date",
    "order_year",
    "order_month",
    "order_day",
    "order_quarter",
    "order_year_month",
    "order_year_quarter",
    "order_day_name",
]


def gold_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/gold/gold_order_metrics.sql."""
    return gold_order_metrics_df(silver_orders(spark, sf_dir))


def gold_order_metrics_df(o: DataFrame) -> DataFrame:
    """Pure transformation: silver_orders → daily order metrics."""
    completed = F.col("is_completed")
    amt = F.col("order_amount")

    daily = o.groupBy(*_DAILY_KEYS).agg(
        F.count("order_key").alias("total_orders"),
        F.count(F.when(completed, F.col("order_key"))).alias("completed_orders"),
        F.count(F.when(F.col("is_cancelled"), F.col("order_key"))).alias("cancelled_orders"),
        F.count(F.when(F.col("is_pending"), F.col("order_key"))).alias("pending_orders"),
        F.countDistinct("customer_key").alias("unique_customers"),
        F.sum(F.when(completed, amt).otherwise(_zero_dec())).alias("rev_dec"),
        F.sum(F.when(completed, amt)).alias("avg_sum_dec"),
        F.count(F.when(completed, amt)).alias("avg_cnt"),
        F.max(amt).alias("max_dec"),
        F.min(F.when(completed, amt)).alias("min_dec"),
        F.sum(amt).alias("potential_dec"),
        F.sum(F.when(F.col("is_cancelled"), amt).otherwise(_zero_dec())).alias("lost_dec"),
    )

    w = Window.orderBy("order_date")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w7 = w.rowsBetween(-6, Window.currentRow)

    lag1 = F.lag(F.col("rev_dec"), 1).over(w)
    lag7 = F.lag(F.col("rev_dec"), 7).over(w)

    return (
        daily.select(
            *_DAILY_KEYS,
            "total_orders",
            "completed_orders",
            "cancelled_orders",
            "pending_orders",
            "unique_customers",
            _dbl(F.col("rev_dec")).alias("total_revenue"),
            _safe_div(_dbl(F.col("avg_sum_dec")), F.col("avg_cnt").cast("double")).alias("avg_order_value"),
            _dbl(F.col("max_dec")).alias("max_order_value"),
            _dbl(F.col("min_dec")).alias("min_order_value"),
            _dbl(F.col("potential_dec")).alias("potential_revenue"),
            _dbl(F.col("lost_dec")).alias("lost_revenue"),
            F.round(
                _safe_div(F.col("completed_orders").cast("double") * 100, F.col("total_orders").cast("double")), 2
            ).alias("completion_rate"),
            F.round(
                _safe_div(F.col("cancelled_orders").cast("double") * 100, F.col("total_orders").cast("double")), 2
            ).alias("cancellation_rate"),
            F.round(
                _safe_div(F.col("total_orders").cast("double"), F.col("unique_customers").cast("double")), 2
            ).alias("orders_per_customer"),
            _dbl(F.sum("rev_dec").over(wcum)).alias("cumulative_revenue"),
            F.sum("total_orders").over(wcum).cast("long").alias("cumulative_orders"),
            (_dbl(F.sum("rev_dec").over(w7)) / F.count("rev_dec").over(w7)).alias("revenue_7day_ma"),
            (_dbl(F.sum("total_orders").over(w7)) / F.count("total_orders").over(w7)).alias("orders_7day_ma"),
            _dbl(lag1).alias("prior_day_revenue"),
            _dbl(lag7).alias("week_ago_revenue"),
            F.round(
                _safe_div((_dbl(F.col("rev_dec")) - _dbl(lag1)) * 100, _dbl(lag1)), 2
            ).alias("revenue_growth_vs_prior_day_pct"),
            F.round(
                _safe_div((_dbl(F.col("rev_dec")) - _dbl(lag7)) * 100, _dbl(lag7)), 2
            ).alias("revenue_growth_vs_week_ago_pct"),
            _updated_at().alias("_updated_at"),
        )
        .orderBy(F.desc("order_date"))
    )


_MONTH_KEYS = [
    "order_year",
    "order_month",
    "order_year_month",
    "order_quarter",
    "order_year_quarter",
]

_PIVOT_METHODS = ["credit_card", "bank_transfer", "paypal", "cash", "other"]


def gold_revenue_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/gold/gold_revenue_analysis.sql.

    NOTE (parity): the reference's payment pivot enumerates only
    credit_card / bank_transfer / paypal / cash / other — digital_wallet
    revenue is silently excluded there, and we reproduce that exactly.
    """
    o = silver_orders(spark, sf_dir).localCheckpoint(eager=True)
    return gold_revenue_analysis_df(o, silver_payments_for_agg(spark, sf_dir, o))


def gold_revenue_analysis_df(so: DataFrame, sp: DataFrame) -> DataFrame:
    """Pure transformation: (silver_orders, silver_payments) → monthly mart."""
    o = so.where(F.col("is_completed"))
    p = sp.where(F.col("is_successful_payment"))

    monthly = o.groupBy(*_MONTH_KEYS).agg(
        F.count("order_key").alias("total_orders"),
        F.countDistinct("customer_key").alias("unique_customers"),
        F.sum("order_amount").alias("rev_dec"),
        F.max("order_amount").alias("max_dec"),
        F.min("order_amount").alias("min_dec"),
    )

    pivot = (
        p.join(o.select("order_key", "order_date"), "order_key", "inner")
        .groupBy(F.date_format("order_date", "yyyy-MM").alias("order_year_month"))
        .agg(
            *[
                _dbl(
                    F.sum(
                        F.when(F.col("payment_method") == m, F.col("payment_amount")).otherwise(_zero_dec())
                    )
                ).alias(f"{m}_revenue")
                for m in _PIVOT_METHODS
            ]
        )
    )

    wm = Window.orderBy("order_year_month")
    wytd = Window.partitionBy("order_year").orderBy("order_month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lag1 = F.lag(F.col("rev_dec"), 1).over(wm)
    lag12 = F.lag(F.col("rev_dec"), 12).over(wm)
    lag1_orders = F.lag(F.col("total_orders"), 1).over(wm)

    enriched = monthly.select(
        *_MONTH_KEYS,
        "total_orders",
        "unique_customers",
        _dbl(F.col("rev_dec")).alias("total_revenue"),
        (_dbl(F.col("rev_dec")) / F.col("total_orders")).alias("avg_order_value"),
        _dbl(F.col("max_dec")).alias("max_order_value"),
        _dbl(F.col("min_dec")).alias("min_order_value"),
        F.round(
            _safe_div(F.col("total_orders").cast("double"), F.col("unique_customers").cast("double")), 2
        ).alias("orders_per_customer"),
        _dbl(lag1).alias("prev_month_revenue"),
        _dbl(lag12).alias("year_ago_revenue"),
        lag1_orders.cast("long").alias("prev_month_orders"),
        F.round(_safe_div((_dbl(F.col("rev_dec")) - _dbl(lag1)) * 100, _dbl(lag1)), 2).alias(
            "revenue_growth_mom_pct"
        ),
        F.round(
            _safe_div(
                (F.col("total_orders") - lag1_orders).cast("double") * 100,
                lag1_orders.cast("double"),
            ),
            2,
        ).alias("orders_growth_mom_pct"),
        F.round(_safe_div((_dbl(F.col("rev_dec")) - _dbl(lag12)) * 100, _dbl(lag12)), 2).alias(
            "revenue_growth_yoy_pct"
        ),
        _dbl(F.sum("rev_dec").over(wytd)).alias("ytd_revenue"),
        F.sum("total_orders").over(wytd).cast("long").alias("ytd_orders"),
    )

    return (
        enriched.join(pivot, "order_year_month", "left")
        .select(
            *_MONTH_KEYS,
            "total_orders",
            "unique_customers",
            "total_revenue",
            "avg_order_value",
            "max_order_value",
            "min_order_value",
            "orders_per_customer",
            "prev_month_revenue",
            "year_ago_revenue",
            "prev_month_orders",
            "revenue_growth_mom_pct",
            "orders_growth_mom_pct",
            "revenue_growth_yoy_pct",
            "ytd_revenue",
            "ytd_orders",
            *[f"{m}_revenue" for m in _PIVOT_METHODS],
            _updated_at().alias("_updated_at"),
        )
        .orderBy(F.desc("order_year_month"))
    )


def gold_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    completed orders — the classic e-commerce gold mart the reference's
    customer summary feeds (models/gold/gold_customer_summary.sql is the
    totals side; this is the marketing-segmentation side).

    Scores are quintile-boundary comparisons, not ntile: ntile(5) over
    ALL customers is a single-partition global sort at 100 TB, while
    four percentile boundaries are one extra pass over the customer-
    grain aggregate (broadcast back as scalars). Exact percentile over
    one group is the documented knob — swap to approx_percentile at
    extreme scale (same note as customer_order_percentiles). The
    customer aggregate is lazily checkpointed so its shuffle runs once
    for both the boundary pass and the final scoring pass.
    """
    from ecommerce_dbt_medallion_spark.models.silver import silver_orders

    cust = (
        silver_orders(spark, sf_dir)
        .where(F.col("is_completed"))
        .groupBy("customer_key")
        .agg(
            F.max("order_date").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum("order_amount").alias("monetary_dec"),
        )
        .localCheckpoint(eager=False)
    )
    as_of = F.broadcast(cust.agg(F.max("last_order").alias("as_of")))
    rfm = cust.crossJoin(as_of).select(
        "customer_key",
        F.datediff(F.col("as_of"), F.col("last_order")).cast("long").alias(
            "recency_days"
        ),
        "frequency",
        F.col("monetary_dec").cast("double").alias("monetary"),
    )
    rec, freq, mon = (
        F.col("recency_days").cast("double"),
        F.col("frequency").cast("double"),
        F.col("monetary"),
    )
    bounds = F.broadcast(
        rfm.agg(
            *[
                F.percentile(c, F.lit(p)).alias(f"{n}_q{int(p * 100)}")
                for n, c in [("r", rec), ("f", freq), ("m", mon)]
                for p in (0.2, 0.4, 0.6, 0.8)
            ]
        )
    )

    def _score_asc(col: Column, name: str) -> Column:
        s = F.lit(1)
        for q in (20, 40, 60, 80):
            s = s + (col > F.col(f"{name}_q{q}")).cast("int")
        return s.cast("long")

    def _score_desc(col: Column, name: str) -> Column:
        s = F.lit(1)
        for q in (80, 60, 40, 20):
            s = s + (col < F.col(f"{name}_q{q}")).cast("int")
        return s.cast("long")

    scored = rfm.crossJoin(bounds).select(
        "customer_key",
        "recency_days",
        "frequency",
        "monetary",
        _score_desc(rec, "r").alias("r_score"),
        _score_asc(freq, "f").alias("f_score"),
        _score_asc(mon, "m").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_segment",
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular"),
    )


ORACLE_GOLD_RFM_FINAL = """
, rfm_base as (
    select customer_key,
        max(order_date) as last_order,
        count(*) as frequency,
        sum(order_amount) as monetary_dec
    from silver_orders where is_completed group by customer_key
),
rfm_asof as (select max(last_order) as as_of from rfm_base),
rfm as (
    select b.customer_key,
        cast(date_diff('day', b.last_order, a.as_of) as bigint) as recency_days,
        b.frequency,
        cast(b.monetary_dec as double) as monetary
    from rfm_base b cross join rfm_asof a
),
bounds as (
    select
        quantile_cont(cast(recency_days as double), 0.2) as r_q20,
        quantile_cont(cast(recency_days as double), 0.4) as r_q40,
        quantile_cont(cast(recency_days as double), 0.6) as r_q60,
        quantile_cont(cast(recency_days as double), 0.8) as r_q80,
        quantile_cont(cast(frequency as double), 0.2) as f_q20,
        quantile_cont(cast(frequency as double), 0.4) as f_q40,
        quantile_cont(cast(frequency as double), 0.6) as f_q60,
        quantile_cont(cast(frequency as double), 0.8) as f_q80,
        quantile_cont(monetary, 0.2) as m_q20,
        quantile_cont(monetary, 0.4) as m_q40,
        quantile_cont(monetary, 0.6) as m_q60,
        quantile_cont(monetary, 0.8) as m_q80
    from rfm
),
scored as (
    select customer_key, recency_days, frequency, monetary,
        cast(1 + cast(cast(recency_days as double) < r_q80 as int)
               + cast(cast(recency_days as double) < r_q60 as int)
               + cast(cast(recency_days as double) < r_q40 as int)
               + cast(cast(recency_days as double) < r_q20 as int) as bigint) as r_score,
        cast(1 + cast(cast(frequency as double) > f_q20 as int)
               + cast(cast(frequency as double) > f_q40 as int)
               + cast(cast(frequency as double) > f_q60 as int)
               + cast(cast(frequency as double) > f_q80 as int) as bigint) as f_score,
        cast(1 + cast(monetary > m_q20 as int)
               + cast(monetary > m_q40 as int)
               + cast(monetary > m_q60 as int)
               + cast(monetary > m_q80 as int) as bigint) as m_score
    from rfm cross join bounds
)
select *,
    case
        when r_score >= 4 and f_score >= 4 and m_score >= 4 then 'champion'
        when r_score >= 4 and f_score <= 2 then 'new'
        when r_score <= 2 and f_score >= 4 then 'at_risk'
        when r_score <= 2 and f_score <= 2 then 'hibernating'
        else 'regular'
    end as rfm_segment
from scored
"""


# Fixed (pretend-trained) churn-model coefficients — inference only:
# the point of the operator is SQL-native model scoring fused into the
# mart scan (no UDF, no serving hop), cf. "ML inference pipeline
# execution using pure SQL based on operator fusion" (ICDE 2025 theme).
CHURN_COEF = {
    "intercept": -1.0,
    "days_since_last_order": 0.015,
    "total_orders": -0.2,
    "lifetime_value": -0.002,
    "active_months": -0.1,
}


def churn_risk_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear churn-model inference over gold_customer_summary features.

    The margin is a fixed-order double expression (literal coefficients
    × exact-sourced features), identical across engines — the sigmoid is
    deliberately NOT applied (libm exp() differs at ULP level between
    engines; monotone in the margin, so thresholds are equivalent).
    Scoring fuses into the mart projection: zero extra shuffles.
    """
    c = CHURN_COEF
    g = gold_customer_summary(spark, sf_dir)
    margin = (
        F.lit(c["intercept"])
        + F.lit(c["days_since_last_order"]) * F.col("days_since_last_order")
        + F.lit(c["total_orders"]) * F.col("total_orders")
        + F.lit(c["lifetime_value"]) * F.col("lifetime_value")
        + F.lit(c["active_months"]) * F.col("active_months")
    )
    return g.select(
        "customer_key",
        "days_since_last_order",
        "total_orders",
        "lifetime_value",
        "active_months",
        margin.alias("churn_margin"),
        (margin > 0).alias("churn_flag"),
        F.when(margin > 0.5, "high")
        .when(margin > -0.5, "medium")
        .otherwise("low")
        .alias("risk_band"),
    )


def oracle_churn_final() -> str:
    c = CHURN_COEF
    margin = (
        f"cast({c['intercept']} as double) "
        f"+ cast({c['days_since_last_order']} as double) * days_since_last_order "
        f"+ cast({c['total_orders']} as double) * total_orders "
        f"+ cast({c['lifetime_value']} as double) * lifetime_value "
        f"+ cast({c['active_months']} as double) * active_months"
    )
    return f"""
select customer_key, days_since_last_order, total_orders, lifetime_value,
    active_months,
    {margin} as churn_margin,
    ({margin}) > 0 as churn_flag,
    case when ({margin}) > 0.5 then 'high'
         when ({margin}) > -0.5 then 'medium'
         else 'low' end as risk_band
from gold_customer_summary
"""
