"""DuckDB oracle SQL — independent re-statement of every medallion model
in ANSI-ish SQL, used by the driver (and tests/test_parity.py) to
hash-verify the Spark results at sf=0.01.

Structured as composable CTE bodies + a dependency graph; ``assemble(name)``
emits one WITH-query containing the full upstream chain. Base tables
(customer/orders/lineitem/...) are pre-registered DuckDB views.

DuckDB dialect deltas vs the Spark side (semantically identical):
- no initcap → upper(first char) || lower(rest) (names are single-token)
- date_format → strftime / dayname
- datediff → date_diff('day', start, end)
- make_interval → to_days/to_seconds interval helpers
"""

from __future__ import annotations

BATCH = "TIMESTAMP '2026-01-01 00:00:00'"

# ---------------------------------------------------------------- raw layer

_RAW_CUSTOMERS = """
select
    id,
    case when id % 59 = 0 then null
         when id % 7 = 0 then '  ' || f0 || ' '
         else f0 end as first_name,
    case when id % 61 = 0 then null else l0 end as last_name,
    case when id % 53 = 0 then null
         when id % 47 = 0 then regexp_replace(email_base, '@', '-at-')
         when id % 11 = 0 then upper(email_base)
         else email_base end as email,
    TIMESTAMP '2020-01-01 00:00:00'
        + to_days(cast(id % 1461 as int))
        + to_seconds(cast((id * 7919) % 86400 as int)) as created_at
from (
    select
        id,
        case when id % 3 = 0 then upper(base_first)
             when id % 3 = 1 then lower(base_first)
             else base_first end as f0,
        case when id % 4 = 0 then upper(base_last) else base_last end as l0,
        lower(base_first) || '.' || lower(base_last) || '@' ||
            (case when id % 5 = 0 then 'example.com'
                  when id % 5 = 1 then 'shop-mail.com'
                  when id % 5 = 2 then 'gmail.com'
                  when id % 5 = 3 then 'outlook.com'
                  else 'mail.co' end) as email_base
    from (
        select
            c_custkey as id,
            split_part(c_name, '#', 1) as base_first,
            'c' || split_part(c_name, '#', 2) as base_last
        from customer
    )
)
"""

_RAW_ORDERS = """
select
    o_orderkey as id,
    o_custkey as user_id,
    case when o_orderkey % 89 = 0 then null
         else cast(o_orderdate as date) end as order_date,
    case when o_orderkey % 101 = 0 then 'mystery'
         when o_orderstatus = 'F' then
            (case when o_orderkey % 4 = 0 then 'completed'
                  when o_orderkey % 4 = 1 then 'Complete'
                  when o_orderkey % 4 = 2 then 'SUCCESS'
                  else 'delivered' end)
         when o_orderstatus = 'O' then
            (case when o_orderkey % 3 = 0 then 'pending'
                  when o_orderkey % 3 = 1 then 'Processing'
                  else 'IN_PROGRESS' end)
         else
            (case when o_orderkey % 4 = 0 then 'cancelled'
                  when o_orderkey % 4 = 1 then 'Canceled'
                  when o_orderkey % 4 = 2 then 'FAILED'
                  else 'returned' end)
    end as status,
    case when o_orderkey % 97 = 0 then -cast(o_totalprice as decimal(18,2))
         else cast(o_totalprice as decimal(18,2)) end as amount,
    {BATCH} as _loaded_at
from orders
"""

_RAW_PAYMENTS = """
select
    l_orderkey * 1000 + l_linenumber * 10 +
        (row_number() over (partition by l_orderkey, l_linenumber
                            order by l_suppkey, l_partkey) - 1) as id,
    l_orderkey as order_id,
    case when l_suppkey % 11 = 0 then 'credit_card'
         when l_suppkey % 11 = 1 then 'Credit Card'
         when l_suppkey % 11 = 2 then 'VISA'
         when l_suppkey % 11 = 3 then 'mastercard'
         when l_suppkey % 11 = 4 then 'wire'
         when l_suppkey % 11 = 5 then 'ACH'
         when l_suppkey % 11 = 6 then 'PayPal'
         when l_suppkey % 11 = 7 then 'cash on delivery'
         when l_suppkey % 11 = 8 then 'COD'
         when l_suppkey % 11 = 9 then 'apple_pay'
         else 'crypto' end as payment_method,
    case when (l_orderkey + l_linenumber) % 29 = 0
         then -cast(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(4,2))) as decimal(18,4))
         else cast(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(4,2))) as decimal(18,4)) end as amount,
    l_shipdate as payment_date
from lineitem
"""

# ------------------------------------------------------------- bronze layer

_BRONZE_CUSTOMERS = """
select
    id as customer_id, first_name, last_name, email, created_at,
    {BATCH} as _loaded_at, 'bronze_customers' as _source_model
from raw_customers
"""

_BRONZE_ORDERS = """
select
    id as order_id, user_id as customer_id, order_date,
    status as order_status, amount as order_amount,
    _loaded_at, 'bronze_orders' as _source_model
from raw_orders
"""

_BRONZE_PAYMENTS = """
select
    id as payment_id, order_id, payment_method, amount as payment_amount,
    payment_date, {BATCH} as _loaded_at, 'bronze_payments' as _source_model
from raw_payments
"""

# ------------------------------------------------------------- silver layer

_INITCAP_FIRST = "upper(substr(trim(first_name), 1, 1)) || lower(substr(trim(first_name), 2))"
_INITCAP_LAST = "upper(substr(trim(last_name), 1, 1)) || lower(substr(trim(last_name), 2))"

_SILVER_CUSTOMERS = f"""
select
    md5(cast(customer_id as varchar)) as customer_key,
    customer_id,
    {_INITCAP_FIRST} as first_name,
    {_INITCAP_LAST} as last_name,
    {_INITCAP_FIRST} || ' ' || {_INITCAP_LAST} as full_name,
    lower(trim(email)) as email,
    created_at,
    _loaded_at,
    {{BATCH}} as _updated_at,
    cast(case when first_name is null then 1
              when last_name is null then 1
              when email is null then 1
              when email not like '%@%.%' then 1
              else 0 end as bigint) as _has_data_quality_issues
from bronze_customers
where email is not null
  and first_name is not null
  and last_name is not null
  and email like '%@%.%'
"""

_COMPLETED_IN = "('completed', 'complete', 'success', 'delivered')"
_PENDING_IN = "('pending', 'processing', 'in_progress')"
_CANCELLED_IN = "('cancelled', 'canceled', 'failed', 'returned')"

_SILVER_ORDERS = f"""
select
    md5(cast(o.order_id as varchar)) as order_key,
    c.customer_key,
    o.order_id,
    o.customer_id,
    o.order_date,
    case when lower(o.order_status) in {_COMPLETED_IN} then 'completed'
         when lower(o.order_status) in {_PENDING_IN} then 'pending'
         when lower(o.order_status) in {_CANCELLED_IN} then 'cancelled'
         else 'unknown' end as order_status,
    lower(o.order_status) in {_COMPLETED_IN} as is_completed,
    lower(o.order_status) in {_CANCELLED_IN} as is_cancelled,
    lower(o.order_status) in {_PENDING_IN} as is_pending,
    o.order_amount,
    cast(extract(year from o.order_date) as bigint) as order_year,
    cast(extract(month from o.order_date) as bigint) as order_month,
    cast(extract(day from o.order_date) as bigint) as order_day,
    cast(extract(quarter from o.order_date) as bigint) as order_quarter,
    dayname(o.order_date) as order_day_name,
    strftime(o.order_date, '%Y-%m') as order_year_month,
    cast(extract(year from o.order_date) as varchar) || '-' ||
        cast(extract(quarter from o.order_date) as varchar) as order_year_quarter,
    o._loaded_at,
    {{BATCH}} as _updated_at,
    cast(case when o.order_amount <= 0 then 1
              when o.order_date is null then 1
              when c.customer_key is null then 1
              else 0 end as bigint) as _has_data_quality_issues
from bronze_orders o
inner join silver_customers c on o.customer_id = c.customer_id
where o.order_amount > 0 and o.order_date is not null
"""

_SILVER_PAYMENTS = """
select
    md5(cast(p.payment_id as varchar)) as payment_key,
    o.order_key,
    p.payment_id,
    p.order_id,
    case when lower(p.payment_method) in ('credit_card', 'credit card', 'cc', 'visa', 'mastercard', 'amex')
            then 'credit_card'
         when lower(p.payment_method) in ('bank_transfer', 'bank transfer', 'wire', 'ach', 'direct_debit')
            then 'bank_transfer'
         when lower(p.payment_method) in ('paypal', 'pp') then 'paypal'
         when lower(p.payment_method) in ('cash', 'cash on delivery', 'cod') then 'cash'
         when lower(p.payment_method) in ('apple_pay', 'google_pay', 'digital_wallet')
            then 'digital_wallet'
         else 'other' end as payment_method,
    p.payment_amount,
    p.payment_date,
    p.payment_amount > 0 as is_successful_payment,
    p.payment_amount <= 0 as is_failed_payment,
    case when p.payment_amount < 50 then 'small'
         when p.payment_amount < 200 then 'medium'
         when p.payment_amount < 500 then 'large'
         else 'very_large' end as payment_size_category,
    p._loaded_at,
    {BATCH} as _updated_at,
    cast(case when p.payment_amount <= 0 then 1
              when p.payment_date is null then 1
              when o.order_key is null then 1
              else 0 end as bigint) as _has_data_quality_issues
from bronze_payments p
inner join silver_orders o on p.order_id = o.order_id
"""

# --------------------------------------------------------------- gold layer

_GCS_CUSTOMER_ORDERS = """
select
    customer_key,
    count(order_key) as total_orders,
    count(case when is_completed then order_key end) as completed_orders,
    count(case when is_cancelled then order_key end) as cancelled_orders,
    count(case when is_pending then order_key end) as pending_orders,
    min(order_date) as first_order_date,
    max(order_date) as last_order_date,
    sum(case when is_completed then order_amount else cast(0 as decimal(18,2)) end) as total_revenue_dec,
    sum(case when is_completed then order_amount end) as completed_amt_dec,
    count(case when is_completed then order_amount end) as completed_amt_cnt,
    max(order_amount) as max_order_value_dec,
    min(case when is_completed then order_amount end) as min_order_value_dec,
    count(distinct order_year_month) as active_months
from silver_orders
group by customer_key
"""

_GCS_PAY_BY_METHOD = """
select
    o.customer_key,
    p.payment_method,
    count(p.payment_key) as n_payments,
    sum(p.payment_amount) as amt_dec
from silver_payments p
inner join silver_orders o on p.order_key = o.order_key
where p.is_successful_payment
group by o.customer_key, p.payment_method
"""

_GCS_CUSTOMER_PAYMENTS = """
select
    customer_key,
    cast(sum(n_payments) as bigint) as total_payments,
    count(payment_method) as unique_payment_methods,
    sum(amt_dec) as total_paid_dec
from gcs_pay_by_method
group by customer_key
"""

_GCS_PREFERRED = """
select customer_key, payment_method as preferred_payment_method
from (
    select customer_key, payment_method,
           row_number() over (
               partition by customer_key
               order by n_payments desc, payment_method asc
           ) as rn
    from gcs_pay_by_method
)
where rn = 1
"""

_GCS_AS_OF = "select max(order_date) as as_of_date from silver_orders"

_GOLD_CUSTOMER_SUMMARY = """
select
    c.customer_key,
    c.customer_id,
    c.full_name,
    c.first_name,
    c.last_name,
    c.email,
    c.created_at as customer_since,
    cast(coalesce(co.total_orders, 0) as bigint) as total_orders,
    cast(coalesce(co.completed_orders, 0) as bigint) as completed_orders,
    cast(coalesce(co.cancelled_orders, 0) as bigint) as cancelled_orders,
    cast(coalesce(co.pending_orders, 0) as bigint) as pending_orders,
    cast(coalesce(co.total_revenue_dec, 0) as double) as lifetime_value,
    coalesce(
        cast(co.completed_amt_dec as double) /
            (case when co.completed_amt_cnt <> 0 then co.completed_amt_cnt end),
        cast(0 as double)
    ) as avg_order_value,
    cast(coalesce(co.max_order_value_dec, 0) as double) as max_order_value,
    cast(coalesce(co.min_order_value_dec, 0) as double) as min_order_value,
    cast(coalesce(cp.total_payments, 0) as bigint) as total_payments,
    cast(coalesce(cp.unique_payment_methods, 0) as bigint) as unique_payment_methods,
    cast(coalesce(cp.total_paid_dec, 0) as double) as total_paid_amount,
    pf.preferred_payment_method,
    co.first_order_date,
    co.last_order_date,
    cast(coalesce(date_diff('day', co.first_order_date, co.last_order_date), 0) as bigint)
        as customer_lifetime_days,
    cast(coalesce(co.active_months, 0) as bigint) as active_months,
    cast(date_diff('day', co.last_order_date, a.as_of_date) as bigint) as days_since_last_order,
    case when coalesce(co.total_revenue_dec, 0) >= 500 then 'High Value'
         when coalesce(co.total_revenue_dec, 0) >= 200 then 'Medium Value'
         when coalesce(co.total_revenue_dec, 0) > 0 then 'Low Value'
         else 'No Revenue' end as customer_segment,
    case when co.last_order_date is null then 'Never Ordered'
         when date_diff('day', co.last_order_date, a.as_of_date) <= 30 then 'Active'
         when date_diff('day', co.last_order_date, a.as_of_date) <= 90 then 'At Risk'
         when date_diff('day', co.last_order_date, a.as_of_date) <= 180 then 'Inactive'
         else 'Churned' end as customer_status,
    cast(case when date_diff('day', co.last_order_date, a.as_of_date) <= 30 then 3
              when date_diff('day', co.last_order_date, a.as_of_date) <= 90 then 2
              else 1 end as bigint) as recency_score,
    cast(case when coalesce(co.total_orders, 0) >= 5 then 3
              when coalesce(co.total_orders, 0) >= 2 then 2
              else 1 end as bigint) as frequency_score,
    cast(case when coalesce(co.total_revenue_dec, 0) >= 500 then 3
              when coalesce(co.total_revenue_dec, 0) >= 200 then 2
              else 1 end as bigint) as monetary_score,
    {BATCH} as _updated_at
from silver_customers c
left join gcs_customer_orders co on c.customer_key = co.customer_key
left join gcs_customer_payments cp on c.customer_key = cp.customer_key
left join gcs_preferred pf on c.customer_key = pf.customer_key
cross join gcs_as_of a
"""

_GOM_DAILY = """
select
    order_date, order_year, order_month, order_day, order_quarter,
    order_year_month, order_year_quarter, order_day_name,
    count(order_key) as total_orders,
    count(case when is_completed then order_key end) as completed_orders,
    count(case when is_cancelled then order_key end) as cancelled_orders,
    count(case when is_pending then order_key end) as pending_orders,
    count(distinct customer_key) as unique_customers,
    sum(case when is_completed then order_amount else cast(0 as decimal(18,2)) end) as rev_dec,
    sum(case when is_completed then order_amount end) as avg_sum_dec,
    count(case when is_completed then order_amount end) as avg_cnt,
    max(order_amount) as max_dec,
    min(case when is_completed then order_amount end) as min_dec,
    sum(order_amount) as potential_dec,
    sum(case when is_cancelled then order_amount else cast(0 as decimal(18,2)) end) as lost_dec
from silver_orders
group by order_date, order_year, order_month, order_day, order_quarter,
         order_year_month, order_year_quarter, order_day_name
"""

_GOLD_ORDER_METRICS = """
select
    order_date, order_year, order_month, order_day, order_quarter,
    order_year_month, order_year_quarter, order_day_name,
    total_orders, completed_orders, cancelled_orders, pending_orders,
    unique_customers,
    cast(rev_dec as double) as total_revenue,
    cast(avg_sum_dec as double) /
        (case when avg_cnt <> 0 then cast(avg_cnt as double) end) as avg_order_value,
    cast(max_dec as double) as max_order_value,
    cast(min_dec as double) as min_order_value,
    cast(potential_dec as double) as potential_revenue,
    cast(lost_dec as double) as lost_revenue,
    round(cast(completed_orders as double) * 100 /
        (case when total_orders <> 0 then cast(total_orders as double) end), 2) as completion_rate,
    round(cast(cancelled_orders as double) * 100 /
        (case when total_orders <> 0 then cast(total_orders as double) end), 2) as cancellation_rate,
    round(cast(total_orders as double) /
        (case when unique_customers <> 0 then cast(unique_customers as double) end), 2) as orders_per_customer,
    cast(sum(rev_dec) over wcum as double) as cumulative_revenue,
    cast(sum(total_orders) over wcum as bigint) as cumulative_orders,
    cast(sum(rev_dec) over w7 as double) / count(rev_dec) over w7 as revenue_7day_ma,
    cast(sum(total_orders) over w7 as double) / count(total_orders) over w7 as orders_7day_ma,
    cast(lag(rev_dec, 1) over wd as double) as prior_day_revenue,
    cast(lag(rev_dec, 7) over wd as double) as week_ago_revenue,
    round((cast(rev_dec as double) - cast(lag(rev_dec, 1) over wd as double)) * 100 /
        (case when cast(lag(rev_dec, 1) over wd as double) <> 0
              then cast(lag(rev_dec, 1) over wd as double) end), 2) as revenue_growth_vs_prior_day_pct,
    round((cast(rev_dec as double) - cast(lag(rev_dec, 7) over wd as double)) * 100 /
        (case when cast(lag(rev_dec, 7) over wd as double) <> 0
              then cast(lag(rev_dec, 7) over wd as double) end), 2) as revenue_growth_vs_week_ago_pct,
    {BATCH} as _updated_at
from gom_daily
window
    wd as (order by order_date),
    wcum as (order by order_date rows between unbounded preceding and current row),
    w7 as (order by order_date rows between 6 preceding and current row)
"""

_GRA_MONTHLY = """
select
    order_year, order_month, order_year_month, order_quarter, order_year_quarter,
    count(order_key) as total_orders,
    count(distinct customer_key) as unique_customers,
    sum(order_amount) as rev_dec,
    max(order_amount) as max_dec,
    min(order_amount) as min_dec
from silver_orders
where is_completed
group by order_year, order_month, order_year_month, order_quarter, order_year_quarter
"""

_GRA_PIVOT = """
select
    strftime(o.order_date, '%Y-%m') as order_year_month,
    cast(sum(case when p.payment_method = 'credit_card' then p.payment_amount else cast(0 as decimal(18,2)) end) as double) as credit_card_revenue,
    cast(sum(case when p.payment_method = 'bank_transfer' then p.payment_amount else cast(0 as decimal(18,2)) end) as double) as bank_transfer_revenue,
    cast(sum(case when p.payment_method = 'paypal' then p.payment_amount else cast(0 as decimal(18,2)) end) as double) as paypal_revenue,
    cast(sum(case when p.payment_method = 'cash' then p.payment_amount else cast(0 as decimal(18,2)) end) as double) as cash_revenue,
    cast(sum(case when p.payment_method = 'other' then p.payment_amount else cast(0 as decimal(18,2)) end) as double) as other_revenue
from silver_payments p
inner join (select order_key, order_date from silver_orders where is_completed) o
    on p.order_key = o.order_key
where p.is_successful_payment
group by strftime(o.order_date, '%Y-%m')
"""

_GOLD_REVENUE_ANALYSIS = """
select
    mo.order_year, mo.order_month, mo.order_year_month, mo.order_quarter,
    mo.order_year_quarter, mo.total_orders, mo.unique_customers,
    cast(mo.rev_dec as double) as total_revenue,
    cast(mo.rev_dec as double) / mo.total_orders as avg_order_value,
    cast(mo.max_dec as double) as max_order_value,
    cast(mo.min_dec as double) as min_order_value,
    round(cast(mo.total_orders as double) /
        (case when mo.unique_customers <> 0 then cast(mo.unique_customers as double) end), 2) as orders_per_customer,
    cast(lag(mo.rev_dec, 1) over wm as double) as prev_month_revenue,
    cast(lag(mo.rev_dec, 12) over wm as double) as year_ago_revenue,
    cast(lag(mo.total_orders, 1) over wm as bigint) as prev_month_orders,
    round((cast(mo.rev_dec as double) - cast(lag(mo.rev_dec, 1) over wm as double)) * 100 /
        (case when cast(lag(mo.rev_dec, 1) over wm as double) <> 0
              then cast(lag(mo.rev_dec, 1) over wm as double) end), 2) as revenue_growth_mom_pct,
    round((cast(mo.total_orders as double) - cast(lag(mo.total_orders, 1) over wm as double)) * 100 /
        (case when cast(lag(mo.total_orders, 1) over wm as double) <> 0
              then cast(lag(mo.total_orders, 1) over wm as double) end), 2) as orders_growth_mom_pct,
    round((cast(mo.rev_dec as double) - cast(lag(mo.rev_dec, 12) over wm as double)) * 100 /
        (case when cast(lag(mo.rev_dec, 12) over wm as double) <> 0
              then cast(lag(mo.rev_dec, 12) over wm as double) end), 2) as revenue_growth_yoy_pct,
    cast(sum(mo.rev_dec) over wytd as double) as ytd_revenue,
    cast(sum(mo.total_orders) over wytd as bigint) as ytd_orders,
    pp.credit_card_revenue,
    pp.bank_transfer_revenue,
    pp.paypal_revenue,
    pp.cash_revenue,
    pp.other_revenue,
    {BATCH} as _updated_at
from gra_monthly mo
left join gra_pivot pp on mo.order_year_month = pp.order_year_month
window
    wm as (order by mo.order_year_month),
    wytd as (partition by mo.order_year order by mo.order_month
             rows between unbounded preceding and current row)
"""

# ------------------------------------------------------------ events layer

_EVENT_DAILY_STATS = """
select
    cast(ts as date) as event_date,
    event_type,
    count(event_id) as n_events,
    count(distinct user_id) as unique_users,
    cast(sum(cast(value as decimal(18,2))) as double) as total_value,
    cast(sum(cast(value as decimal(18,2))) as double) / count(event_id) as avg_value,
    cast(max(cast(value as decimal(18,2))) as double) as max_value,
    cast(min(cast(value as decimal(18,2))) as double) as min_value,
    cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) as sum_props_k
from events
group by cast(ts as date), event_type
"""

_EVENT_SESSIONS_BASE = """
select
    user_id, event_id, event_type, ts,
    epoch_us(ts) as ts_us,
    cast(value as decimal(18,2)) as val_dec,
    cast(sum(case when prev_us is null or ts_us0 - prev_us > 1800000000
                  then 1 else 0 end)
         over (partition by user_id order by ts_us0, event_id
               rows between unbounded preceding and current row) as bigint) as session_seq
from (
    select user_id, event_id, event_type, ts, value,
           epoch_us(ts) as ts_us0,
           lag(epoch_us(ts)) over (partition by user_id
                                   order by epoch_us(ts), event_id) as prev_us
    from events
)
"""

_EVENT_SESSIONIZATION = """
select
    user_id,
    session_seq,
    min(ts) as session_start,
    max(ts) as session_end,
    cast((max(ts_us) - min(ts_us)) // 1000000 as bigint) as duration_sec,
    count(event_id) as n_events,
    count(distinct event_type) as n_event_types,
    cast(sum(val_dec) as double) as total_value
from event_sessions_base
group by user_id, session_seq
"""

# ------------------------------------------------------- assembly machinery

CTES: dict[str, str] = {
    "raw_customers": _RAW_CUSTOMERS,
    "raw_orders": _RAW_ORDERS,
    "raw_payments": _RAW_PAYMENTS,
    "bronze_customers": _BRONZE_CUSTOMERS,
    "bronze_orders": _BRONZE_ORDERS,
    "bronze_payments": _BRONZE_PAYMENTS,
    "silver_customers": _SILVER_CUSTOMERS,
    "silver_orders": _SILVER_ORDERS,
    "silver_payments": _SILVER_PAYMENTS,
    "gcs_customer_orders": _GCS_CUSTOMER_ORDERS,
    "gcs_pay_by_method": _GCS_PAY_BY_METHOD,
    "gcs_customer_payments": _GCS_CUSTOMER_PAYMENTS,
    "gcs_preferred": _GCS_PREFERRED,
    "gcs_as_of": _GCS_AS_OF,
    "gold_customer_summary": _GOLD_CUSTOMER_SUMMARY,
    "gom_daily": _GOM_DAILY,
    "gold_order_metrics": _GOLD_ORDER_METRICS,
    "gra_monthly": _GRA_MONTHLY,
    "gra_pivot": _GRA_PIVOT,
    "gold_revenue_analysis": _GOLD_REVENUE_ANALYSIS,
    "event_daily_stats": _EVENT_DAILY_STATS,
    "event_sessions_base": _EVENT_SESSIONS_BASE,
    "event_sessionization": _EVENT_SESSIONIZATION,
}

DEPS: dict[str, list[str]] = {
    "raw_customers": [],
    "raw_orders": [],
    "raw_payments": [],
    "bronze_customers": ["raw_customers"],
    "bronze_orders": ["raw_orders"],
    "bronze_payments": ["raw_payments"],
    "silver_customers": ["bronze_customers"],
    "silver_orders": ["bronze_orders", "silver_customers"],
    "silver_payments": ["bronze_payments", "silver_orders"],
    "gcs_customer_orders": ["silver_orders"],
    "gcs_pay_by_method": ["silver_payments", "silver_orders"],
    "gcs_customer_payments": ["gcs_pay_by_method"],
    "gcs_preferred": ["gcs_pay_by_method"],
    "gcs_as_of": ["silver_orders"],
    "gold_customer_summary": [
        "silver_customers",
        "gcs_customer_orders",
        "gcs_customer_payments",
        "gcs_preferred",
        "gcs_as_of",
    ],
    "gom_daily": ["silver_orders"],
    "gold_order_metrics": ["gom_daily"],
    "gra_monthly": ["silver_orders"],
    "gra_pivot": ["silver_payments", "silver_orders"],
    "gold_revenue_analysis": ["gra_monthly", "gra_pivot"],
    "event_daily_stats": [],
    "event_sessions_base": [],
    "event_sessionization": ["event_sessions_base"],
}

# Final SELECT per public inventory key (casts decimals to double so the
# output schema matches the Spark side exactly).
FINAL_SELECTS: dict[str, str] = {
    "bronze_customers": "select * from bronze_customers",
    "bronze_orders": (
        "select order_id, customer_id, order_date, order_status, "
        "cast(order_amount as double) as order_amount, _loaded_at, _source_model "
        "from bronze_orders"
    ),
    "bronze_payments": (
        "select payment_id, order_id, payment_method, "
        "cast(payment_amount as double) as payment_amount, payment_date, "
        "_loaded_at, _source_model from bronze_payments"
    ),
    "silver_customers": "select * from silver_customers",
    "silver_orders": (
        "select order_key, customer_key, order_id, customer_id, order_date, "
        "order_status, is_completed, is_cancelled, is_pending, "
        "cast(order_amount as double) as order_amount, order_year, order_month, "
        "order_day, order_quarter, order_day_name, order_year_month, "
        "order_year_quarter, _loaded_at, _updated_at, _has_data_quality_issues "
        "from silver_orders"
    ),
    "silver_payments": (
        "select payment_key, order_key, payment_id, order_id, payment_method, "
        "cast(payment_amount as double) as payment_amount, payment_date, "
        "is_successful_payment, is_failed_payment, payment_size_category, "
        "_loaded_at, _updated_at, _has_data_quality_issues from silver_payments"
    ),
    "gold_customer_summary": "select * from gold_customer_summary",
    "gold_order_metrics": "select * from gold_order_metrics",
    "gold_revenue_analysis": "select * from gold_revenue_analysis",
    "event_daily_stats": "select * from event_daily_stats",
    "event_sessionization": "select * from event_sessionization",
}


def _topo(target: str, seen: set[str], order: list[str]) -> None:
    if target in seen:
        return
    seen.add(target)
    for dep in DEPS[target]:
        _topo(dep, seen, order)
    order.append(target)


def assemble(target: str, final_select: str | None = None) -> str:
    """Emit one WITH-query computing ``target`` plus its upstream chain."""
    seen: set[str] = set()
    order: list[str] = []
    _topo(target, seen, order)
    ctes = ",\n".join(
        f"{name} as (\n{CTES[name].format(BATCH=BATCH)}\n)" for name in order
    )
    final = final_select or FINAL_SELECTS.get(target) or f"select * from {target}"
    return f"with\n{ctes}\n{final}"


def assemble_many(targets: list[str], final_select: str) -> str:
    """WITH-query containing every target's chain, ending in final_select
    (final_select is used verbatim — no brace formatting)."""
    seen: set[str] = set()
    order: list[str] = []
    for t in targets:
        _topo(t, seen, order)
    ctes = ",\n".join(
        f"{name} as (\n{CTES[name].format(BATCH=BATCH)}\n)" for name in order
    )
    return f"with\n{ctes}\n{final_select}"


def oracle_sql_medallion() -> dict[str, str]:
    """Inventory-key → full DuckDB SQL for the medallion models."""
    return {key: assemble(key) for key in FINAL_SELECTS}
