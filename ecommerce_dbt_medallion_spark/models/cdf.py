"""Driver-gated lakehouse exercise: CREATE → MERGE → change data feed.

Round 6: the transaction-log engine (lakehouse.py) was fully covered by
tests/test_lakehouse.py but had no ``queries()`` key, so the driver's
hash gate never saw it. ``lakehouse_cdf`` closes that: a deterministic
CREATE TABLE from silver_orders, one keyed MERGE batch, then
``table_changes(v0→v1)`` — the oracle reconstructs the exact expected
change rows (Delta CDF semantics) in pure SQL, so MERGE matching,
whole-row-hash carry-over cancellation, and CDF classification are all
under the value-hash gate.

Scale shape: the MERGE rewrites only files containing matched keys
(file-skipping via min/max key stats); the CDF reads only files that
entered/left the live set — both proportional to churn, not table size
(lakehouse.py:237,580).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark import lakehouse
from ecommerce_dbt_medallion_spark.models.silver import silver_orders

# repo-anchored (works from any caller cwd), under gitignored
# spark-warehouse/
_GATE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.pardir,
    "spark-warehouse",
)


def _facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return silver_orders(spark, sf_dir).select(
        "order_id",
        "order_status",
        F.col("order_amount").cast("double").alias("amount"),
    )


def lakehouse_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory #32c: change-data-feed between two committed versions.

    v0 = orders with order_id % 3 != 0; the MERGE batch is orders with
    order_id % 2 == 0, amounts bumped by 1 (so every matched row really
    changes). Expected CDF: batch keys absent from v0 → insert; present
    → update_postimage (post-image values); carried-over rows in
    rewritten files must NOT appear (whole-row hash cancellation) — the
    oracle encodes exactly this, making the classification itself the
    thing under test.
    """
    tag = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(os.path.normpath(sf_dir)))
    table = os.path.normpath(os.path.join(_GATE_ROOT, f"cdf_gate_{tag}"))
    shutil.rmtree(table, ignore_errors=True)

    facts = _facts(spark, sf_dir)
    base = facts.where(F.col("order_id") % 3 != 0)
    batch = facts.where(F.col("order_id") % 2 == 0).withColumn(
        "amount", F.col("amount") + F.lit(1.0)
    )
    lakehouse.create_or_replace(spark, table, base, key="order_id")
    lakehouse.merge_into(spark, table, batch, "order_id")
    return lakehouse.table_changes(spark, table, 0, 1, key="order_id").select(
        F.col("order_id").cast("long").alias("order_id"),
        "_change_type",
        "order_status",
        F.col("amount").cast("double").alias("amount"),
    )


def oracle_lakehouse_cdf() -> str:
    from ecommerce_dbt_medallion_spark.oracle import assemble

    final = """
, o as (
    select order_id, order_status, cast(order_amount as double) as amount
    from silver_orders
),
base as (select * from o where order_id % 3 <> 0),
batch as (
    select order_id, order_status, amount + 1.0 as amount
    from o where order_id % 2 = 0
)
select cast(b.order_id as bigint) as order_id,
       case when e.order_id is null then 'insert'
            else 'update_postimage' end as _change_type,
       b.order_status,
       cast(b.amount as double) as amount
from batch b left join base e on e.order_id = b.order_id
"""
    return assemble("silver_orders", final_select=final)
