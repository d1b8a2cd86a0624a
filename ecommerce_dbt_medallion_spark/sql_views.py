"""SQL surface — register every model as a temp view so the whole
engine is queryable via ``spark.sql`` (how a dbt user consumes the
warehouse), plus the model lineage graph (dbt's manifest DAG).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ecommerce_dbt_medallion_spark.config import TESTDATA_TABLES
from ecommerce_dbt_medallion_spark.quality.checks import MODEL_REGISTRY
from ecommerce_dbt_medallion_spark.sources.registry import load_table

# Public model DAG (dbt `ref()` graph; raw_* are `source()`s).
LINEAGE: dict[str, list[str]] = {
    "raw_customers": ["customer"],
    "raw_orders": ["orders"],
    "raw_payments": ["lineitem"],
    "bronze_customers": ["raw_customers"],
    "bronze_orders": ["raw_orders"],
    "bronze_payments": ["raw_payments"],
    "silver_customers": ["bronze_customers"],
    "silver_orders": ["bronze_orders", "silver_customers"],
    "silver_payments": ["bronze_payments", "silver_orders"],
    "gold_customer_summary": ["silver_customers", "silver_orders", "silver_payments"],
    "gold_order_metrics": ["silver_orders"],
    "gold_revenue_analysis": ["silver_orders", "silver_payments"],
    "gold_rfm_segmentation": ["silver_orders"],
    "revenue_anomaly_zscore": ["silver_orders"],
    "payment_method_pivot": ["silver_payments"],
}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create temp views for base tables and every model; returns names."""
    from ecommerce_dbt_medallion_spark.models.events import load_events

    names: list[str] = []
    for t in TESTDATA_TABLES:
        df = load_events(spark, sf_dir) if t == "events" else load_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        names.append(t)
    for name, builder in MODEL_REGISTRY.items():
        builder(spark, sf_dir).createOrReplaceTempView(name)
        names.append(name)
    from ecommerce_dbt_medallion_spark.models import analytics as _ana
    from ecommerce_dbt_medallion_spark.models import gold as _gold

    for name, builder in {
        "gold_rfm_segmentation": _gold.gold_rfm_segmentation,
        "revenue_anomaly_zscore": _ana.revenue_anomaly_zscore,
        "payment_method_pivot": _ana.payment_method_pivot,
    }.items():
        builder(spark, sf_dir).createOrReplaceTempView(name)
        names.append(name)
    return names


def lineage() -> dict[str, list[str]]:
    """Model → direct upstream dependencies (acyclic; mirrors dbt refs)."""
    return {k: list(v) for k, v in LINEAGE.items()}
