"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same conf block is what we would
ship to a 1000-executor cluster — AQE handles runtime re-planning (partition
coalescing, skew-join splitting), and the session timezone is pinned to UTC
so timestamp semantics are deterministic across engines and machines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ecommerce-medallion-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing + skew-join handling. At 100 TB
        # this is what keeps the payments⋈orders shuffle balanced when a
        # handful of customers/orders are hot.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sized for local test SFs; on a real cluster this scales with
        # cores (rule of thumb 2-3x total cores) — AQE coalesces down.
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2 if cpus.isdigit() else 64))
        # Deterministic timestamp semantics for the DuckDB oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        # Trust sortBy metadata when reading bucketed tables: our
        # bucketed writer (runner.materialize_bucketed_facts) guarantees
        # exactly one file per bucket, the condition under which the
        # sorted-scan ordering is valid — this is what removes the
        # per-partition Sort (not just the Exchange) from bucketed fact
        # joins. Off by default since Spark 3 because multi-file buckets
        # can't trust it; pinned by tests/test_plans.py.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # One historical testdata generation encoded events.ts as parquet
        # TIMESTAMP(NANOS), which Spark only reads behind this legacy
        # flag (as bigint ns — sources/registry.normalize_event_ts maps
        # it back). Session-level so loaders stay pure; harmless for
        # non-nanos files.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Console progress bars interleave with stdout; round 8's bench
        # JSON line was truncated by them in the driver's tail capture.
        .config("spark.ui.showConsoleProgress", "false")
        # Arrow for the mapInPandas/pandas_udf paths (multimodal, ANN rerank).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
