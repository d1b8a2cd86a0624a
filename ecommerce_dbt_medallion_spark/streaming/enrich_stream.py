"""Stream-static join: enrich a purchase stream with a slowly-changing
dimension — the canonical streaming-ETL pattern the other streaming keys
don't cover (rollup = stateful agg, dedup = watermark state, sessionize
= custom state, join_stream = stream-stream).

The static side (customer ⋈ nation) is broadcast into every micro-batch
by Spark's stream-static join planning — no stream-side shuffle for the
join; state exists only in the downstream windowed aggregation, bounded
by the watermark. At 100 TB/day stream scale the static dim refreshes
per batch (by re-reading the table), which is exactly the semantics a
dimension enrichment wants.

Executed with Trigger.AvailableNow over the file source so the result
is a batch-checkable DataFrame; the DuckDB oracle is the equivalent
batch join + hourly rollup.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.sources.registry import load_event_stream, load_table


def stream_enrich_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly purchase revenue per customer nation, computed on a stream
    enriched against the static customer/nation dims."""
    stream = load_event_stream(spark, sf_dir)

    dim = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation"))
    )

    enriched = (
        stream.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .join(dim, "user_id", "inner")
        .groupBy(F.window("ts", "1 hour").alias("w"), "nation")
        .agg(
            F.count("event_id").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "nation",
            "n_purchases",
            F.col("total_dec").cast("double").alias("total_value"),
        )
    )

    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


ORACLE_STREAM_ENRICH_PURCHASES = """
select
    date_trunc('hour', e.ts) as window_start,
    n.n_name as nation,
    count(e.event_id) as n_purchases,
    cast(sum(cast(e.value as decimal(18,2))) as double) as total_value
from events e
join customer c on c.c_custkey = e.user_id
join nation n on n.n_nationkey = c.c_nationkey
where e.event_type = 'purchase'
group by 1, 2
"""
