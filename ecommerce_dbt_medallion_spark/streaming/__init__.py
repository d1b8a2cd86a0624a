from ecommerce_dbt_medallion_spark.streaming.events_stream import (
    stream_event_rollup,
    oracle_stream_event_rollup,
)

__all__ = ["stream_event_rollup", "oracle_stream_event_rollup"]
