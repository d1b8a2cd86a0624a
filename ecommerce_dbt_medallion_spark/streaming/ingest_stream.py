"""Streaming lakehouse ingestion: readStream → foreachBatch → MERGE INTO
the transaction-log table (lakehouse.py) — the streaming-upsert pattern
(Delta/Iceberg `foreachBatch` + MERGE) that turns an append-only event
feed into a keyed, transactionally-versioned table.

Each micro-batch runs one MERGE: file-skipping keeps the rewrite
proportional to the batch's key range, not the table size, and every
batch is a new committed version (time-travelable, restart-safe via the
streaming checkpoint — a replayed batch re-merges idempotently because
MERGE is keyed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ecommerce_dbt_medallion_spark import lakehouse


def stream_upsert_lakehouse(
    spark: SparkSession,
    source_dir: str,
    table: str,
    key: str,
    schema,
    max_files_per_trigger: int = 1,
) -> int:
    """Drain ``source_dir`` (parquet files) into lakehouse ``table`` as
    keyed MERGEs, one micro-batch per ``max_files_per_trigger`` files.
    Returns the final table version."""

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _merge_batch(batch_df, batch_id: int) -> None:
        if not batch_df.isEmpty():
            lakehouse.merge_into(spark, table, batch_df, key)

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", os.path.join(table, "_streaming_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vs = lakehouse.versions(table)
    return vs[-1] if vs else -1


def stream_append_partitioned(
    spark: SparkSession,
    source_dir: str,
    table: str,
    key: str,
    schema,
    partition_by: str,
    max_files_per_trigger: int = 1,
) -> int:
    """Append-only streaming ingestion into a PARTITION-CLUSTERED
    lakehouse table: each micro-batch is one add-only commit whose files
    are range-clustered on ``partition_by`` with per-file stats in the
    log — the event-log shape (no keyed MERGE needed; dedup belongs to
    the source), where the payoff is that every downstream
    ``read_pruned`` on the partition column skips whole files across
    ALL ingested batches. Returns the final version."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _append_batch(batch_df, batch_id: int) -> None:
        if not batch_df.isEmpty():
            lakehouse.append(
                spark, table, batch_df, key=key, partition_by=partition_by
            )

    q = (
        stream.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", os.path.join(table, "_streaming_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vs = lakehouse.versions(table)
    return vs[-1] if vs else -1
