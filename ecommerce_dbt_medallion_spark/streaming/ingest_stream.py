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


def stream_upsert_with_ivm(
    spark: SparkSession,
    source_dir: str,
    fact_table: str,
    mart_table: str,
    key: str,
    group_key: str,
    agg_fn,
    schema,
    max_files_per_trigger: int = 1,
) -> tuple[int, int]:
    """Streaming MERGE + CONTINUOUS mart maintenance: every micro-batch
    (1) MERGEs into the keyed fact table and (2) brings the aggregate
    mart up to date via ``runner.incremental_mart_refresh`` — only the
    batch's dirty groups recompute, discovered from the CDF of exactly
    the versions that batch committed. The streaming materialized-view
    shape: the mart lags the facts by at most one micro-batch, and per-
    batch cost scales with batch churn, never table size.

    Returns (final fact version, final mart version).
    """
    from ecommerce_dbt_medallion_spark.runner import incremental_mart_refresh

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    state = {"last_v": None}

    def _batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lakehouse.merge_into(spark, fact_table, batch_df, key)
        if state["last_v"] is None:
            # first batch: full mart build, synced to the fact version
            lakehouse.create_or_replace(
                spark,
                mart_table,
                agg_fn(lakehouse.read(spark, fact_table)),
                key=group_key,
            )
            state["last_v"] = lakehouse.versions(fact_table)[-1]
        else:
            state["last_v"] = incremental_mart_refresh(
                spark,
                fact_table,
                mart_table,
                group_key,
                agg_fn,
                from_version=state["last_v"],
            )

    q = (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", os.path.join(fact_table, "_streaming_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        lakehouse.versions(fact_table)[-1],
        lakehouse.versions(mart_table)[-1],
    )


def stream_ingest_dedup(
    spark: SparkSession,
    source_dir: str,
    sig_table: str,
    verdict_table: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
) -> tuple[int, int]:
    """Streaming corpus curation end-to-end: each micro-batch of raw
    documents is deduped against the STORED corpus signatures, its
    verdicts are MERGEd into a lakehouse verdict table, and only novel
    documents' signatures join the corpus — the production LLM-data
    ingestion shape (round-7 glue between ``ops.dedup.dedup_incremental``
    and the foreachBatch upsert pattern above).

    Per micro-batch:
      1. ``doc_signatures`` computes fingerprint + 64-perm md5 MinHash
         for the BATCH only (the corpus is never re-shingled).
      2. ``signature_verdicts`` joins against the signature table on
         fingerprint + 16x4 LSH band keys → exact_dup / near_dup /
         novel per doc; shuffle ∝ batch x band occupancy, never
         corpus x batch.
      3. Verdicts (+ batch_id) MERGE into ``verdict_table`` (keyed on
         ``id_col`` — a replayed batch after a checkpoint restart
         re-merges idempotently).
      4. Novel docs' signatures (one representative per fingerprint —
         within-batch exact dupes collapse to the min id) APPEND to
         ``sig_table``: an add-only commit, no rewrite, so corpus
         maintenance cost is O(novel) per batch and both state tables
         stay transactionally versioned and time-travelable.

    Returns (final sig_table version, final verdict_table version).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ecommerce_dbt_medallion_spark.ops.dedup import (
        doc_signatures,
        signature_verdicts,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bsig = doc_signatures(batch_df, id_col, text_col).localCheckpoint(
            eager=True
        )
        have_corpus = bool(lakehouse.versions(sig_table))
        corpus = lakehouse.read(spark, sig_table) if have_corpus else None
        verd = (
            signature_verdicts(bsig, corpus, id_col)
            .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            .localCheckpoint(eager=True)
        )
        if lakehouse.versions(verdict_table):
            lakehouse.merge_into(spark, verdict_table, verd, id_col)
        else:
            lakehouse.create_or_replace(spark, verdict_table, verd, key=id_col)
        novel = bsig.join(
            verd.where(F.col("verdict") == "novel").select(id_col),
            id_col,
            "semi",
        )
        w = Window.partitionBy("fingerprint").orderBy(id_col)
        novel = (
            novel.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        if not novel.isEmpty():
            if have_corpus:
                lakehouse.append(spark, sig_table, novel, key=id_col)
            else:
                lakehouse.create_or_replace(spark, sig_table, novel, key=id_col)

    q = (
        stream.writeStream.foreachBatch(_batch)
        .option(
            "checkpointLocation", os.path.join(verdict_table, "_streaming_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        lakehouse.versions(sig_table)[-1] if lakehouse.versions(sig_table) else -1,
        lakehouse.versions(verdict_table)[-1]
        if lakehouse.versions(verdict_table)
        else -1,
    )
