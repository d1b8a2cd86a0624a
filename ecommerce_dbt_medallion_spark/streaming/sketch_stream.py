"""Streaming quantile-sketch maintenance (SURVEY §2 #37d).

The mergeable sketch's whole point is that its state algebra survives
ANY partitioning of the input — shards, partitions, or MICRO-BATCHES.
This module closes the loop on the streaming claim: each micro-batch's
sketch state (ops/sketch.quantile_sketch_state — integer cells, exact
cross-engine) APPENDs into a versioned lakehouse state table tagged
with its batch id, and quantile extraction merges across batch tags
with the same groupBy-sum that ``merge_sketch_states`` applies to
shards. Because the algebra is associative and commutative, the
streamed result is BIT-IDENTICAL to the batch computation over the
union of the batches — which is exactly what the gate oracle asserts
(the gated key shares ``oracle_quantile_sketch_mergeable``).

Scale shape: per batch, the exchange is bounded by the state's cell
count (≤ ~1300 cells × groups after map-side combine), never the batch
row count; the state table grows by ≤ cells × batches rows (compact
with OPTIMIZE or a periodic re-base if batch counts grow unbounded —
the cells themselves never do).

REPLAY IDEMPOTENCY: a batch replayed after checkpoint loss would
double its counts under blind addition. Batch states are batch-tagged
and the append anti-joins already-stored batch ids, so a replay
appends nothing and the state is unchanged (test-pinned).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark import lakehouse
from ecommerce_dbt_medallion_spark.ops.sketch import (
    _qsk_quantiles_from_state,
    quantile_sketch_state,
)
from ecommerce_dbt_medallion_spark.streaming.ingest_stream import _ckpt_dir


def stream_quantile_sketch_ingest(
    spark: SparkSession,
    source_dir: str,
    state_table: str,
    schema,
    max_files_per_trigger: int = 1,
) -> int:
    """Drain ``source_dir`` (rows of (grp string, cents bigint)) into a
    batch-tagged sketch-state lakehouse table; returns the final state
    version. Each row feeds its own group AND the ALL group via a
    constant 2-element explode (the same one-scan shape as the batch
    key)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bstate = quantile_sketch_state(
            batch_df.select(
                F.explode(F.array(F.col("grp"), F.lit("ALL"))).alias("grp"),
                "cents",
            ),
            "cents",
            ["grp"],
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        bstate = bstate.localCheckpoint(eager=True)
        if not lakehouse.versions(state_table):
            lakehouse.create_or_replace(spark, state_table, bstate)
            return
        # replay safety: a batch id already merged never re-appends
        seen = lakehouse.read(spark, state_table).select("batch_id").distinct()
        fresh = bstate.join(seen, "batch_id", "left_anti").localCheckpoint(
            eager=True
        )
        if not fresh.isEmpty():
            lakehouse.append(spark, state_table, fresh)

    q = (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", _ckpt_dir(state_table))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vs = lakehouse.versions(state_table)
    return vs[-1] if vs else -1


def stream_state_quantiles(spark: SparkSession, state_table: str) -> DataFrame:
    """Quantiles from the STORED streaming state: merge across batch
    tags (the shard-merge algebra) then extract — state-only compute,
    never the fact."""
    merged = (
        lakehouse.read(spark, state_table)
        .groupBy("grp", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _qsk_quantiles_from_state(merged, "grp").orderBy("grp", "q")


def stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated key (#37d): the STREAMING sibling of
    ``quantile_sketch_mergeable`` — orders split into 3 deterministic
    micro-batches (o_orderkey % 3, mtime-ordered files), per-batch
    states maintained in a lakehouse table, quantiles extracted from
    the stored state. Associativity of the state algebra makes the
    result equal the batch computation over all orders, so the key
    shares the batch oracle verbatim — the strongest possible
    state-maintenance gate."""
    import re as _re
    import shutil as _sh
    import time as _time

    from ecommerce_dbt_medallion_spark.models.cdf import _GATE_ROOT
    from ecommerce_dbt_medallion_spark.sources.registry import load_table

    tag = _re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(os.path.normpath(sf_dir)))
    src = os.path.normpath(os.path.join(_GATE_ROOT, f"qsketchstream_src_{tag}"))
    state_table = os.path.normpath(
        os.path.join(_GATE_ROOT, f"qsketchstream_state_{tag}")
    )
    for p in (src, state_table, _ckpt_dir(state_table)):
        _sh.rmtree(p, ignore_errors=True)
    os.makedirs(src, exist_ok=True)

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    base = _time.time()
    for k in range(3):
        staging = os.path.join(src, f"_stage{k}")
        orders.where(F.col("o_orderkey") % 3 == k).select(
            "grp", "cents"
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = [
            f
            for f in os.listdir(staging)
            if f.endswith(".parquet") and not f.startswith(".")
        ]
        dst = os.path.join(src, f"b{k}.parquet")
        os.replace(os.path.join(staging, part), dst)
        _sh.rmtree(staging, ignore_errors=True)
        # FileStreamSource orders by mtime then name: pin both
        os.utime(dst, (base + k * 10, base + k * 10))

    stream_quantile_sketch_ingest(
        spark, src, state_table, schema="grp string, cents bigint"
    )
    return stream_state_quantiles(spark, state_table)


# ------------------------------------------ streaming HLL maintenance


def stream_hll_ingest(
    spark: SparkSession,
    source_dir: str,
    state_table: str,
    schema,
    max_files_per_trigger: int = 1,
) -> int:
    """Drain ``source_dir`` (rows of (event_type string, user_id
    bigint)) into a batch-tagged HLL register-state lakehouse table;
    returns the final state version.

    Per batch the exchange is bounded by the REGISTER count (types ×
    4368 rows after map-side partial max), never the batch row count —
    the same bounded-state shape as the quantile sibling above. Replay
    idempotency mirrors it too: batch-tagged rows + an anti-join on
    already-stored batch ids (a max-merge is idempotent under exact
    replay anyway — max(a, a) = a — but the tag keeps the state table's
    growth deterministic and the guard uniform across sketch kinds).
    """
    from ecommerce_dbt_medallion_spark.models.events import hll_register_state

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bstate = hll_register_state(
            batch_df.where(F.col("user_id").isNotNull()).select(
                "event_type", "user_id"
            )
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        bstate = bstate.localCheckpoint(eager=True)
        if not lakehouse.versions(state_table):
            lakehouse.create_or_replace(spark, state_table, bstate)
            return
        seen = lakehouse.read(spark, state_table).select("batch_id").distinct()
        fresh = bstate.join(seen, "batch_id", "left_anti").localCheckpoint(
            eager=True
        )
        if not fresh.isEmpty():
            lakehouse.append(spark, state_table, fresh)

    q = (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", _ckpt_dir(state_table))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vs = lakehouse.versions(state_table)
    return vs[-1] if vs else -1


def stream_state_hll_estimates(spark: SparkSession, state_table: str) -> DataFrame:
    """Distinct-user estimates from the STORED streaming register
    state: max-merge across batch tags, then the shared estimator —
    state-only compute, never the fact."""
    from ecommerce_dbt_medallion_spark.models.events import hll_estimates_from_regs

    merged = (
        lakehouse.read(spark, state_table)
        .groupBy("event_type", "p", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    return hll_estimates_from_regs(merged)


def stream_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated key (#37e): the STREAMING sibling of
    ``sketch_distinct_users`` — events split into 3 deterministic
    micro-batches (event_id % 3, mtime-ordered files), per-batch HLL
    register states maintained in a lakehouse table, estimates
    extracted from the stored state. max() is associative, commutative
    AND idempotent, so the streamed registers equal the batch registers
    over the union — even across batches that share users — and the key
    shares the batch estimator column-for-column (the oracle is the
    batch oracle minus its exact-count column, which would need
    corpus-scale state to maintain online)."""
    import re as _re
    import shutil as _sh
    import time as _time

    from ecommerce_dbt_medallion_spark.models.cdf import _GATE_ROOT
    from ecommerce_dbt_medallion_spark.models.events import load_events

    tag = _re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(os.path.normpath(sf_dir)))
    src = os.path.normpath(os.path.join(_GATE_ROOT, f"hllstream_src_{tag}"))
    state_table = os.path.normpath(
        os.path.join(_GATE_ROOT, f"hllstream_state_{tag}")
    )
    for p in (src, state_table, _ckpt_dir(state_table)):
        _sh.rmtree(p, ignore_errors=True)
    os.makedirs(src, exist_ok=True)

    ev = load_events(spark, sf_dir).select("event_id", "event_type", "user_id")
    base = _time.time()
    for k in range(3):
        staging = os.path.join(src, f"_stage{k}")
        ev.where(F.col("event_id") % 3 == k).select(
            "event_type", "user_id"
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = [
            f
            for f in os.listdir(staging)
            if f.endswith(".parquet") and not f.startswith(".")
        ]
        dst = os.path.join(src, f"b{k}.parquet")
        os.replace(os.path.join(staging, part), dst)
        _sh.rmtree(staging, ignore_errors=True)
        os.utime(dst, (base + k * 10, base + k * 10))

    stream_hll_ingest(
        spark, src, state_table, schema="event_type string, user_id bigint"
    )
    return stream_state_hll_estimates(spark, state_table)
