"""Structured Streaming over the events feed (SURVEY.md §2 #14).

``stream_event_rollup`` is a real streaming pipeline — file source →
event-time watermark → 1-hour tumbling windows → stateful aggregation —
executed here with Trigger.AvailableNow so it drains the (static) input
and returns the final result as a batch DataFrame, which makes it
oracle-checkable: the rollup must equal the equivalent batch GROUP BY.

In production the same query runs continuously: the watermark bounds
state (late events beyond 2h dropped), and the window aggregation is the
standard partial-agg shuffle keyed on (window, event_type).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.sources.registry import load_event_stream


def stream_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = load_event_stream(spark, sf_dir)

    rollup = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            # exact count(distinct) is unsupported on streams — that
            # rollup belongs in event_daily_stats (batch); streaming gets
            # counts + exact decimal sums.
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("total_dec").cast("double").alias("total_value"),
        )
    )

    sink = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        rollup.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def oracle_stream_event_rollup() -> str:
    """The streaming rollup must equal this batch aggregation."""
    return """
select
    date_trunc('hour', ts) as window_start,
    event_type,
    count(event_id) as n_events,
    cast(sum(cast(value as decimal(18,2))) as double) as total_value
from events
group by date_trunc('hour', ts), event_type
"""


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once-style dedup: dropDuplicatesWithinWatermark
    on event_id — the standard at-least-once-ingest cleanup. State holds
    only ids seen within the 2h watermark horizon (bounded, unlike a
    batch distinct). Drained with availableNow; the per-type counts must
    match the batch distinct (oracle below).
    """
    stream = load_event_stream(spark, sf_dir)

    deduped = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"),
        )
        .select(
            "event_type",
            "n_events",
            F.col("total_dec").cast("double").alias("total_value"),
        )
    )
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


# Tie-break note: dropDuplicatesWithinWatermark keeps the FIRST-ARRIVAL
# row per event_id (file/partition order) while this oracle keeps the
# min-ts row. Value parity therefore relies on duplicate event_ids being
# exact-copy rows. The driver testdata satisfies this vacuously —
# event_id is unique at every SF — and tests/test_streaming.py::
# test_duplicate_event_ids_are_exact_copies asserts the assumption so a
# future data change surfaces here instead of as a silent hash mismatch.
ORACLE_STREAM_DEDUP_EVENTS = """
select
    event_type,
    count(event_id) as n_events,
    cast(sum(cast(value as decimal(18,2))) as double) as total_value
from (
    select distinct on (event_id) event_id, event_type, value
    from events order by event_id, ts
)
group by event_type
"""


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation UNDER STRUCTURED STREAMING —
    the streaming twin of the batch ``session_window_stats`` key (same
    expression, readStream source, 2 h watermark, AvailableNow drain).

    Complete output mode emits the final result table after the drain,
    so every session (open or closed) is present and the BATCH
    session_window oracle applies verbatim — unlike the append-mode
    applyInPandasWithState key, no closed-session modeling is needed.
    In production the same query runs continuously; the watermark
    bounds session state.
    """
    from ecommerce_dbt_medallion_spark.config import SESSION_GAP_SECONDS

    stream = load_event_stream(spark, sf_dir)

    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds"),
        )
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("val_dec"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("val_dec").cast("double").alias("total_value"),
        )
    )

    sink = f"stream_sesswin_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def stream_hopping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#14h: HOPPING (sliding) windows — 1-hour windows every 15 min,
    the overlapping-window mode tumbling (#14) never exercises. Each
    event lands in exactly window/slide = 4 windows; Spark expands the
    membership map-side (the `window` generator), so the shuffle keyed
    on (window, event_type) carries 4× rows but stays a plain partial
    agg — no state beyond the watermark horizon, same as tumbling.

    Oracle: explicit 4-way window expansion via generate_series and
    integer-µs window arithmetic (epoch-aligned starts, exactly like
    Spark's window()); exact decimal sums to the double boundary.
    """
    stream = load_event_stream(spark, sf_dir)

    rollup = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            F.col("total_dec").cast("double").alias("total_value"),
        )
    )

    sink = f"stream_hop_{uuid.uuid4().hex[:8]}"
    q = (
        rollup.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


ORACLE_STREAM_HOPPING_ROLLUP = """
with expanded as (
    select
        make_timestamp((epoch_us(e.ts) // 900000000) * 900000000
                       - k.k * 900000000) as window_start,
        e.event_type, e.event_id, e.value
    from events e
    cross join (select unnest(generate_series(0, 3)) as k) k
)
select
    window_start,
    window_start + interval 1 hour as window_end,
    event_type,
    count(event_id) as n_events,
    cast(sum(cast(value as decimal(18,2))) as double) as total_value
from expanded
group by window_start, event_type
"""


# --------------------------------------------- hot-key salted rollup

# Round 14 (VERDICT r13 #6): the streaming sibling of the batch skew
# key (models/analytics.skew_salted_revenue) — a stateful per-user
# rollup where ONE user carries ~25% of all events, proving the
# two-phase salted state shape under Structured Streaming. Every 4th
# user collapses into bucket 0, mirroring the batch key's hot-bucket
# construction on the same testdata.
HOT_USER_MOD = 4
HOT_SALT_BUCKETS = 16


def _hot_phase1(stream: DataFrame):
    """The SHARED phase-1 grouping for the hot-user rollup and its
    diagnostic twin: watermark + hot-bucket collapse + per-event salt +
    (window, user_bucket, salt) groupBy. One builder so the salt-scatter
    test pins the exact state shape the production rollup runs —
    round-14 review: two verbatim copies could silently drift."""
    bucket = (
        F.when(F.col("user_id") % HOT_USER_MOD == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
    )
    salt = F.pmod(F.xxhash64(F.col("event_id")), F.lit(HOT_SALT_BUCKETS))
    return (
        stream.withWatermark("ts", "2 hours")
        .select(
            F.col("ts"),
            bucket.alias("user_bucket"),
            salt.alias("salt"),
            "event_id",
            "value",
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_bucket", "salt")
    )


def stream_hot_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted streaming rollup under a planted hot user.

    Phase 1 (STREAMING, stateful): group by (1-hour window,
    user_bucket, salt) where salt = xxhash64(event_id) % 16 — the hot
    user's state rows AND its shuffle traffic scatter across 16
    reducer keys instead of funneling one hot partition; the watermark
    bounds state exactly like the plain rollup. Phase 2 (after the
    availableNow drain, BATCH): fold the ≤16 salt partials per
    (window, user_bucket) — a 16×-smaller aggregation. Counts are
    integers and the money column folds as exact decimal partials, so
    salting is invisible in values (the oracle is the UNsalted batch
    rollup).

    At 100 TB this is the standing answer to a hot key feeding a
    stateful streaming agg, where AQE cannot help (state partitioning
    is fixed by the grouping key): pre-scatter the key, fold partials
    downstream. The per-batch salt fan-out (≤16 rows per
    (window, user)) is pinned by
    tests/test_streaming.py::test_stream_hot_user_rollup_salt_scatter.

    Determinism: salt from xxhash64(event_id) — per-event, never
    rand(); decimal sums to the boundary; fold order irrelevant
    (integer/decimal adds commute)."""
    phase1 = _hot_phase1(load_event_stream(spark, sf_dir)).agg(
        F.count("event_id").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"),
    )
    sink = f"hot_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        phase1.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(sink)
    return (
        drained.groupBy(
            F.col("w.start").alias("window_start"), "user_bucket"
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_dec").alias("total_dec"),
        )
        .select(
            "window_start",
            "user_bucket",
            "n_events",
            F.col("total_dec").cast("double").alias("total_value"),
        )
    )


def salted_state_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic twin for tests: the DRAINED phase-1 state grain
    (window, user_bucket, salt) so the salt scatter is assertable —
    the hot bucket must hold >1 salt row per window."""
    phase1 = _hot_phase1(load_event_stream(spark, sf_dir)).agg(
        F.count(F.lit(1)).alias("n")
    )
    sink = f"hot_fanout_{uuid.uuid4().hex[:8]}"
    q = (
        phase1.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.col("w.start").alias("window_start"), "user_bucket", "salt", "n"
    )


def oracle_stream_hot_user_rollup() -> str:
    """The salted two-phase streaming rollup must equal this UNsalted
    batch aggregation — salting must be invisible in values."""
    return f"""
select
    date_trunc('hour', ts) as window_start,
    case when user_id % {HOT_USER_MOD} = 0 then 0 else user_id end
        as user_bucket,
    count(event_id) as n_events,
    cast(sum(cast(value as decimal(18,2))) as double) as total_value
from events
group by 1, 2
"""
