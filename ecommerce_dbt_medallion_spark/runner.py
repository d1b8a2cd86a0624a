"""Materialization runner — the engine's equivalent of ``dbt run`` /
``dbt snapshot`` (reference: dbt_project.yml materialization config:
bronze=view, silver=table, gold=table).

- **view** (bronze): nothing is written — bronze stays a lazy projection
  fused into downstream scans, exactly like a SQL view.
- **table** (silver/gold): written to ``<warehouse>/<layer>/<model>`` as
  parquet. Gold is built FROM the materialized silver parquet (layered
  reads, not recomputation) — at 100 TB each layer is computed once per
  batch, and silver tables are written partitioned/bucketed by their join
  keys so downstream marts shuffle less.
- **incremental** (dbt's incremental materialization): merge-by-unique-key.
  Default path: real MERGE INTO on a transaction-log table
  (``incremental_merge_delta`` → lakehouse.py) with stats-pruned file
  skipping and time travel; ``incremental_merge`` keeps the plain-parquet
  anti-join + full-rewrite fallback.
- **snapshot** (dbt's SCD2 check-strategy snapshot): tracks row-version
  history with dbt-style ``valid_from``/``valid_to``/``scd_id``.

The runner also executes the DQ engine per layer (the ``dbt test`` step)
and returns a manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import BATCH_TS
from ecommerce_dbt_medallion_spark.models import bronze as mb
from ecommerce_dbt_medallion_spark.models import gold as mg
from ecommerce_dbt_medallion_spark.models import silver as ms


def _write(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def run(spark: SparkSession, sf_dir: str, warehouse: str) -> dict[str, str]:
    """Full ``dbt run``: bronze views → silver tables → gold tables.

    Returns model → materialized path ('' for views).
    """
    manifest: dict[str, str] = {}

    # bronze: views (lazy) — recorded for lineage, nothing written
    b_customers = mb.bronze_customers(spark, sf_dir)
    b_orders = mb.bronze_orders(spark, sf_dir)
    b_payments = mb.bronze_payments(spark, sf_dir)
    for name in ("bronze_customers", "bronze_orders", "bronze_payments"):
        manifest[name] = ""

    # silver: tables, computed from bronze, then re-read from parquet so
    # gold consumes the materialized layer (single computation per layer)
    silver_dir = os.path.join(warehouse, "silver")
    sc = ms.silver_customers_df(b_customers)
    _write(sc, os.path.join(silver_dir, "silver_customers"))
    sc_m = spark.read.parquet(os.path.join(silver_dir, "silver_customers"))

    # Partition the orders fact by month: date-ranged gold rebuilds and
    # incremental loads then scan only the touched partitions (pruning).
    so = ms.silver_orders_df(b_orders, sc_m)
    _write(so, os.path.join(silver_dir, "silver_orders"), ["order_year_month"])
    so_m = spark.read.parquet(os.path.join(silver_dir, "silver_orders"))

    sp = ms.silver_payments_df(b_payments, so_m)
    _write(sp, os.path.join(silver_dir, "silver_payments"))
    sp_m = spark.read.parquet(os.path.join(silver_dir, "silver_payments"))

    for name in ("silver_customers", "silver_orders", "silver_payments"):
        manifest[name] = os.path.join(silver_dir, name)

    # gold: tables from materialized silver
    gold_dir = os.path.join(warehouse, "gold")
    _write(
        mg.gold_customer_summary_df(sc_m, so_m, sp_m),
        os.path.join(gold_dir, "gold_customer_summary"),
    )
    _write(mg.gold_order_metrics_df(so_m), os.path.join(gold_dir, "gold_order_metrics"))
    _write(
        mg.gold_revenue_analysis_df(so_m, sp_m),
        os.path.join(gold_dir, "gold_revenue_analysis"),
    )
    for name in ("gold_customer_summary", "gold_order_metrics", "gold_revenue_analysis"):
        manifest[name] = os.path.join(gold_dir, name)
    return manifest


def incremental_merge_delta(
    spark: SparkSession,
    new_rows: DataFrame,
    table_path: str,
    unique_key: str,
) -> DataFrame:
    """dbt incremental materialization (merge strategy) as a REAL MERGE
    INTO on a transaction-log table (lakehouse.py): only the data files
    containing matched keys are rewritten (stats-pruned + semi-join
    discovery); untouched files carry over by reference, and every batch
    is a new time-travelable version. This is the default incremental
    path — the plain-parquet ``incremental_merge`` below remains as the
    fallback for consumers that need a bare parquet directory.

    (delta-spark / Iceberg jars are not installable in this environment;
    lakehouse.py implements the Delta commit-protocol core directly —
    see its module docstring.)
    """
    from ecommerce_dbt_medallion_spark import lakehouse

    lakehouse.merge_into(spark, table_path, new_rows, unique_key)
    return lakehouse.read(spark, table_path)


def incremental_merge(
    spark: SparkSession,
    new_rows: DataFrame,
    table_path: str,
    unique_key: str,
) -> DataFrame:
    """Plain-parquet fallback for the incremental materialization:
    anti-join + union + full rewrite. Correct but rewrites the whole
    table per batch — use ``incremental_merge_delta`` (file-skipping
    MERGE INTO, time travel) unless a bare parquet dir is required.
    """
    # first-run detection by PATH EXISTENCE, never by swallowing read
    # errors: a transient/corrupt-file read failure must surface, not
    # silently overwrite the table with only the new batch (round-7
    # review — the bare except here was a data-loss path)
    import os

    if not os.path.exists(table_path):
        new_rows.write.mode("overwrite").parquet(table_path)
        return spark.read.parquet(table_path)
    existing = spark.read.parquet(table_path)

    kept = existing.join(
        new_rows.select(unique_key).distinct(), unique_key, "left_anti"
    )
    merged = kept.unionByName(new_rows)
    # Plain-parquet limitation: stage the rewrite, then swap via overwrite.
    staged = merged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").parquet(table_path)
    return spark.read.parquet(table_path)


def snapshot(
    spark: SparkSession,
    current: DataFrame,
    snapshot_path: str,
    unique_key: str,
    check_cols: list[str],
    batch_ts: str = BATCH_TS,
) -> DataFrame:
    """dbt SCD2 snapshot (check strategy).

    First run: every row becomes a version with valid_from=batch_ts,
    valid_to=null. Later runs: rows whose check_cols changed get their
    open version closed (valid_to=batch_ts) and a new open version
    inserted; new keys are inserted; unchanged rows untouched.
    """
    ts = F.lit(batch_ts).cast("timestamp")
    # to_json(struct(...)) — not concat_ws — for the check hash:
    # concat_ws SKIPS nulls, so ('v', NULL) and (NULL, 'v') collided
    # and a real change was classified unchanged; JSON encoding keeps
    # nulls and quotes separators (round-7 review; dbt coalesces NULLs
    # to a sentinel for the same reason)
    hashed = current.withColumn(
        "scd_hash",
        F.md5(F.to_json(F.struct(*[F.col(c) for c in check_cols]))),
    ).withColumn(
        "scd_id", F.md5(F.concat_ws("||", F.col(unique_key).cast("string"), F.lit(batch_ts)))
    )
    # dbt aborts on duplicate snapshot keys; a duplicate here would fan
    # out the open-row join and write a self-inconsistent history
    dup = (
        hashed.groupBy(unique_key)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"snapshot batch has duplicate {unique_key!r} (e.g. "
            f"{dup[0][unique_key]!r}); SCD2 requires one row per key"
        )

    import os

    # path existence, not exception-swallowing: a transient read error
    # must not trigger the first-run overwrite that erases the history
    exists = os.path.exists(snapshot_path)
    history = spark.read.parquet(snapshot_path) if exists else None

    if not exists:
        out = hashed.withColumn("valid_from", ts).withColumn(
            "valid_to", F.lit(None).cast("timestamp")
        )
        out.write.mode("overwrite").parquet(snapshot_path)
        return spark.read.parquet(snapshot_path)

    open_rows = history.where(F.col("valid_to").isNull())
    closed_rows = history.where(F.col("valid_to").isNotNull())

    cmp = open_rows.alias("o").join(
        hashed.select(
            F.col(unique_key).alias("__k"), F.col("scd_hash").alias("__h")
        ).alias("n"),
        F.col(f"o.{unique_key}") == F.col("__k"),
        "left",
    )
    unchanged = cmp.where(F.col("__h").isNotNull() & (F.col("o.scd_hash") == F.col("__h"))).select("o.*")
    to_close = cmp.where(F.col("__h").isNull() | (F.col("o.scd_hash") != F.col("__h"))).select("o.*")
    closed_now = to_close.withColumn("valid_to", ts)

    changed_or_new = hashed.join(
        unchanged.select(F.col(unique_key).alias("__uk")),
        F.col(unique_key) == F.col("__uk"),
        "left_anti",
    ).withColumn("valid_from", ts).withColumn("valid_to", F.lit(None).cast("timestamp"))

    out = closed_rows.unionByName(closed_now).unionByName(unchanged).unionByName(changed_or_new)
    staged = out.localCheckpoint(eager=True)
    staged.write.mode("overwrite").parquet(snapshot_path)
    return spark.read.parquet(snapshot_path)


def materialize_events_partitioned(spark: SparkSession, sf_dir: str, dest_dir: str) -> str:
    """Date-partitioned materialization of the events stream — pruning
    parity with the orders fact (runner.run partitions silver_orders by
    order_year_month; events is the second-biggest fact and had no
    pruned read path, round-8 review). Writes
    ``dest_dir/events_partitioned`` hive-partitioned by ``event_date``;
    ``sources.registry.load_events_table`` prefers that layout when the
    caller's dir carries it, so every date-bounded event mart gets
    partition pruning with no mart change. Day grain: a 100 TB event
    stream at ~30 days/month lands ~3% of the table per partition — the
    incremental rebuild unit — while the partition count stays in the
    thousands over years (no small-file explosion)."""
    from ecommerce_dbt_medallion_spark.sources.registry import (
        EVENTS_PARTITIONED_DIRNAME,
        EVENTS_SOURCE_FINGERPRINT,
        _read_events_static,
        event_utc_date,
        events_flat_fingerprint,
        normalize_event_ts,
    )

    # Prefer the flat source, never through load_events_table — that
    # loader prefers dest_dir/events_partitioned, so a refresh into the
    # same dir would overwrite the path it is reading (round-9 review:
    # AnalysisException on the second run in the natural sf_dir ==
    # dest_dir deployment). A source dir that carries ONLY the
    # partitioned layout is still a valid input when it is not also
    # the output path.
    out = os.path.join(dest_dir, EVENTS_PARTITIONED_DIRNAME)
    flat = os.path.join(sf_dir, "events.parquet")
    parted = os.path.join(sf_dir, EVENTS_PARTITIONED_DIRNAME)
    # Fingerprint the flat source BEFORE reading it (round-10 review):
    # stat-ing it after the (long) write would record a refresh that
    # landed mid-materialization as fresh while the layout holds the
    # OLD rows — fingerprint-first turns that race into a mismatch and
    # the loader's safe flat fallback.
    flat_fp = events_flat_fingerprint(flat) if os.path.exists(flat) else None
    if os.path.exists(flat):
        ev = normalize_event_ts(_read_events_static(spark, flat))
    elif os.path.isdir(parted):
        if os.path.abspath(parted) == os.path.abspath(out):
            raise ValueError(
                "cannot rebuild events_partitioned from itself: the only "
                f"events source in {sf_dir} is the partitioned layout this "
                "call would overwrite — point dest_dir elsewhere or restore "
                "the flat events.parquet"
            )
        ev = normalize_event_ts(spark.read.parquet(parted)).drop("event_date")
    else:
        raise FileNotFoundError(f"no events source in {sf_dir}")
    (
        # event_utc_date, not to_date(ts): the partition column must be
        # session-TZ-independent or a bound computed in a different
        # reader session would prune partitions that contain in-bound
        # rows (round-9 review)
        ev.withColumn("event_date", event_utc_date())
        .repartition("event_date")  # one writer task per day: no
        # per-task fan-out into every partition dir (tiny-file storm)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    # Freshness marker (round-9 review): record the flat source's
    # pre-read fingerprint so load_events_table can detect a flat
    # refresh that post-dates this layout and fall back instead of
    # serving stale rows. Leading "_" keeps it out of Spark's file
    # index. Written ATOMICALLY (tmp + rename — a crash-truncated
    # marker must not exist) and AFTER the parquet write so a failed
    # materialization never leaves a fresh-looking marker over a
    # half-written layout.
    marker_path = os.path.join(out, EVENTS_SOURCE_FINGERPRINT)
    tmp = marker_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"flat_fingerprint": flat_fp}, fh)
    os.replace(tmp, marker_path)
    return out


def materialize_bucketed_facts(
    spark: SparkSession, sf_dir: str, n_buckets: int = 32
) -> tuple[str, str]:
    """Bucketed materialization of the two join-heavy facts.

    Writing silver_orders and silver_payments bucketed (and sorted) by
    their join key means every downstream orders⋈payments join is
    shuffle-free — both sides are already co-partitioned on disk. This is
    the 100 TB answer to the pipeline's dominant shuffle; at cluster
    scale the bucket count follows data volume (e.g. 4096); here 32
    matches local[32] so the bucketed scan keeps every core busy.

    Each table is repartitioned on the bucket key before the write so
    every bucket is exactly ONE file — that is the condition under which
    Spark trusts the sortBy metadata and the downstream SortMergeJoin
    skips both the Exchange AND the per-partition Sort.

    Returns the two table names (Spark-SQL managed tables).
    """
    import shutil
    from urllib.parse import urlparse

    so = ms.silver_orders(spark, sf_dir)
    sp = ms.silver_payments(spark, sf_dir)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    for name, df in (("silver_orders_b", so), ("silver_payments_b", sp)):
        spark.sql(f"drop table if exists {name}")
        # the in-memory catalog forgets tables across sessions but their
        # files persist — clear the managed location too
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        (
            df.repartition(n_buckets, F.col("order_id"))
            .write.mode("overwrite")
            .bucketBy(n_buckets, "order_id")
            .sortBy("order_id")
            .saveAsTable(name)
        )
    return "silver_orders_b", "silver_payments_b"


def incremental_mart_refresh(
    spark: SparkSession,
    fact_table: str,
    mart_table: str,
    group_key: str,
    agg_fn,
    from_version: int,
    max_deleted_groups: int = 100_000,
) -> int:
    """Incremental view maintenance: bring an AGGREGATE mart up to date
    with its fact table by recomputing ONLY the groups whose fact rows
    changed since ``from_version`` (the mart's last-refreshed fact
    version), then MERGE-ing them in. The Delta-Live-Tables refresh
    shape: at 100 TB a nightly batch touches a sliver of groups, and
    this makes the mart cost scale with the CHURN, not the table —
    CDF discovers dirty keys from only the files that changed, the
    semi-join prunes the recompute, and the MERGE rewrites only the
    mart files holding those groups.

    ``agg_fn(facts) -> DataFrame`` must produce one row per
    ``group_key`` (the same function that full-builds the mart —
    correctness by construction: refresh(subset) ≡ full(subset)).
    Groups whose LAST fact row was deleted disappear from the mart via
    ``delete_where`` (their keys are collected — churn-scale by
    definition, guarded by ``max_deleted_groups``).

    Returns the fact-table version this refresh caught up to (pass it
    back as ``from_version`` next time).
    """
    from ecommerce_dbt_medallion_spark import lakehouse

    # CDF diffs live FILE sets, and a DELETE DEFERRED commit is
    # metadata-only — tombstoned keys' groups would look clean and the
    # refresh would silently leave them stale. Same guard append/merge
    # already apply: materialize first, then refresh.
    if lakehouse.pending_tombstones(fact_table):
        raise ValueError(
            "fact table has pending deferred deletes; run "
            "materialize_tombstones before incremental_mart_refresh"
        )
    to_version = lakehouse.versions(fact_table)[-1]
    if to_version == from_version:
        return to_version
    # include_preimage: an update that REASSIGNS a row's group must
    # dirty the group it left, not only the one it joined — post-image
    # alone left the old group's mart row permanently stale (round-7
    # review)
    changes = lakehouse.table_changes(
        spark, fact_table, from_version, to_version, include_preimage=True
    )
    dirty = changes.select(group_key).distinct().localCheckpoint(eager=True)
    facts = lakehouse.read(spark, fact_table, to_version)
    # checkpoint: merge_into evaluates its source several times (key
    # range, bloom probe, discovery join, rewrite) and the gone
    # anti-join + emptiness check each re-evaluate it too
    refreshed = agg_fn(facts.join(dirty, group_key, "semi")).localCheckpoint(
        eager=True
    )
    # groups with no surviving fact rows: present in dirty, absent from
    # the recompute → remove from the mart
    gone = [
        r[group_key]
        for r in dirty.join(refreshed, group_key, "left_anti")
        .limit(max_deleted_groups + 1)
        .collect()
    ]
    if len(gone) > max_deleted_groups:
        raise ValueError(
            f"refresh would delete >{max_deleted_groups} groups; "
            "rebuild the mart instead"
        )
    if refreshed.limit(1).count() > 0:
        lakehouse.merge_into(spark, mart_table, refreshed, group_key)
    if gone:
        non_null = [v for v in gone if v is not None]
        preds = []
        if non_null:
            vals = ", ".join(lakehouse._sql_literal(v) for v in non_null)
            preds.append(f"{group_key} in ({vals})")
        if len(non_null) < len(gone):
            preds.append(f"{group_key} is null")
        lakehouse.delete_where(spark, mart_table, " or ".join(preds))
    return to_version
