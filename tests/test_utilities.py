"""SQL surface, lineage, freshness, and skew-utility tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark import sql_views
from ecommerce_dbt_medallion_spark.models import silver
from ecommerce_dbt_medallion_spark.ops.skew import salted_join
from ecommerce_dbt_medallion_spark.quality.freshness import source_freshness
from tests.conftest import SF_SMOKE


def test_sql_surface(spark):
    sql_views.register_views(spark, SF_SMOKE)
    row = spark.sql(
        """
        select count(*) as n, sum(lifetime_value) as ltv
        from gold_customer_summary
        where customer_segment = 'High Value'
        """
    ).first()
    assert row["n"] > 0 and row["ltv"] > 0
    joined = spark.sql(
        """
        select s.order_status, count(*) as n
        from silver_orders s join silver_customers c using (customer_key)
        group by 1 order by 1
        """
    ).collect()
    assert {r["order_status"] for r in joined} <= {
        "completed", "pending", "cancelled", "unknown"
    }


def test_lineage_is_acyclic_and_complete(spark):
    dag = sql_views.lineage()
    # every dep that is a model must itself be declared
    for deps in dag.values():
        for d in deps:
            assert d in dag or d in ("customer", "orders", "lineitem")
    # topological order exists (no cycles)
    seen: set[str] = set()

    def visit(n: str, path: tuple[str, ...]) -> None:
        assert n not in path, f"cycle: {path + (n,)}"
        if n in seen or n not in dag:
            return
        seen.add(n)
        for d in dag[n]:
            visit(d, path + (n,))

    for n in dag:
        visit(n, ())


def test_source_freshness_statuses(spark):
    rows = {r["source_name"]: r for r in source_freshness(spark, SF_SMOKE).collect()}
    assert set(rows) == {"raw_customers", "raw_orders", "raw_payments"}
    # raw_orders is stamped with the batch ts itself → always fresh
    assert rows["raw_orders"]["freshness_status"] == "pass"
    # event-time sources are years older than the batch ts → error
    assert rows["raw_payments"]["freshness_status"] == "error"
    for r in rows.values():
        assert r["age_hours"] is not None


def test_salted_join_matches_plain_join(spark):
    orders = silver.silver_orders(spark, SF_SMOKE).select(
        "order_id", "customer_key", "order_amount"
    )
    customers = silver.silver_customers(spark, SF_SMOKE).select(
        "customer_key", "customer_id", "email"
    )
    plain = orders.join(customers, "customer_key", "inner")
    salted = salted_join(orders, customers, "customer_key", "inner")
    assert salted.count() == plain.count()
    assert (
        salted.agg(F.sum("order_amount").cast("string")).first()[0]
        == plain.agg(F.sum("order_amount").cast("string")).first()[0]
    )
    assert sorted(salted.columns) == sorted(plain.columns)

def test_salted_join_balances_hot_key(spark):
    """A 90%-hot key must spread across reducers after salting.

    The shuffle for the salted join partitions on hash(key, __salt); we
    reproduce that partitioning and assert no reducer owns more than a
    small multiple of the fair share — i.e. the per-row salt actually
    scatters the hot key (a per-KEY salt would leave 90% in one bucket).
    """
    from ecommerce_dbt_medallion_spark.ops.skew import salt_probe

    n, parts, salt = 50_000, 32, 16
    probe = spark.range(n).withColumn(
        "k", F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
    )
    shares = (
        salt_probe(probe, salt=salt)
        .groupBy(F.pmod(F.hash("k", "__salt"), F.lit(parts)).alias("p"))
        .count()
        .collect()
    )
    top = max(r["count"] for r in shares) / n
    # Unsalted, the hot bucket would hold ~0.90 of all rows. With a
    # 16-way scatter the hot key contributes ~0.9/16 ≈ 0.056 per bucket.
    assert top < 0.25, f"hot bucket still owns {top:.0%} of rows"


def test_salted_join_deterministic_salt_col(spark):
    """probe_salt_col gives a deterministic salt and identical join rows."""
    probe = spark.range(10_000).withColumn("k", F.lit(0)).withColumn("v", F.col("id"))
    build = spark.range(1).withColumnRenamed("id", "k").withColumn("w", F.lit(2))
    out = salted_join(probe, build, "k", probe_salt_col=F.col("id"))
    assert out.count() == 10_000
    assert out.agg(F.sum(F.col("v") * F.col("w"))).first()[0] == 2 * sum(range(10_000))


def test_load_table_fmt_roundtrip(spark, tmp_path):
    """nation written as csv/json/orc reads back value-identical to the
    parquet original under load_table_fmt with the explicit schema."""
    from ecommerce_dbt_medallion_spark.sources.registry import load_table, load_table_fmt

    ref = load_table(spark, SF_SMOKE, "nation")
    expected = sorted(map(tuple, ref.collect()))
    for fmt in ("csv", "json", "orc"):
        p = str(tmp_path / f"nation_{fmt}")
        w = ref.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(p)
        elif fmt == "json":
            w.json(p)
        else:
            w.orc(p)
        back = load_table_fmt(spark, p, fmt, schema=ref.schema)
        assert sorted(map(tuple, back.collect())) == expected, fmt


def test_load_table_fmt_requires_schema_for_text(spark):
    from ecommerce_dbt_medallion_spark.sources.registry import load_table_fmt

    with pytest.raises(ValueError):
        load_table_fmt(spark, "/tmp/x", "csv")


def test_dq_timestamp_rendering_parity(spark, duck):
    """The value_type='timestamp' rendering path in the DQ engine is not
    exercised by current CHECKS — pin the cross-engine format agreement
    (Spark date_format 'SSSSSS' vs DuckDB strftime '%f', both 6-digit
    zero-padded µs) BEFORE any future check relies on it."""
    from ecommerce_dbt_medallion_spark.quality.checks import (
        _render_value,
        _render_value_sql,
    )

    us = [1_700_000_000_123_456, 1_700_000_000_000_000, 999_999, 1]
    df = spark.createDataFrame([(u,) for u in us], "us long").select(
        "us", F.timestamp_micros("us").alias("ts")
    )
    got_spark = {
        r["us"]: r["val"]
        for r in df.select(
            "us", _render_value(F.col("ts"), "timestamp").alias("val")
        ).collect()
    }
    sql = _render_value_sql("make_timestamp(us)", "timestamp")
    got_duck = dict(
        duck.sql(
            f"select us, {sql} as val from (select unnest({us}) as us)"
        ).fetchall()
    )
    assert got_spark == got_duck, (got_spark, got_duck)


def test_dq_timestamp_rendering_is_session_tz_independent(spark):
    """Round-7 review: the timestamp rendering must print the instant's
    UTC wall clock no matter what session TZ the DRIVER happens to run
    under (date_format alone renders in session TZ; the DuckDB twin
    prints naive-as-UTC)."""
    from pyspark.sql import functions as F

    from ecommerce_dbt_medallion_spark.quality.checks import _render_value

    df = spark.sql(
        "select timestamp'2024-06-01 12:34:56.789012' as ts"
    )
    utc = df.select(_render_value(F.col("ts"), "timestamp").alias("r")).collect()[0]["r"]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # re-read the literal under the NEW tz? No — build the instant
        # from epoch micros so both sessions see the same instant
        us = df.select(F.unix_micros("ts").alias("u")).collect()[0]["u"]
        df2 = spark.sql(f"select timestamp_micros({us}) as ts")
        ny = df2.select(
            _render_value(F.col("ts"), "timestamp").alias("r")
        ).collect()[0]["r"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert ny == utc == "2024-06-01 12:34:56.789012", (ny, utc)
