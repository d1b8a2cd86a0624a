"""Parquet source registry.

One reader per logical table; filters/projections applied by callers stay
declarative so Catalyst pushes them into the parquet scan (verify with
``.explain("formatted")`` → PushedFilters / ReadSchema). At 100 TB these
directories would be partitioned (e.g. orders by order_date month) and the
same ``spark.read.parquet`` call gets partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (region/nation/customer/.../embeddings)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to a true TIMESTAMP, whatever the
    parquet encoding of the day is.

    The driver's testdata has shipped two encodings so far:

    - TIMESTAMP(NANOS), which Spark's vectorized reader only exposes as
      ``bigint`` via ``spark.sql.legacy.parquet.nanosAsLong`` — convert
      ns→µs (sub-µs is zero in this data; truncation matches DuckDB's
      ns→µs read);
    - timezone-naive timestamp[us], which Spark reads as TIMESTAMP_NTZ —
      cast to TIMESTAMP. The session timezone is pinned to UTC
      (session.py), so the cast is value-preserving and keeps parity
      with DuckDB, which treats naive timestamps as UTC instants.

    ``unix_micros`` and ``withWatermark`` both hard-require TIMESTAMP,
    so every consumer of event time goes through this one helper; a new
    encoding should be handled HERE (and will be caught by the dtype
    pinning test in tests/test_sources.py).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        # The NTZ→TIMESTAMP cast interprets the naive value in the
        # SESSION timezone — pin UTC here so the instant is the same in
        # any caller's session (the whole engine's oracle parity assumes
        # UTC; see SURVEY §3).
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming reader for the events table with normalized event time.

    File-source streams need an explicit schema (no inference mid-stream)
    and a glob basePath; the static read supplies the schema, then the
    same ``normalize_event_ts`` projection runs on the stream so every
    ``withWatermark("ts", ...)`` downstream sees a true TIMESTAMP.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path + "*")
    return normalize_event_ts(stream)


def load_table_fmt(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Format-agnostic table reader: parquet / orc / csv / json.

    Text formats (csv, json) REQUIRE an explicit schema: schema inference
    is a full extra scan of the source at 100 TB and makes column types
    data-dependent. Columnar formats carry their schema and get predicate
    pushdown + column pruning; text formats only prune columns — the
    docstring contract is that bulk facts live in parquet/orc and
    csv/json exist for ingestion edges (dbt seed parity).
    """
    fmt = fmt.lower()
    reader = spark.read
    if fmt in ("parquet", "orc"):
        if schema is not None:
            reader = reader.schema(schema)
        return reader.format(fmt).load(path)
    if schema is None:
        raise ValueError(f"{fmt} sources require an explicit schema")
    reader = reader.schema(schema)
    if fmt == "csv":
        return reader.csv(path, header=True, timestampFormat="yyyy-MM-dd HH:mm:ss")
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported source format: {fmt}")
