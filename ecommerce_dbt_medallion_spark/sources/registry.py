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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (region/nation/customer/.../embeddings)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
