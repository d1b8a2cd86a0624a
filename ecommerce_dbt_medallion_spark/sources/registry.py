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
