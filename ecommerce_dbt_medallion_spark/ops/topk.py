"""Scalable per-group top-k.

A single ``row_number() over (partition by group order by ...)`` is the
textbook answer, but when the group cardinality is small (5 regions, a
handful of languages) every row of a 100 TB fact lands in one of a few
window partitions — a worst-case skew sort. The two-stage shape below is
the scale-safe idiom:

1. salt the partition key with ``hash(tie_break) % salt_mod`` and keep
   the per-(group, salt) top-k — balanced partitions, each sorting
   ~n/salt_mod rows and emitting at most k;
2. re-rank the surviving ``salt_mod * k`` rows per group — bounded input,
   the final sort is trivial at any input scale.

Stage 1 never changes the answer: the true global top-k of a group is a
subset of the union of its per-salt top-k (every discarded row was beaten
by >= k rows in its OWN salt bucket, hence by >= k rows in the group).

Used by ops.sampling (fixed-k per-stratum samples) and
models.analytics.top_parts_per_region.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOPK_SALT_MOD = 64


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_exprs: Sequence[Column],
    tie_break: Column,
    k: int,
    rank_alias: str = "rank",
    salt_mod: int = TOPK_SALT_MOD,
) -> DataFrame:
    """Top-k rows per group under a deterministic total order.

    ``order_exprs`` must end in a unique total order (callers pass
    ``tie_break`` — a unique id column — which is also the salt input so
    salting is deterministic).
    """
    salt = F.pmod(F.xxhash64(tie_break), F.lit(salt_mod))
    w1 = Window.partitionBy(*group_cols, salt).orderBy(*order_exprs)
    survivors = (
        df.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return survivors.withColumn(
        rank_alias, F.row_number().over(w2).cast("long")
    ).where(F.col(rank_alias) <= k)
