"""Skew-join micro-benchmark: unsalted SMJ vs AQE skew-split vs salted_join.

Synthetic hot-key dataset: a probe table where a large fraction of rows
share ONE join key (the "hot" key), joined against a build side too big
to broadcast (broadcast disabled to force the shuffle path, which is the
100 TB shape — at that scale the build side often exceeds the broadcast
threshold anyway).

Three plans over identical data:
  1. plain      — sort-merge join, AQE skew-split OFF: every row of the
                  hot key hashes to one reducer; that task is the
                  straggler and the stage takes as long as it does.
  2. aqe        — same join, AQE skew-split ON: runtime splits the
                  oversized partition into multiple tasks.
  3. salted     — ops.skew.salted_join with AQE OFF: per-row salt
                  scatters the hot key over SALT reducers at plan time;
                  this is the path when AQE can't help (e.g. the skewed
                  side feeds a window/aggregate AQE won't rewrite, or a
                  non-AQE engine).

Prints ONE JSON line: {"plain": s, "aqe": s, "salted": s, ...}.
Run: python bench_skew.py  (env SKEW_ROWS / SKEW_KEYS / SKEW_HOT_FRAC to resize)
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.ops.skew import salted_join

ROWS = int(os.environ.get("SKEW_ROWS", 16_000_000))
KEYS = int(os.environ.get("SKEW_KEYS", 50_000))
HOT_FRAC = float(os.environ.get("SKEW_HOT_FRAC", 0.75))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_tables(spark):
    # Probe: HOT_FRAC of rows on key 0, the rest uniform over [1, KEYS).
    probe = (
        spark.range(ROWS)
        .withColumn(
            "k",
            F.when(F.rand(7) < F.lit(HOT_FRAC), F.lit(0)).otherwise(
                (F.pmod(F.hash("id"), F.lit(KEYS - 1)) + 1)
            ),
        )
        .withColumn("v", (F.col("id") % 1000).cast("double"))
        .select("id", "k", "v")
    )
    # Build: one row per key, with a payload column.
    build = (
        spark.range(KEYS)
        .withColumnRenamed("id", "k")
        .withColumn("w", (F.col("k") % 97).cast("double"))
    )
    return probe, build


def timed(spark, aqe_skew: bool, fn) -> float:
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
    # Keep AQE from coalescing the comparison away differently per run.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_skew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    probe, build = build_tables(spark)
    # Materialize inputs once so each run times the JOIN, not generation.
    probe = probe.localCheckpoint(eager=True)
    build = build.localCheckpoint(eager=True)

    # Per-row sha2 in the join stage: the post-join projection + partial agg
    # run inside the reducer task that owns the hot key, so the straggler
    # does HOT_FRAC of ALL the work single-threaded unless the key is split.
    measure = F.sum(
        F.conv(F.substring(F.sha2(F.concat_ws("-", "id", "v", "w"), 256), 1, 8), 16, 10)
    )

    def plain():
        probe.join(build, "k").agg(measure).collect()

    def salted():
        salted_join(probe, build, "k").agg(measure).collect()

    results = {}
    # Warm a join once so JIT/codegen caches don't bias the first run.
    timed(spark, False, plain)
    results["plain"] = timed(spark, False, plain)      # skew hits one reducer
    results["aqe"] = timed(spark, True, plain)         # AQE splits it at runtime
    results["salted"] = timed(spark, False, salted)    # plan-time scatter, AQE off

    results.update(rows=ROWS, keys=KEYS, hot_frac=HOT_FRAC, cpus=int(CPUS))
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
