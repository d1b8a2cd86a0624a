"""Fuzzy string matching (entity resolution) via deletion-neighborhood
blocking — the SymSpell / string-similarity-join construction: two
strings are within Levenshtein distance 1 iff their deletion
neighborhoods ({s} ∪ all 1-deletions of s) intersect. Candidate
generation is therefore an EQUI-join on variant keys — the same shape
as the LSH band join (ops/dedup.py) — never an all-pairs comparison,
and the blocking is LOSSLESS for distance ≤ 1 (distance ≤ 2 is the
same construction at depth 2).

Scale: each name emits len+1 variant keys (bounded); the variant join
shuffles keys, not name pairs; exact levenshtein runs on candidates
only. Both engines implement unit-cost Levenshtein identically, so the
operator carries a full value oracle.

Reference analogue: silver_customers name standardization
(models/silver/silver_customers.sql:19-66) — this is the entity-
resolution step a real customer MDM pipeline runs after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FUZZY_MAX_DIST = 1


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate customer surnames (edit distance ≤ 1) with the
    exact distance, via lossless deletion-variant blocking."""
    from ecommerce_dbt_medallion_spark.models.silver import silver_customers

    names = (
        silver_customers(spark, sf_dir)
        .select(F.col("last_name").alias("name"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by both sides of the variant join
    )
    variants = names.select(
        "name",
        F.explode(
            F.concat(
                F.array(F.col("name")),
                F.expr(
                    "transform(sequence(1, length(name)), "
                    "i -> concat(substr(name, 1, i - 1), substr(name, i + 1)))"
                ),
            )
        ).alias("v"),
    ).distinct()
    cand = (
        variants.alias("a")
        .join(variants.alias("b"), "v")
        .where(F.col("a.name") < F.col("b.name"))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.where(dist <= FUZZY_MAX_DIST).select(
        "name_a", "name_b", dist.cast("long").alias("edit_distance")
    )


def oracle_fuzzy_name_match() -> str:
    from ecommerce_dbt_medallion_spark.oracle import assemble

    return assemble(
        "silver_customers",
        final_select=f"""
, names as (select distinct last_name as name from silver_customers),
pos as (select name, unnest(range(1, length(name) + 1)) as i from names),
vars as (
    select distinct name, v from (
        select name, name as v from names
        union all
        select name,
            substr(name, 1, cast(i as int) - 1) || substr(name, cast(i as int) + 1)
            as v
        from pos
    )
),
cand as (
    select distinct a.name as name_a, b.name as name_b
    from vars a join vars b on a.v = b.v and a.name < b.name
)
select name_a, name_b,
    cast(levenshtein(name_a, name_b) as bigint) as edit_distance
from cand
where levenshtein(name_a, name_b) <= {FUZZY_MAX_DIST}
""",
    )
