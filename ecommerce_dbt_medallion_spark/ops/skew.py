"""Skew-resilient join utility — the manual fallback for when AQE's
skew-join splitting isn't available (e.g. broadcast-disabled SMJ on a
pathologically hot key at 100 TB).

``salted_join`` replicates the build side SALT ways and scatters the
probe side uniformly: probe rows get salt = pmod(hash(key), SALT) —
deterministic, shuffle-balanced — and the build side is exploded to all
SALT values, so the equi-join on (key, salt) spreads a hot key across
SALT reducers at the cost of replicating the (small-ish) build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``key`` with salt-scattering.

    Result is row-identical to ``probe.join(build, key, how)`` for
    inner/left joins (build side must be unique-ish per key or the usual
    join multiplicity applies, exactly as in the plain join).
    """
    salted_probe = probe.withColumn("__salt", F.pmod(F.hash(F.col(key)), F.lit(salt)))
    salted_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_probe.join(salted_build, [key, "__salt"], how).drop("__salt")
