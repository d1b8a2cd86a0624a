"""Spark-vs-DuckDB parity for every inventory key that declares an oracle —
the same gate the driver runs (row count + schema + order-insensitive
values), at sf0.001 for speed plus sf0.01 to match the driver exactly.
"""

from __future__ import annotations

import pytest

from ecommerce_dbt_medallion_spark import api
from tests.conftest import (
    SF_CORRECTNESS,
    SF_SMOKE,
    assert_frames_match,
    register_views,
)

QUERIES = api.queries()
ORACLES = api.oracle_sql()
KEYS = sorted(ORACLES)


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle keys without queries(): {missing}"


@pytest.mark.parametrize("key", KEYS)
def test_parity_smoke_sf(spark, duck, key):
    register_views(duck, SF_SMOKE)
    spdf = QUERIES[key](spark, SF_SMOKE).toPandas()
    odf = duck.sql(ORACLES[key]).df()
    assert_frames_match(spdf, odf, key)


@pytest.mark.slow
@pytest.mark.parametrize("key", KEYS)
def test_parity_driver_sf(spark, duck, key):
    register_views(duck, SF_CORRECTNESS)
    spdf = QUERIES[key](spark, SF_CORRECTNESS).toPandas()
    odf = duck.sql(ORACLES[key]).df()
    assert_frames_match(spdf, odf, key)


# --------------------------------------------------------------------------
# Round-14 QUEUE (VERDICT r12 #4): implemented + oracled in round 13 but
# NOT registered in api.queries() — the 200-key/50-slot rotation has zero
# spare capacity this round (api.py's round-13 rotation note). Parity runs
# here with the exact driver discipline so round-14 registration is a
# two-line api.py change, not new work.


def _queued_keys():
    from ecommerce_dbt_medallion_spark.ops import chunking, classify

    return {
        "pack_manifest_bfd": (
            chunking.pack_manifest_bfd,
            chunking.oracle_pack_manifest_bfd(),
        ),
        "doc_quality_calibration": (
            classify.doc_quality_calibration,
            classify.oracle_doc_quality_calibration(),
        ),
    }


def test_queued_keys_not_yet_registered():
    """The rotation-capacity invariant this round rests on: the queued
    keys must NOT be in queries() while DRIVER_WINDOW_ROUND == 13 (a
    registration would force them into the window as never-certified
    keys, displacing an r9 key to 5 rounds stale). Flips to a
    registration reminder in round 14."""
    queued = set(_queued_keys())
    if api.DRIVER_WINDOW_ROUND <= 13:
        assert not queued & set(QUERIES), (
            f"queued keys registered early: {queued & set(QUERIES)}"
        )
    else:
        assert queued <= set(QUERIES), (
            f"round-14+ window but queue never registered: "
            f"{queued - set(QUERIES)}"
        )


@pytest.mark.parametrize("key", sorted(_queued_keys()))
def test_queued_parity_smoke_sf(spark, duck, key):
    fn, osql = _queued_keys()[key]
    register_views(duck, SF_SMOKE)
    assert_frames_match(
        fn(spark, SF_SMOKE).toPandas(), duck.sql(osql).df(), key
    )


@pytest.mark.slow
@pytest.mark.parametrize("key", sorted(_queued_keys()))
def test_queued_parity_driver_sf(spark, duck, key):
    fn, osql = _queued_keys()[key]
    register_views(duck, SF_CORRECTNESS)
    assert_frames_match(
        fn(spark, SF_CORRECTNESS).toPandas(), duck.sql(osql).df(), key
    )
