"""Source-encoding robustness + driver-window invariants.

Round 4 lesson: the driver regenerated the testdata parquet between
rounds (events.ts went TIMESTAMP(NANOS) → naive timestamp[us] / NTZ) and
20 tests failed with opaque analysis errors. These tests pin the
*normalized* dtypes per table at sf0.001 so the next re-encode fails
HERE, once, with a clear message — and pin the api.DRIVER_WINDOW
invariants so the 50-key correctness window can't silently drift
(round 4 shipped 51 keys ahead of the marker and lost key #51).
"""

from __future__ import annotations

import pytest

from ecommerce_dbt_medallion_spark import api
from ecommerce_dbt_medallion_spark.models.events import load_events
from ecommerce_dbt_medallion_spark.sources.registry import (
    load_event_stream,
    load_table,
    normalize_event_ts,
)
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# encoding robustness: normalized dtypes per table
# ---------------------------------------------------------------------------

def test_events_ts_normalizes_to_timestamp(spark):
    """Whatever the parquet encoding of the day, load_events must hand
    downstream a true TIMESTAMP (unix_micros/withWatermark hard-require
    it). If this fails, fix normalize_event_ts — not the 20 consumers."""
    dtypes = dict(load_events(spark, SF_SMOKE).dtypes)
    assert dtypes["ts"] == "timestamp", (
        f"events.ts normalized to {dtypes['ts']!r}, want 'timestamp' — "
        "the testdata encoding changed again; extend normalize_event_ts "
        "in sources/registry.py"
    )


def test_key_column_dtypes_pinned(spark):
    """Pin the raw dtypes our loaders/casts rely on. A driver re-encode
    shows up here as ONE failure naming the drifted column."""
    expectations = {
        # date-like columns are consumed via .cast("date") everywhere, so
        # any of these three encodings is fine — but a switch to e.g. string
        # would silently change semantics: pin the current set.
        "orders": {"o_orderdate": {"date", "timestamp", "timestamp_ntz"}},
        "lineitem": {"l_shipdate": {"date", "timestamp", "timestamp_ntz"}},
        "customer": {"c_custkey": {"bigint", "int"}},
        "events": {
            "ts": {"bigint", "timestamp", "timestamp_ntz"},
            "event_id": {"bigint"},
            "user_id": {"bigint"},
            "value": {"double"},
        },
        "documents": {"doc_id": {"bigint"}, "text": {"string"}},
        "embeddings": {"vec_id": {"bigint"}, "embedding": {"array<float>", "array<double>"}},
    }
    drift = []
    for table, cols in expectations.items():
        dtypes = dict(load_table(spark, SF_SMOKE, table).dtypes)
        for col, allowed in cols.items():
            if dtypes.get(col) not in allowed:
                drift.append(f"{table}.{col}={dtypes.get(col)!r} not in {sorted(allowed)}")
    assert not drift, "testdata encoding drifted: " + "; ".join(drift)


def test_normalize_event_ts_handles_both_encodings(spark):
    """Known-answer: the same instant through the legacy nanos-as-long
    path and the NTZ path must land on the same TIMESTAMP value."""
    from pyspark.sql import functions as F

    us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in µs
    legacy = spark.range(1).select((F.lit(us) * 1000).alias("ts"))
    ntz = spark.range(1).select(
        F.timestamp_micros(F.lit(us)).cast("timestamp_ntz").alias("ts")
    )
    got_legacy = normalize_event_ts(legacy).collect()[0][0]
    got_ntz = normalize_event_ts(ntz).collect()[0][0]
    assert dict(normalize_event_ts(legacy).dtypes)["ts"] == "timestamp"
    assert dict(normalize_event_ts(ntz).dtypes)["ts"] == "timestamp"
    assert got_legacy == got_ntz


# ---------------------------------------------------------------------------
# streaming: watermark analysis must succeed on current testdata
# ---------------------------------------------------------------------------

def test_stream_loader_watermark_analyzes(spark):
    """Analysis-only (no execution): withWatermark on the shared stream
    loader must resolve against the CURRENT testdata encoding. This is
    the instant type-drift tripwire for all six streaming keys."""
    stream = load_event_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # raises AnalysisException on a non-TIMESTAMP event-time column
    stream.withWatermark("ts", "2 hours").groupBy("event_type").count()


# ---------------------------------------------------------------------------
# driver-window invariants (api.DRIVER_WINDOW)
# ---------------------------------------------------------------------------

def test_nanos_encoding_roundtrip_and_targeted_error(spark, tmp_path):
    """Real TIMESTAMP(NANOS) parquet (the round-≤3 testdata encoding,
    absent from current testdata): with the session conf set (session.py
    default) the loader normalizes to the right instant; with it unset,
    the loader raises ONE targeted error naming the conf instead of
    Spark's opaque 'Illegal Parquet type'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from ecommerce_dbt_medallion_spark.sources.registry import (
        NANOS_CONF,
        load_events_table,
    )

    us = 1_700_000_000_123_456
    d = tmp_path / "sf_nanos"
    d.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([us * 1000], type=pa.timestamp("ns"))}),
        str(d / "events.parquet"),
        store_schema=False,  # plain parquet logical type, no arrow hint
    )

    got = (
        load_events_table(spark, str(d))
        .select(F.unix_micros("ts").alias("us"))
        .collect()[0]["us"]
    )
    assert got == us

    prev = spark.conf.get(NANOS_CONF)
    try:
        spark.conf.set(NANOS_CONF, "false")
        with pytest.raises(RuntimeError, match=NANOS_CONF):
            load_events_table(spark, str(d))
    finally:
        spark.conf.set(NANOS_CONF, prev)


def test_no_session_conf_mutation_outside_session_py():
    """Loaders and operators must not mutate global session conf (the
    round-5 VERDICT footgun: a loader silently flipping the session TZ
    or a legacy parquet flag changes behavior for every later query in
    the caller's session). All conf defaults live in session.py's
    builder; everything else may only READ conf."""
    import pathlib

    pkg = pathlib.Path(__file__).parent.parent / "ecommerce_dbt_medallion_spark"
    offenders = []
    for py in pkg.rglob("*.py"):
        if py.name == "session.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if "conf.set" in line:
                offenders.append(f"{py.relative_to(pkg)}:{i}: {line.strip()}")
    assert not offenders, "session-conf mutation outside session.py:\n" + "\n".join(
        offenders
    )


def test_driver_window_is_exactly_the_checked_prefix():
    q = api.queries()
    assert list(q)[: api.DRIVER_WINDOW_SIZE] == api.DRIVER_WINDOW
    assert len(api.DRIVER_WINDOW) == api.DRIVER_WINDOW_SIZE == 50
    assert len(set(api.DRIVER_WINDOW)) == 50


def test_driver_window_membership():
    """Rotation correctness, computed from the committed CORRECTNESS
    artifacts (never a hand-copied set — the round-4 lesson), but ONLY
    from rounds strictly before api.DRIVER_WINDOW_ROUND — the round-8
    variant of this test computed state from ALL artifacts on disk and
    self-invalidated the moment the driver dropped the round's own
    CORRECTNESS file into the repo root (it certifies exactly this
    window, emptying the stale set the window was built from).

    1. every key with NO driver row before the window's round must be
       in the window (never-certified outranks green), except a
       documented overflow when the never-certified class alone
       exceeds the window;
    2. no slot is wasted on a fresh-green key while stale keys wait:
       every non-never slot must go to a key from the OLDEST certified
       round still outstanding (or the window must have drained that
       class entirely).
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_round: dict = {}
    # r0* would stop matching at round 10; r* + the regex handles both.
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r0*(\d+)\.json$", p).group(1))
        if rnd >= api.DRIVER_WINDOW_ROUND:
            continue  # the window's own (or a later) artifact: not input
        for key in json.load(open(p)):
            latest_round[key] = max(latest_round.get(key, 0), rnd)
    window = set(api.DRIVER_WINDOW)
    keys = set(api.queries())
    never_certified = keys - set(latest_round)

    overflow = never_certified - window
    allowed_overflow = max(0, len(never_certified) - api.DRIVER_WINDOW_SIZE)
    assert len(overflow) <= allowed_overflow, (
        f"never-certified keys outside a non-saturated window: {overflow}"
    )
    note = open(
        os.path.join(root, "ecommerce_dbt_medallion_spark", "api.py")
    ).read().split("DRIVER_WINDOW_SIZE = ")[0]
    undocumented = {k for k in overflow if k not in note}
    assert not undocumented, (
        f"deferred never-certified keys absent from the rotation note: "
        f"{undocumented}"
    )

    # Greedy-oldest check: walk certified keys oldest-round-first; the
    # window's non-never slots must be consumed by whole rounds until
    # one round only partially fits (ties within that round are the
    # builder's choice, documented in the note).
    rest = window - never_certified
    stranger = rest - set(latest_round)
    assert not stranger, f"window keys with no certification state: {stranger}"
    rounds = sorted({latest_round[k] for k in keys if k in latest_round})
    for rnd in rounds:
        cls = {k for k in keys if latest_round.get(k) == rnd}
        took = cls & rest
        rest -= took
        if not rest:
            # Window drained inside (or exactly at) this round's class:
            # no newer-certified key may hold a slot that an older
            # outstanding key needed — guaranteed because rest is empty.
            break
        assert cls <= took | never_certified, (
            f"round-{rnd} keys left out while newer-certified keys hold "
            f"window slots: {cls - took}"
        )
    assert not rest, f"window keys newer than the oldest outstanding class: {rest}"


def test_survey_section2_lists_every_query_key():
    """Structural guard (round-8 VERDICT mandate): SURVEY.md §2 is the
    judge's coverage checklist, and two consecutive rounds shipped an
    inventory short one key (stream_hopping_rollup in r6,
    active_users_rolling in r7). Every queries() key must appear as a
    backticked name inside §2, so the drift class is impossible."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "SURVEY.md")).read()
    sec2 = text.split("## §2", 1)[1].split("## §3", 1)[0]
    missing = [k for k in api.queries() if f"`{k}`" not in sec2]
    assert not missing, f"queries() keys absent from SURVEY.md §2: {missing}"
    # the header's count claim must match reality too (round 7 shipped
    # "139" over a 138-entry list)
    import re

    m = re.search(r"All (\d+) `queries\(\)` keys below", sec2)
    assert m and int(m.group(1)) == len(api.queries()), (
        f"SURVEY §2 claims {m and m.group(1)} keys; "
        f"queries() has {len(api.queries())}"
    )


def test_every_key_has_oracle_or_documented_rows_only():
    q = api.queries()
    osql = api.oracle_sql()
    # dedup_minhash_lsh is the sole rows-only key (xxhash64 fast path;
    # its md5 twin carries the value oracle). sketch_distinct_users
    # gained a full oracle in round 6 (md5-register HLL).
    rows_only_by_design = {"dedup_minhash_lsh"}
    missing = set(q) - set(osql) - rows_only_by_design
    assert not missing, f"keys without oracle_sql and not documented rows-only: {missing}"


def test_normalize_event_ts_pins_utc_in_foreign_tz_session(spark, duck):
    """The NTZ→TIMESTAMP cast is session-TZ-dependent; the driver runs
    queries() in ITS session, which we don't control. normalize_event_ts
    pins UTC so the instants match DuckDB's naive-as-UTC read anywhere."""
    from pyspark.sql import functions as F

    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = (
            load_events(spark, SF_SMOKE)
            .select(F.min(F.unix_micros("ts")).alias("us"))
            .collect()[0]["us"]
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
    want = duck.sql(
        f"select min(epoch_us(ts)) from '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    assert got == want


def test_event_utc_date_is_session_tz_independent(spark, duck):
    """event_utc_date is the single day definition shared by the events
    partition column, the mart day-bounds, and event_daily_stats'
    grouping — it must (1) equal DuckDB's naive-as-UTC cast(ts as date)
    on boundary instants, and (2) return identical values whatever the
    Spark session timezone (a session-TZ to_date would flip days around
    midnight UTC in any non-UTC session)."""
    from pyspark.sql import functions as F

    from ecommerce_dbt_medallion_spark.sources.registry import event_utc_date

    boundary = [
        "2024-01-04 23:59:59.999999",
        "2024-01-05 00:00:00.000000",
        "2024-01-05 00:00:00.000001",
        "2024-06-30 12:00:00.000000",
        "2024-12-31 23:59:59.500000",
    ]
    df = spark.createDataFrame(
        [(s,) for s in boundary], "raw string"
    ).select(
        "raw",
        F.expr(
            "make_timestamp(year(raw), month(raw), day(raw), hour(raw), "
            "minute(raw), extract(SECOND FROM cast(raw as timestamp_ntz)), "
            "'UTC')"
        ).alias("ts"),
    )
    want = {
        r[0]: r[1]
        for r in duck.sql(
            "select raw, cast(cast(raw as timestamp) as date) from ("
            + " union all ".join(f"select '{s}' as raw" for s in boundary)
            + ")"
        ).fetchall()
    }
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for zone in ("UTC", "America/Los_Angeles", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", zone)
            got = {
                r["raw"]: r["d"]
                for r in df.select("raw", event_utc_date().alias("d")).collect()
            }
            results[zone] = got
            assert got == want, f"{zone}: {got} != {want}"
        assert results["UTC"] == results["America/Los_Angeles"] == results[
            "Asia/Kathmandu"
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
