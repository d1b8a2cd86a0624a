from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb
import pytest

from ecommerce_dbt_medallion_spark.config import TESTDATA_TABLES
from ecommerce_dbt_medallion_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("medallion-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    """Mirror the driver: each testdata table pre-registered as a view."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"create or replace view {name} as select * from '{path}'")


def canon(v) -> str:
    """Engine-independent canonical token for one cell value."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, Decimal):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return repr(f)
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def frame_tokens(df) -> dict[str, list[str]]:
    """Column-name → sorted canonical value list (order-insensitive)."""
    import pandas as pd

    out: dict[str, list[str]] = {}
    for col in sorted(df.columns):
        series = df[col]
        if pd.api.types.is_datetime64_any_dtype(series):
            vals = [None if pd.isna(x) else x.to_pydatetime() for x in series]
        else:
            vals = [None if x is None or (isinstance(x, float) and math.isnan(x)) else x for x in series]
        out[col] = sorted(canon(v) for v in vals)
    return out


def assert_frames_match(spark_pdf, oracle_pdf, key: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{key}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{key}: columns differ\n spark={sorted(spark_pdf.columns)}\n"
        f" oracle={sorted(oracle_pdf.columns)}"
    )
    st = frame_tokens(spark_pdf)
    ot = frame_tokens(oracle_pdf)
    for col in st:
        if st[col] != ot[col]:
            diffs = [
                (a, b) for a, b in zip(st[col], ot[col]) if a != b
            ][:5]
            raise AssertionError(
                f"{key}.{col}: {sum(a != b for a, b in zip(st[col], ot[col]))}"
                f" mismatched values; first diffs (spark, oracle): {diffs}"
            )
