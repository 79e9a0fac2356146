"""Shared fixtures: one SparkSession per test run, DuckDB oracle connection,
and a parity checker that mimics the driver's compare (row count + schema
names + order-insensitive value comparison)."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

# Pin the process timezone to UTC before the JVM spawns (same rationale
# as scripts/driver_replay.py): PySpark renders LTZ timestamps in the OS
# timezone at collect(), and the parity compare assumes UTC wall times.
os.environ["TZ"] = "UTC"
time.tzset()

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import tables
from test_dataengineer2026_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MID", "/root/testdata/sf0.01")


# Single shared layout-aware implementation (r12 advisor: the copy here
# and the one in scripts/driver_replay.py had drifted-prone detection).
duck_view_sql = tables.duck_view_sql


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in tables.TABLES:
        con.execute(duck_view_sql(t, SF_DIR))
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _sortable(row):
    return tuple((x is None, str(x)) for x in row)


def assert_parity(spark_df, duck_con, oracle: str, exact: bool = True):
    """Mimic the driver: compare column-name-sorted, row-order-insensitive
    values between a Spark DataFrame and a DuckDB oracle query."""
    sp_cols = sorted(spark_df.columns)
    sp_rows = [
        tuple(_norm_cell(r[c]) for c in sp_cols) for r in spark_df.collect()
    ]

    res = duck_con.execute(oracle)
    dk_names = [d[0] for d in res.description]
    dk_order = sorted(range(len(dk_names)), key=lambda i: dk_names[i])
    dk_cols = [dk_names[i] for i in dk_order]
    dk_rows = [
        tuple(_norm_cell(row[i]) for i in dk_order) for row in res.fetchall()
    ]

    assert sp_cols == dk_cols, f"schema mismatch: spark={sp_cols} duck={dk_cols}"
    assert len(sp_rows) == len(dk_rows), (
        f"row count mismatch: spark={len(sp_rows)} duck={len(dk_rows)}"
    )

    sp_rows.sort(key=_sortable)
    dk_rows.sort(key=_sortable)
    mismatches = []
    for i, (a, b) in enumerate(zip(sp_rows, dk_rows)):
        if a != b:
            ok = True
            for x, y in zip(a, b):
                if x == y:
                    continue
                if (
                    not exact
                    and isinstance(x, float)
                    and isinstance(y, float)
                    and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                ):
                    continue
                ok = False
            if not ok:
                mismatches.append((i, a, b))
    assert not mismatches, (
        f"{len(mismatches)} mismatched rows; first: {mismatches[0]}"
    )
