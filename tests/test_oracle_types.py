"""Oracle output-type lint — kills the HUGEINT class of driver mismatch.

The driver's value hash is TYPE-sensitive. DuckDB types an un-cast integer
``SUM`` (including ``SUM(CASE WHEN … THEN 1 ELSE 0 END)``) as HUGEINT
(int128), a type Spark can never emit — so even value-identical results
hash-mismatch (round-4 incident: ``SQL17_tpch_q12``). The repo convention
is ``CAST(SUM(…) AS BIGINT)`` on every integer sum in every oracle; this
test executes all 209 oracles in DuckDB at sf0.001 and fails on ANY
hugeint-typed output column, so the whole bug class is dead, not just the
one instance.

Runs DuckDB only (no Spark) — fast enough to live in the default suite.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from test_dataengineer2026_spark import registry, tables

SF_DIR = os.environ.get("LINT_SF_DIR", "/root/testdata/sf0.001")

FORBIDDEN_TYPES = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in tables.TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_hugeint_oracle_columns(con):
    oracles = registry.oracle_sql()
    assert len(oracles) >= 209
    bad: list[str] = []
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            coltypes = list(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as e:  # noqa: BLE001 — an un-runnable oracle is itself a failure
            bad.append(f"{name}: ORACLE ERROR {type(e).__name__}: {str(e)[:200]}")
            continue
        for col, typ in coltypes:
            if typ.upper() in FORBIDDEN_TYPES:
                bad.append(
                    f"{name}: column {col!r} is {typ} — wrap the integer "
                    f"SUM in CAST(… AS BIGINT) in the oracle SQL"
                )
    assert not bad, "hugeint-typed oracle columns (driver hash would mismatch):\n" + "\n".join(bad)
