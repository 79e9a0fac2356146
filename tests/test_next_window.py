"""Pin the window-rotation planner's staleness accounting.

The driver only re-proves what DRIVER_PRIORITY front-loads, so the
planner that computes "which greens are stalest" is itself
load-bearing: a row mis-read as green (or a green mis-dated to the
wrong round) silently starves a query of re-verification. No Spark
needed — the input is CORRECTNESS JSON files.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from next_window import last_green_round


def _write(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}


def test_latest_round_wins(tmp_path):
    _write(tmp_path, 1, {"Q1": GREEN, "Q2": GREEN})
    _write(tmp_path, 3, {"Q2": GREEN})
    assert last_green_round(str(tmp_path)) == {"Q1": 1, "Q2": 3}


def test_partial_match_is_not_green(tmp_path):
    _write(
        tmp_path,
        1,
        {
            "Q_rows_only": {**GREEN, "hash_match": False},
            "Q_schema_off": {**GREEN, "schema_match": False},
            "Q_errored": {**GREEN, "err": "boom"},
            "Q_ok": GREEN,
        },
    )
    assert last_green_round(str(tmp_path)) == {"Q_ok": 1}


def test_driver_wrapped_record_unwraps(tmp_path):
    # The driver wraps our per-query rows under "parsed" alongside its
    # own scalar metadata; both shapes must parse identically.
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"n": 2, "rc": 0, "parsed": {"Q1": GREEN}})
    )
    assert last_green_round(str(tmp_path)) == {"Q1": 2}


def test_regression_after_green_does_not_erase_vintage(tmp_path):
    # A later failed check must not LOWER the recorded vintage: the
    # query was green on r1 parquet, and the planner's job is to rank
    # how stale that evidence is, not to re-adjudicate it.
    _write(tmp_path, 1, {"Q1": GREEN})
    _write(tmp_path, 2, {"Q1": {**GREEN, "hash_match": False}})
    assert last_green_round(str(tmp_path)) == {"Q1": 1}


def test_driver_priority_is_exactly_one_window():
    """The driver verifies the FIRST 50 registered names; a tuple that
    drifts off 50 (a paste error during rotation) silently shrinks or
    wastes window slots."""
    from test_dataengineer2026_spark.queries import DRIVER_PRIORITY, load_all
    from test_dataengineer2026_spark import registry

    load_all()
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    assert list(registry.all_specs())[:50] == list(DRIVER_PRIORITY)
