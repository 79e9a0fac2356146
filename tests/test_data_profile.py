"""Structure contract for scripts/data_profile.py (round-9 tool).

Values legitimately change with every driver regeneration — that is
the tool's whole point — so the tests pin STRUCTURE (tables covered,
workload-driver keys present, committed JSON parseable and shaped the
same) and the CLI contract, never specific numbers.
"""

from __future__ import annotations

import json
import os

import pytest

from scripts import data_profile

SF_SMALL = "/root/testdata/sf0.001"


def test_help_exits_zero(capsys):
    with pytest.raises(SystemExit) as exc:
        data_profile.parse_args(["--help"])
    assert exc.value.code == 0
    assert "usage:" in capsys.readouterr().out


def test_unknown_flag_rejected():
    with pytest.raises(SystemExit) as exc:
        data_profile.parse_args(["--bogus"])
    assert exc.value.code == 2


def _assert_shape(prof: dict) -> None:
    assert set(prof["rows"]) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert all(isinstance(v, int) and v > 0 for v in prof["rows"].values())
    ev = prof["events"]
    assert ev["distinct_users"] > 0
    # the session count keyed by the SAME gap M4 uses, so the profile
    # predicts the state-store group count
    assert f"sessions_gap{data_profile.SESSION_GAP_MIN}m" in ev
    assert data_profile.SESSION_GAP_MIN == 30  # M4's gap (streaming_q.py)
    doc = prof["documents"]["n_chars"]
    assert doc["min"] <= doc["p50"] <= doc["p90"] <= doc["max"]
    emb = prof["embeddings"]
    assert emb["dim"] > 0 and emb["median_l2_norm"] > 0
    assert prof["fanout"]["lineitem_per_order_max"] >= 1


def test_profile_shape_at_small_sf():
    _assert_shape(data_profile.profile(SF_SMALL))


def test_committed_profile_parses_and_matches_shape():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DATA_PROFILE.json",
    )
    with open(path) as f:
        _assert_shape(json.load(f))
