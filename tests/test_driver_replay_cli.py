"""CLI contract for scripts/driver_replay.py (round-8 verdict findings #1/#2).

The replay script is part of the verification loop, so its failure
modes must be loud: unknown flags are rejected (not silently treated
as name prefixes), malformed or out-of-range ``--shard`` values exit
with a usage error, and an empty selection can never print the
"ALL MATCH" verdict (main() returns 2 before any query runs).
All assertions here go through ``parse_args`` only — no SparkSession.
"""

from __future__ import annotations

import pytest

from scripts import driver_replay as dr


def test_help_exits_zero(capsys):
    with pytest.raises(SystemExit) as exc:
        dr.parse_args(["--help"])
    assert exc.value.code == 0
    assert "usage:" in capsys.readouterr().out


def test_unknown_flag_rejected():
    with pytest.raises(SystemExit) as exc:
        dr.parse_args(["--bogus"])
    assert exc.value.code == 2


@pytest.mark.parametrize("bad", ["0/8", "9/8", "1/0", "x/8", "3", "-1/8"])
def test_bad_shard_rejected(bad):
    with pytest.raises(SystemExit) as exc:
        dr.parse_args(["--shard", bad])
    assert exc.value.code == 2


def test_good_shard_parsed():
    args = dr.parse_args(["--shard", "3/8"])
    assert args.shard == (3, 8)
    assert args.prefixes == []


def test_prefixes_and_window():
    args = dr.parse_args(["A1", "J", "--window"])
    assert args.prefixes == ["A1", "J"]
    assert args.window is True
    assert args.shard is None
