"""Staging-dir hygiene (test_dataengineer2026_spark/staging.py).

The r16 advisor found the age-based prune ran BEFORE the own-pid check,
so a process alive longer than MAX_STAGE_AGE_SEC could delete its own
still-registered staging dir (and a live sibling's) mid-use. Pin the
fixed precedence: own pid > proven-live sibling > proven-dead sibling >
age fallback (inconclusive probe / no pid only).
"""

from __future__ import annotations

import os
import subprocess
import time

from test_dataengineer2026_spark import staging


def _mkold(root, name, age_sec):
    d = root / name
    d.mkdir(parents=True)
    old = time.time() - age_sec
    os.utime(d, (old, old))
    return d


def test_own_dir_survives_age_prune(tmp_path):
    """A session alive longer than a day must NOT lose its own staged
    store to the age fallback (the r16 advisor's failure mode)."""
    own = _mkold(tmp_path, f"abcdef1234-{os.getpid()}", staging.MAX_STAGE_AGE_SEC + 3600)
    staging._prune_siblings(str(tmp_path))
    assert own.exists()


def test_live_sibling_survives_age_prune(tmp_path):
    """A sibling whose pid probe SUCCEEDS is alive — age never
    overrides a conclusive liveness answer. pid 1 is always alive (and
    kill(1, 0) succeeds for root, which this sandbox runs as)."""
    os.kill(1, 0)  # precondition: probe is conclusive here
    live = _mkold(tmp_path, "abcdef1234-1", staging.MAX_STAGE_AGE_SEC + 3600)
    staging._prune_siblings(str(tmp_path))
    assert live.exists()


def test_dead_sibling_pruned_regardless_of_age(tmp_path):
    p = subprocess.Popen(["true"])
    p.wait()
    dead = _mkold(tmp_path, f"abcdef1234-{p.pid}", 10)  # fresh, but owner dead
    staging._prune_siblings(str(tmp_path))
    assert not dead.exists()


def test_age_fallback_only_for_inconclusive_names(tmp_path):
    """A dir whose name carries no pid has an inconclusive probe: fresh
    ones are kept, day-old ones fall to the age rule."""
    fresh = _mkold(tmp_path, "no-pid-here", 10)
    stale = _mkold(tmp_path, "also-no-pid", staging.MAX_STAGE_AGE_SEC + 3600)
    staging._prune_siblings(str(tmp_path))
    assert fresh.exists()
    assert not stale.exists()
