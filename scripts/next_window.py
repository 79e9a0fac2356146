"""Compute the next round's DRIVER_PRIORITY candidates.

Usage:
    python scripts/next_window.py            # unverified names (front-load these)
    python scripts/next_window.py --stale    # 50 oldest greens (re-verify these)

Default mode prints every registered query with NO green row in any
CORRECTNESS_r*.json (rows_match + schema_match + hash_match all true),
in registration order — i.e. the names the next rotation must
front-load. The driver verifies the FIRST 50 registered queries per
round, so if more than 50 names print, defer the lowest-stakes ones
explicitly and say so in queries/__init__.py.

``--stale`` is for the converged state (zero unverified): it prints
the 50 queries whose LATEST green row is oldest, plus the last-green-
round histogram — the driver regenerates testdata each round and never
re-checks old rows, and physical parquet types have shifted between
regenerations before (the r2 incident), so spare window slots should
re-prove the stalest greens on fresh parquet. Unverified names, if
any, sort before every green and appear first in this mode too.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import registry


def last_green_round(root: str | None = None) -> dict[str, int]:
    """name -> highest round whose CORRECTNESS file has a green row for it."""
    latest: dict[str, int] = {}
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            data = json.load(f)
        if "parsed" in data and isinstance(data["parsed"], dict):
            data = data["parsed"]
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def parse_args(argv: list[str] | None = None):
    """CLI: ``--stale`` switches from unverified names to oldest greens."""
    import argparse

    ap = argparse.ArgumentParser(
        description=(
            "Compute the next round's DRIVER_PRIORITY candidates from "
            "the CORRECTNESS_r*.json history."
        )
    )
    ap.add_argument(
        "--stale", action="store_true",
        help="print the 50 queries whose latest green row is oldest "
             "(plus the vintage histogram) instead of unverified names",
    )
    return ap.parse_args(argv)


def main() -> None:
    args = parse_args()

    latest = last_green_round()
    green = set(latest)
    unverified = [n for n in registry.all_specs() if n not in green]

    if args.stale:
        hist = collections.Counter(latest[n] for n in latest)
        print(
            "# last-green-round histogram: "
            + ", ".join(f"r{r}={hist[r]}" for r in sorted(hist))
        )
        # True registration order breaks ties inside a vintage (NOT the
        # DRIVER_PRIORITY-first order all_specs() returns — the r7
        # advisor flagged that using it would rank current-window names
        # ahead of the rest of their vintage), so the output is stable
        # across rotations and directly pasteable into DRIVER_PRIORITY.
        reg_order = {n: i for i, n in enumerate(registry._REGISTRY)}
        ranked = sorted(
            registry.all_specs(),
            key=lambda n: (latest.get(n, 0), reg_order[n]),
        )[:50]
        print(f"# {len(unverified)} unverified; 50 stalest (oldest green first):")
        for n in ranked:
            vintage = f"r{latest[n]}" if n in latest else "UNVERIFIED"
            print(f"{n}  # {vintage}")
        return

    print(f"# {len(green)} driver-green, {len(unverified)} unverified:")
    for n in unverified:
        print(n)
    if len(unverified) > 50:
        print(
            f"# WARNING: {len(unverified)} > 50 — one window cannot clear "
            "the backlog; defer the excess deliberately.",
            file=sys.stderr,
        )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        # `next_window.py | head` closes stdout early — normal usage,
        # not an error worth a traceback.
        os._exit(0)
