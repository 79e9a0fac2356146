"""Compute the next round's DRIVER_PRIORITY candidates.

Usage:
    python scripts/next_window.py

Prints every registered query with NO green row in any CORRECTNESS_r*.json
(rows_match + schema_match + hash_match all true), in registration order —
i.e. the names the next rotation should front-load. The driver verifies
the FIRST 50 registered queries per round, so if more than 50 names print,
defer the lowest-stakes ones explicitly and say so in queries/__init__.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import registry


def green_names() -> set[str]:
    names: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
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
                names.add(name)
    return names


def main() -> None:
    green = green_names()
    unverified = [n for n in registry.all_specs() if n not in green]
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
    main()
