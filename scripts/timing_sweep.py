"""Time every registered query end-to-end at one scale factor.

Usage:
    python scripts/timing_sweep.py                     # all, sf0.1
    python scripts/timing_sweep.py --start 0 --count 80
    SWEEP_SF_DIR=/root/testdata/sf0.01 python scripts/timing_sweep.py

Round 6's ad-hoc version of this found the OOM/lineage/hoisting bugs
(GR3, GR4, J12b, ML3 — SCALE.md §13); this keeps the tool so later
rounds can re-sweep after structural changes. Each query runs once
with the noop sink (forces every column, no driver collect) and
appends one JSON line {"name", "sec", "err"} to the out file —
append-mode so the sweep is resumable in <600 s slices.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import registry
from test_dataengineer2026_spark.session import get_session

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=10**6)
    ap.add_argument("--out", default="/tmp/timing_sweep.jsonl")
    args = ap.parse_args()

    spark = get_session("sweep", shuffle_partitions=32)
    qs = registry.queries()
    names = list(qs)[args.start : args.start + args.count]
    # Resume skips only CLEAN rows from the SAME sf_dir: an errored
    # query must re-run on resume, and rows measured at a different
    # scale factor must not count as done for this one.
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec.get("sf_dir") == SF_DIR and not rec.get("err"):
                    done.add(rec["name"])
    with open(args.out, "a") as out:
        for name in names:
            if name in done:
                continue
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            err = None
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001 — a sweep must finish
                err = f"{type(e).__name__}: {e}"[:200]
            rec = {
                "name": name,
                "sec": round(time.perf_counter() - t0, 3),
                "err": err,
                "sf_dir": SF_DIR,
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)


if __name__ == "__main__":
    main()
