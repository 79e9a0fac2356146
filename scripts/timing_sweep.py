"""Time every registered query end-to-end at one scale factor.

Usage:
    python scripts/timing_sweep.py                     # all, sf0.1
    python scripts/timing_sweep.py --start 0 --count 80
    python scripts/timing_sweep.py --summary           # dedup + totals
    SWEEP_SF_DIR=/root/testdata/sf0.01 python scripts/timing_sweep.py

Round 6's ad-hoc version of this found the OOM/lineage/hoisting bugs
(GR3, GR4, J12b, ML3 — SCALE.md §13); this keeps the tool so later
rounds can re-sweep after structural changes. Each query runs once
with the noop sink (forces every column, no driver collect) and
appends one JSON line {"name", "sec", "err", "sf_dir"} to the out
file — append-mode so the sweep is resumable in <600 s slices.

Because resume re-runs errored queries, a name can appear more than
once in the file; the LATEST row per name is authoritative everywhere
(the resume skip-set and ``--summary`` both dedupe that way — naive
per-line aggregation over the raw file double-counts retried names).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")


def latest_rows(path: str, sf_dir: str = SF_DIR) -> dict[str, dict]:
    """name -> LATEST row for this sf_dir. Rows written before the
    sf_dir field existed (legacy format) count as this sf_dir — they
    were produced by this same tool's default run and must not force a
    full ~400 s re-sweep on resume."""
    rows: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec.get("sf_dir", sf_dir) == sf_dir:
                    rows[rec["name"]] = rec
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=10**6)
    ap.add_argument("--out", default="/tmp/timing_sweep.jsonl")
    ap.add_argument("--summary", action="store_true")
    args = ap.parse_args()

    if args.summary:
        rows = latest_rows(args.out)
        errs = [r["name"] for r in rows.values() if r.get("err")]
        ordered = sorted(rows.values(), key=lambda r: -r["sec"])
        for r in ordered[:15]:
            print(f"{r['name']:34s} {r['sec']:8.2f}  {r.get('err') or ''}")
        # Clean rows only: time-to-error would inflate the headline
        # total vs a clean sweep (r7 advisor note).
        total = round(
            sum(r["sec"] for r in rows.values() if not r.get("err")), 1
        )
        print(
            f"# {len(rows)} queries, clean total {total} s "
            f"({len(rows) - len(errs)} clean), errors: {errs or 'none'}"
        )
        return

    from test_dataengineer2026_spark import registry  # noqa: PLC0415
    from test_dataengineer2026_spark.session import get_session  # noqa: PLC0415

    spark = get_session("sweep", shuffle_partitions=32)
    qs = registry.queries()
    # Untimed session warmup (round-11 find): without it, the FIRST
    # query of every slice absorbs ~5-7 s of JVM/codegen/Python-worker
    # startup, so the sweep total grows with the slice count — the
    # round-11 4-slice sweep read its four slice heads at a uniform
    # ~8.5-9 s (C10/A16/J12c vs their ~2-3 s steady state) purely from
    # this. Mirrors bench.py's warmup: one relational query, one tiny
    # streaming query (micro-batch engine + state store), the base
    # relations + SQL views, and one Arrow-batched mapInPandas (Python
    # worker pool).
    qs["A1_group_agg"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    qs["M2_tumbling_window"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    from test_dataengineer2026_spark import tables as _tables  # noqa: PLC0415

    for _t in _tables.TABLES:
        _tables.load(spark, SF_DIR, _t)
    _tables.register_views(spark, SF_DIR)
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    names = list(qs)[args.start : args.start + args.count]
    # Resume skips only CLEAN rows from the SAME sf_dir (latest row per
    # name wins): an errored query re-runs on resume, and rows measured
    # at a different scale factor never count as done for this one.
    done = {n for n, r in latest_rows(args.out).items() if not r.get("err")}
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
