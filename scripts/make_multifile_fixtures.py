"""Rewrite a fixture sf_dir as multi-file parquet directories.

Usage:
    python scripts/make_multifile_fixtures.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.01 -> /tmp/mf_sf001

Every real-scale table is a DIRECTORY of part files, but the driver's
fixtures are single files — so layout bugs (like the round-11
stage_events_dir find, where the file stream source listed no leaf
files under a symlinked directory and every streaming query died with
UNABLE_TO_INFER_SCHEMA) are invisible to the standard replay. This
tool builds the multi-file variant via DuckDB COPY so parquet PHYSICAL
types stay byte-identical to the source (a Spark rewrite changes
events.ts's timestamp physical type — SCALE.md §18), then the probe is:

    python scripts/make_multifile_fixtures.py
    for i in 1..8: SF_DIR=/tmp/mf_sf001 python scripts/driver_replay.py --shard $i/8

driver_replay reads directory fixtures transparently (its DuckDB views
glob when the table path is a directory).
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import tables

#: Per-table split tuning: (FILE_SIZE_BYTES, ROW_GROUP_SIZE). Row groups
#: must be smaller than the table or DuckDB writes one file regardless
#: of the size cap (a file only rotates on a row-group boundary).
_SPLIT = {
    "lineitem": ("24kb", 2048),
    "orders": ("24kb", 2048),
    "events": ("24kb", 2048),
    "customer": ("6kb", 128),
    "part": ("6kb", 128),
    "documents": ("6kb", 128),
    "embeddings": ("6kb", 128),
    # region/nation/supplier are too small to split meaningfully; they
    # still move into directory layout (1 part file) so every table
    # exercises the directory read path.
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mf_sf001"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    q = lambda p: p.replace("'", "''")  # noqa: E731
    for t in tables.TABLES:
        d = os.path.join(dst, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        for f in glob.glob(os.path.join(d, "*")):
            os.remove(f)
        size, rg = _SPLIT.get(t, ("512kb", 65536))
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{q(src)}/{t}.parquet')) "
            f"TO '{q(d)}' (FORMAT PARQUET, PER_THREAD_OUTPUT TRUE, "
            f"FILE_SIZE_BYTES '{size}', ROW_GROUP_SIZE {rg})"
        )
        n_files = len(glob.glob(os.path.join(d, "*.parquet")))
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{q(d)}/*.parquet')"
        ).fetchone()[0]
        n0 = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{q(src)}/{t}.parquet')"
        ).fetchone()[0]
        # verification gate: raise, not assert (python -O strips asserts)
        if n != n0:
            raise SystemExit(f"{t}: row loss in split copy ({n} != {n0})")
        print(f"{t}: {n_files} files, {n} rows")
    print(f"DONE: {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
