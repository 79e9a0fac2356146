"""Rewrite a fixture sf_dir with Hive-partitioned table layouts.

Usage:
    python scripts/make_hive_fixtures.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.01 -> /tmp/hive_sf001

Round-12 robustness probe (r11 verdict item #6a): every 100 TB lake
table is Hive-partitioned — `table/key=value/part-*.parquet` with the
partition column ABSENT from the data files and reconstructed from the
directory names at read time. The driver's single-file fixtures never
exercise that reconstruction (or partition pruning over it), so this
tool rewrites five tables with natural low-cardinality string columns
as Hive datasets and leaves the rest byte-identical:

    events    PARTITION BY event_type                  (5 values)
    documents PARTITION BY lang, source                (5 x 20, TWO levels)
    orders    PARTITION BY o_orderstatus               (3 values)
    customer  PARTITION BY c_mktsegment                (5 values)
    lineitem  PARTITION BY l_returnflag, l_linestatus  (TWO levels)

documents and lineitem are MULTI-LEVEL (r13 verdict item #2): real
lakes nest partitions (region/date, type/day), reconstruction must
recover BOTH columns from path segments in order, and the registry had
only been glob-probed — never fully replayed — against that shape.

Partition values must be free of characters the Hive convention
URL-escapes: pyarrow writes `o_orderpriority=4-NOT%20SPECIFIED` for a
value with a space, Spark DECODES the escape at read but DuckDB's
read_parquet does NOT — found live when this tool first partitioned
orders by o_orderpriority and the value-parity gate below caught the
'%20' corruption in the oracle view. Hence o_orderstatus (F/O/P) for
orders, and the gate stays as the tripwire for any future column
choice.

The writer is pyarrow.dataset.write_dataset — deliberately a FOREIGN
writer (item #6b): neither DuckDB (the fixture generator) nor Spark,
so footer/encoding quirks of a third engine ride along for free.
pyarrow excludes partition columns from the files (the real Hive
shape; DuckDB 1.x's COPY PARTITION_BY writes them INTO the files,
which is exactly the ambiguity a lake layout avoids). Timestamps are
physically TIMESTAMP(MICROS) in the source and pyarrow round-trips
them unchanged (verified in the gate below). String partition values
only — both Spark and DuckDB reconstruct those as plain strings, so no
partition-type-inference divergence enters the probe.

Probe:
    python scripts/make_hive_fixtures.py
    for i in 1..8: SF_DIR=/tmp/hive_sf001 python scripts/driver_replay.py --shard $i/8

driver_replay detects the key=value layout and builds its DuckDB views
with hive_partitioning=true; Spark discovers the partitions natively.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import tables

#: table -> (partition columns, max rows per data file). The row cap
#: gives the big tables SEVERAL files per partition directory (the
#: realistic shape: a partition is a directory of parts, not one file);
#: 0 = single file per partition (small dims). documents and lineitem
#: are MULTI-LEVEL (r13 verdict item #2: the shared view helper's
#: ``**/*.parquet`` glob and DuckDB's zero-or-more-segment semantics
#: were probed in isolation in r12/r13, but no full-registry replay had
#: run against a two-level ``table/k1=a/k2=b/part-*.parquet`` layout —
#: the shape of every date-partitioned production lake). Partition
#: values stay URL-escape-free strings (the r12 %20 finding).
_HIVE = {
    "events": (("event_type",), 1024),
    "documents": (("lang", "source"), 64),
    "orders": (("o_orderstatus",), 4096),
    "customer": (("c_mktsegment",), 0),
    "lineitem": (("l_returnflag", "l_linestatus"), 8192),
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hive_sf001"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    q = lambda p: p.replace("'", "''")  # noqa: E731
    for t in tables.TABLES:
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        if t not in _HIVE:
            # byte-identical copy: the probe isolates the Hive layout,
            # not a re-encode of every table
            if os.path.isdir(d):
                shutil.rmtree(d)
            shutil.copyfile(s, d)
            continue
        cols_part, max_rows = _HIVE[t]
        if os.path.isdir(d):
            shutil.rmtree(d)
        elif os.path.exists(d):
            os.remove(d)
        tbl = pq.read_table(s)
        kwargs = {}
        if max_rows:
            kwargs = {
                "max_rows_per_file": max_rows,
                "max_rows_per_group": max_rows,
            }
        pa_ds.write_dataset(
            tbl,
            d,
            format="parquet",
            partitioning=pa_ds.partitioning(
                tbl.schema.empty_table().select(list(cols_part)).schema,
                flavor="hive",
            ),
            basename_template="part-{i}.parquet",
            **kwargs,
        )
        # --- verification gates: raise, not assert (python -O) ---
        # leaf files sit exactly len(cols_part) key=value levels down;
        # verify BOTH that they exist there and that no leaf landed at
        # the wrong depth (a mixed-depth layout fails loudly in DuckDB)
        depth_glob = os.path.join(d, *(["*"] * len(cols_part)), "*.parquet")
        leaf = glob.glob(depth_glob)
        if not leaf:
            raise SystemExit(f"{t}: no hive leaf files written under {d}")
        all_leaves = glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        if sorted(all_leaves) != sorted(leaf):
            raise SystemExit(
                f"{t}: leaf files at mixed partition depths under {d}"
            )
        # every directory level carries its key= prefix in order
        rel = os.path.relpath(leaf[0], d).split(os.sep)[:-1]
        if [seg.split("=")[0] for seg in rel] != list(cols_part):
            raise SystemExit(f"{t}: partition dir order drift: {rel}")
        leaf_cols = [f.name for f in pq.ParquetFile(leaf[0]).schema_arrow]
        for col in cols_part:
            if col in leaf_cols:
                raise SystemExit(
                    f"{t}: partition column {col!r} leaked into data files — "
                    "the probe must exercise RECONSTRUCTION, not a stored copy"
                )
        src_ts = [
            (f.name, str(f.type))
            for f in pq.ParquetFile(s).schema_arrow
            if "timestamp" in str(f.type)
        ]
        dst_ts = [
            (f.name, str(f.type))
            for f in pq.ParquetFile(leaf[0]).schema_arrow
            if "timestamp" in str(f.type)
        ]
        if src_ts != dst_ts:
            raise SystemExit(f"{t}: timestamp type drift {src_ts} -> {dst_ts}")
        # full-table value parity vs the source, partition col included
        # (order-insensitive: both sides hashed row-wise then summed)
        cols = ", ".join(
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{q(s)}')"
            ).fetchall()
        )
        h0, n0 = con.execute(
            f"SELECT SUM(hash(({cols}))), COUNT(*) "
            f"FROM read_parquet('{q(s)}')"
        ).fetchone()
        h1, n1 = con.execute(
            f"SELECT SUM(hash(({cols}))), COUNT(*) FROM read_parquet("
            f"'{q(d)}/**/*.parquet', hive_partitioning = true)"
        ).fetchone()
        if (h0, n0) != (h1, n1):
            raise SystemExit(f"{t}: value drift ({n0} rows {h0} != {n1} rows {h1})")
        parts = len(
            {os.path.dirname(os.path.relpath(f, d)) for f in leaf}
        )
        print(
            f"{t}: {parts} leaf partitions ({'/'.join(cols_part)}), "
            f"{len(leaf)} files, {n1} rows"
        )
    print(f"DONE: {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
