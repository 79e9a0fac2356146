"""Rewrite a testdata sf directory with parquet BLOOM FILTERS on the
point-lookup/join key columns, gating bloom presence and full-table
value parity — the r15 physical-layout axis (VERDICT.md r14 "Next
round" #3).

Why this axis exists: a 100 TB lake's files carry whatever auxiliary
structures its writers emit. Row-group bloom filters (parquet-mr,
written by Spark via ``parquet.bloom.filter.enabled#<col>``) let a
point predicate skip row groups whose min/max straddle the probe value
— the case stats pruning cannot touch (e.g. a uuid/hash key uniformly
spread across every row group). No fixture in this repo had ever
carried one, so both engines' read paths were unexercised on
bloom-bearing files — the same shape of gap the r14 codec axis found a
real parquet-mr LZ4_RAW bug in. Note the engine split: Spark/parquet-mr
both writes and PRUNES with blooms (``parquet.filter.bloom.enabled``,
default true); DuckDB 1.0.0 predates bloom read support (added in
1.2), so for the oracle the filters are extra footer payload it must
skip cleanly — which is exactly what parity proves.

Usage:
    python scripts/make_bloom_fixtures.py [src_sf_dir] [dst_dir]
    # default: /root/testdata/sf0.01 -> /tmp/bloom_sf001
then:
    SF_DIR=/tmp/bloom_sf001 python scripts/driver_replay.py --shard i/N

Gates per table:
  1. bloom presence — parquet-mr's own footer reader
     (ParquetFileReader.getFooter, public API, via the Spark JVM)
     reports a non-negative bloom offset for every (row group, column)
     chunk of every requested column whose own encodings include PLAIN
     (fully-dictionary chunks legitimately carry none);
  2. value parity — DuckDB order-insensitive row-hash sum over the
     rewritten directory equals the source (proving the rewrite, and a
     reader skipping the bloom payload, lose nothing).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import tables  # noqa: E402

#: Columns that get a bloom filter, per table: the equi-join /
#: point-lookup keys a 100 TB query would probe with. NDV hint sized
#: generously (over-sizing costs bytes, under-sizing costs false
#: positives — fpp rises, pruning weakens, correctness unaffected).
BLOOM_COLS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def bloom_offsets(spark, file_path: str) -> dict[tuple[int, str], int]:
    """(row_group_index, column name) -> bloom filter offset for
    ``file_path``, via parquet-mr's public footer API. Per-chunk, never
    merged: gate 1 decides bloom-required per (row group, column) chunk
    against that chunk's OWN encodings (r16 review finding — a file
    where one row group stays dictionary-only with no bloom while
    another falls back to PLAIN with its bloom is legitimate, and the
    old per-file merge falsely rejected it)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hp = jvm.org.apache.hadoop.fs.Path(file_path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        out: dict[tuple[int, str], int] = {}
        blocks = reader.getFooter().getBlocks()
        for bi in range(blocks.size()):
            cols = blocks.get(bi).getColumns()
            for i in range(cols.size()):
                c = cols.get(i)
                out[(bi, c.getPath().toDotString())] = c.getBloomFilterOffset()
        return out
    finally:
        reader.close()


def rewrite_table(spark, src_path: str, dst_dir: str, con=None) -> list[str]:
    """Spark-rewrite one table into ``dst_dir`` with bloom filters on
    its BLOOM_COLS, gating presence + parity. Returns the bloom'd
    columns (reusable from tests for a single table)."""
    con = con or duckdb.connect()
    q = lambda p: p.replace("'", "''")  # noqa: E731
    shutil.rmtree(dst_dir, ignore_errors=True)
    table = os.path.basename(dst_dir).removesuffix(".parquet")
    cols = BLOOM_COLS.get(table, ())
    df = spark.read.parquet(src_path)
    # a misspelled/renamed BLOOM_COLS entry must fail HERE, loudly:
    # Spark silently ignores bloom options for nonexistent columns and
    # gate 1's metadata lookups return empty for them, so without this
    # check the axis would certify a bloom that was never written
    # (r15 review finding).
    absent = [c for c in cols if c not in df.columns]
    if absent:
        raise SystemExit(f"{table}: BLOOM_COLS not in schema: {absent}")
    n_rows = df.count()  # one job, reused for every column's NDV hint
    w = df.write.mode("overwrite")
    for c in cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        # NDV hint: parquet-mr sizes the block from this (default 1M is
        # wasteful for small tables); distinct-count upper bound = rows.
        w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(n_rows))
    w.parquet(dst_dir)

    # gate 1: every (row group, column) CHUNK of every data file
    # carries a bloom on every requested column — EXCEPT
    # fully-dictionary-encoded chunks, where parquet-mr deliberately
    # omits the bloom because the dictionary page already gives exact
    # row-group pruning (its documented write-side contract; observed:
    # low-cardinality keys like orders.o_custkey at small SF stay
    # dictionary-only and get no bloom). The decision is per CHUNK
    # against that chunk's own encodings: a file may legitimately mix a
    # dictionary-only row group (no bloom) with a PLAIN-fallback row
    # group (bloom present), and neither side may vouch for the other.
    for f in sorted(glob.glob(os.path.join(dst_dir, "part-*.parquet"))):
        offs = bloom_offsets(spark, f)
        if not offs:
            continue  # zero-row part file: no row groups, nothing to pin
        missing = []
        for c in cols:
            for rg, encs in con.execute(
                "SELECT row_group_id, encodings FROM parquet_metadata(?) "
                "WHERE path_in_schema = ?",
                [f, c],
            ).fetchall():
                if offs.get((rg, c), -1) >= 0:
                    continue
                tokens = {t.strip() for t in encs.split(",")}
                if "PLAIN" in tokens:
                    # this chunk has non-dict data pages AND no bloom
                    missing.append((rg, c))
        if missing:
            raise SystemExit(f"{f}: no bloom filter on chunks {missing} ({offs})")

    # gate 2: full-table value parity through the bloom-bearing layout
    cols_sql = ", ".join(
        c[0]
        for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{q(src_path)}')"
        ).fetchall()
    )
    h0, n0 = con.execute(
        f"SELECT SUM(hash(({cols_sql}))), COUNT(*) "
        f"FROM read_parquet('{q(src_path)}')"
    ).fetchone()
    h1, n1 = con.execute(
        f"SELECT SUM(hash(({cols_sql}))), COUNT(*) "
        f"FROM read_parquet('{q(dst_dir)}/*.parquet')"
    ).fetchone()
    if (h0, n0) != (h1, n1):
        raise SystemExit(
            f"{dst_dir}: value drift ({n0} rows {h0} != {n1} rows {h1})"
        )
    return list(cols)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bloom_sf001"
    from test_dataengineer2026_spark.session import get_session

    spark = get_session()
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in tables.TABLES:
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        used = rewrite_table(spark, s, d, con)
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')"
        ).fetchone()[0]
        print(f"{t}: bloom on {used or '—'}, {n} rows")
    print(f"DONE: {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
