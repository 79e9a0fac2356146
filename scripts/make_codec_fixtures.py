"""Rewrite a fixture sf_dir as MIXED-COMPRESSION multi-file parquet
directories (round-14 probe axis; the codec sibling of round 13's
encoding axis in make_encoded_fixtures.py).

Usage:
    python scripts/make_codec_fixtures.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.01 -> /tmp/codec_sf001
    # then: for i in 1..8: SF_DIR=<dst> python scripts/driver_replay.py --shard $i/8

Real lakes accumulate files compressed by whatever each writer was
tuned for — snappy defaults, zstd for cold storage, gzip from legacy
ETL, LZ4_RAW from arrow-native writers — and a single table scan must
decode all of them FILE BY FILE. Every registry fixture so far was
single-codec (snappy or DuckDB defaults), so the per-file codec
dispatch in both engines' readers was never on a tested path. This
tool splits every table into row slices and writes slice i with the
i-th codec of:

    zstd, gzip, lz4 (pyarrow -> thrift LZ4_RAW), none, snappy

so every table directory mixes up to 5 codecs (tiny tables get one
file per codec down to 1 row per file — region's 5 rows still cover
all 5).

Codec matrix probed 2026-08 on this environment (Spark 4.1.2 /
DuckDB / pyarrow), pinned in tests/test_encodings.py:
- snappy, gzip, zstd, uncompressed, LZ4_RAW: full write+read parity
  across Spark, DuckDB and pyarrow — these are the interop-safe set
  and the only codecs this fixture uses. One caveat inside the safe
  set, found by this fixture's own first full-registry replay (J6's
  pushed o_totalprice predicate was the only red): parquet-mr's
  DICTIONARY-FILTER row-group pruning cannot decompress some
  pyarrow-written LZ4_RAW dictionary pages (see the inline comment at
  the write call), so LZ4_RAW slices here are dictionary-free.
- Spark's own ``compression=lz4`` writes the LEGACY Hadoop-framed LZ4
  (thrift codec LZ4, ``.lz4hadoop.parquet`` filename): Spark and
  pyarrow decode it, DuckDB rejects the pages — and the failure is
  PARTIAL: ``COUNT(*)`` succeeds from row-group metadata without
  touching a page, so a count-only health check passes on a table a
  real query cannot read. Excluded here; pinned both ways in
  tests/test_encodings.py as the codec analog of BYTE_STREAM_SPLIT.
- brotli: pyarrow writes it, but BOTH Spark (no brotli codec on the
  classpath) and DuckDB (unsupported) fail loudly on page reads —
  not a lake-interop codec in this stack; excluded and pinned.

The pyarrow read->write roundtrip preserves parquet physical types
(proven by the round-13 encoded-fixture replay; the r2 incident that
forced DuckDB COPY in make_multifile_fixtures.py was a SPARK rewrite
changing events.ts's physical type, which pyarrow does not do).

The replay gate after this tool is the usual full-registry oracle
compare: both engines read the SAME mixed-codec directories, so any
per-file codec-dispatch divergence surfaces as a value mismatch.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import tables  # noqa: E402

#: Interop-safe cycle; "lz4" is pyarrow's spelling of thrift LZ4_RAW.
CODECS = ("zstd", "gzip", "lz4", "none", "snappy")
#: What DuckDB's parquet_metadata() reports for each written slice.
EXPECT_THRIFT = {
    "zstd": "ZSTD",
    "gzip": "GZIP",
    "lz4": "LZ4_RAW",
    "none": "UNCOMPRESSED",
    "snappy": "SNAPPY",
}


def rewrite_table(src_path: str, dst_dir: str, con=None) -> list[str]:
    """Split one table across per-codec slice files under ``dst_dir``,
    gating codec metadata and full-table value parity. Returns the
    codecs used (also reusable from tests for a single table)."""
    con = con or duckdb.connect()
    q = lambda p: p.replace("'", "''")  # noqa: E731
    # rmtree, not per-entry os.remove: a leftover SUBDIRECTORY from a
    # prior run (hive partition dir, _temporary) raised IsADirectoryError
    # under the old glob loop (r14 advisor).
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir)
    tbl = pq.read_table(src_path)
    if tbl.num_rows == 0:
        # A zero-row source writes zero slices under the slicing loop,
        # leaving an empty dir whose '*.parquet' glob fails with an
        # unrelated error in gate 2 (r14 advisor). Write ONE empty
        # slice so the directory stays readable and parity-checkable.
        f = os.path.join(dst_dir, f"slice-00-{CODECS[0]}.parquet")
        pq.write_table(tbl, f, compression=CODECS[0])
        return [CODECS[0]]
    n_slices = min(len(CODECS), max(1, tbl.num_rows))
    per = -(-tbl.num_rows // n_slices)  # ceil division
    for i in range(n_slices):
        codec = CODECS[i]
        part = tbl.slice(i * per, per)
        if part.num_rows == 0:
            continue
        f = os.path.join(dst_dir, f"slice-{i:02d}-{codec}.parquet")
        pq.write_table(
            part,
            f,
            compression=None if codec == "none" else codec,
            # LZ4_RAW slices are written WITHOUT dictionary encoding:
            # parquet-mr's dictionary-filter row-group pruning
            # (parquet.filter.dictionary.enabled, on by default) fails
            # decompressing SOME pyarrow-written LZ4_RAW dictionary
            # pages (airlift MalformedInputException "all input must be
            # consumed") for BOTH the vectorized and non-vectorized
            # readers whenever a pushed predicate touches the column —
            # data-dependent (orders slice 2 triggers it; lineitem does
            # not), probed 2026-08 and pinned in tests/test_encodings.py
            # ::test_lz4raw_dictionary_filter_boundary. Plain LZ4_RAW
            # DATA pages decode fine, which is what this slice covers.
            use_dictionary=False if codec == "lz4" else True,
        )
        # gate 1: the slice actually carries the intended codec
        # (dictionary/data pages alike — DISTINCT over all chunks)
        got = {
            r[0]
            for r in con.execute(
                f"SELECT DISTINCT compression FROM parquet_metadata('{q(f)}')"
            ).fetchall()
        }
        if got != {EXPECT_THRIFT[codec]}:
            raise SystemExit(f"{dst_dir} slice {i}: codec {got} != {EXPECT_THRIFT[codec]}")
    # gate 2: full-table value parity vs the source through the
    # mixed-codec directory read (order-insensitive row-hash sum)
    cols = ", ".join(
        c[0]
        for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{q(src_path)}')"
        ).fetchall()
    )
    h0, n0 = con.execute(
        f"SELECT SUM(hash(({cols}))), COUNT(*) FROM read_parquet('{q(src_path)}')"
    ).fetchone()
    h1, n1 = con.execute(
        f"SELECT SUM(hash(({cols}))), COUNT(*) "
        f"FROM read_parquet('{q(dst_dir)}/*.parquet')"
    ).fetchone()
    if (h0, n0) != (h1, n1):
        raise SystemExit(
            f"{dst_dir}: value drift ({n0} rows {h0} != {n1} rows {h1})"
        )
    return sorted(
        os.path.basename(f).split("-")[-1].removesuffix(".parquet")
        for f in glob.glob(os.path.join(dst_dir, "*.parquet"))
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/codec_sf001"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in tables.TABLES:
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        used = rewrite_table(s, d, con)
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')"
        ).fetchone()[0]
        print(f"{t}: {len(used)} files, codecs={used}, {n} rows")
    print(f"DONE: {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
