"""Rewrite a fixture sf_dir with exotic-but-supported parquet column
encodings and data page v2 (round-13 bonus probe axis; r12 verdict
item #5b).

Usage:
    python scripts/make_encoded_fixtures.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.01 -> /tmp/encoded_sf001
    # then: for i in 1..8: SF_DIR=<dst> python scripts/driver_replay.py --shard $i/8

Real lakes accumulate files from writers tuned for size: parquet v2
encodings (DELTA_BINARY_PACKED ints/timestamps, DELTA_BYTE_ARRAY
strings) and v2 data pages. Every registry fixture so far was
DuckDB-COPY PLAIN/dictionary v1 pages, so Spark's vectorized decoders
for the delta encodings were never on any tested path. This tool
rewrites every table with:

    int32/int64/timestamp -> DELTA_BINARY_PACKED
    string                -> DELTA_BYTE_ARRAY
    dictionary OFF, data page v2, format version 2.6

Nested/list columns (embeddings.embedding) keep default encodings —
pyarrow's column_encoding addresses top-level primitive paths.

BYTE_STREAM_SPLIT is deliberately EXCLUDED from the replayable
fixture: probed 2026-08 on Spark 4.1.2, the VECTORIZED parquet reader
raises SparkUnsupportedOperationException("Unsupported encoding:
BYTE_STREAM_SPLIT") for both v1 and v2 data pages — a loud fail, not
silent corruption — while the non-vectorized parquet-mr fallback
(spark.sql.parquet.enableVectorizedReader=false) decodes it exactly
(sum parity to the decimal digit) and DuckDB reads it natively. The
contract and the mitigation are pinned in tests/test_encodings.py; a
lake with BSS-encoded floats needs the non-vectorized reader (or a
rewrite) until Spark grows the decoder.

The replay gate after this tool is the usual full-registry oracle
compare: both engines read the SAME encoded files, so any decoder
divergence surfaces as a value mismatch.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import tables  # noqa: E402

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/encoded_sf001"


def encoding_plan(schema: pa.Schema) -> dict[str, str]:
    """Per-column exotic encoding for the top-level primitive columns."""
    enc: dict[str, str] = {}
    for f in schema:
        if pa.types.is_integer(f.type) or pa.types.is_timestamp(f.type):
            enc[f.name] = "DELTA_BINARY_PACKED"
        elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            enc[f.name] = "DELTA_BYTE_ARRAY"
        # floats stay PLAIN (see module docstring: BYTE_STREAM_SPLIT is
        # unreadable by Spark 4.1's vectorized reader); nested stay default
    return enc


def rewrite_table(src_path: str, dst_path: str) -> dict[str, str]:
    t = pq.read_table(src_path)
    enc = encoding_plan(t.schema)
    pq.write_table(
        t,
        dst_path,
        use_dictionary=False,
        column_encoding=enc or None,
        data_page_version="2.0",
        version="2.6",
    )
    # Verification gate (raise, not assert): the rewrite must be
    # value-lossless and the exotic encodings must actually be present.
    back = pq.read_table(dst_path)
    if not back.equals(t):
        raise RuntimeError(f"lossy rewrite for {src_path}")
    md = pq.ParquetFile(dst_path).metadata
    col_encodings = {
        md.schema.column(i).name: md.row_group(0).column(i).encodings
        for i in range(md.num_columns)
    }
    for name, want in enc.items():
        got = col_encodings.get(name, ())
        if want not in got:
            raise RuntimeError(
                f"{dst_path}: column {name} wanted {want}, wrote {got}"
            )
    return enc


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    for t in tables.TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(DST, f"{t}.parquet")
        enc = rewrite_table(src, dst)
        print(f"{t}: rewrote with {sorted(set(enc.values())) or ['defaults']}, page v2")
    print(f"DONE: {DST}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
