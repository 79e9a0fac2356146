"""Round-13 exotic-encoding pins (r12 verdict item #5b, the bonus axis).

Layer 1: the make_encoded_fixtures rewrite (DELTA_BINARY_PACKED ints +
timestamps, DELTA_BYTE_ARRAY strings, dictionary off, data page v2)
must read back value-identical in BOTH engines — Spark's vectorized
delta decoders were on no tested path before this round (every fixture
was DuckDB-COPY PLAIN/dictionary v1 pages).

Layer 2: the BYTE_STREAM_SPLIT contract found while building the axis:
Spark 4.1.2's VECTORIZED reader does not implement BSS and must fail
LOUDLY (SparkUnsupportedOperationException — never silent corruption);
the non-vectorized parquet-mr fallback decodes it exactly, which is
the documented mitigation for lakes that contain BSS-encoded floats.
DuckDB reads BSS natively.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from tests.conftest import SF_DIR

LINEITEM_AGG = """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
       CAST(SUM(CAST(l_orderkey AS DECIMAL(18,6))) AS DOUBLE) AS keys,
       MIN(l_shipdate) AS lo,
       MAX(l_returnflag) AS flag
FROM read_parquet('{path}')
"""


def _spark_lineitem_agg(spark, path):
    from pyspark.sql import functions as F

    r = (
        spark.read.parquet(path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty"),
            F.sum(F.col("l_orderkey").cast("decimal(18,6)"))
            .cast("double")
            .alias("keys"),
            F.min("l_shipdate").alias("lo"),
            F.max("l_returnflag").alias("flag"),
        )
        .collect()[0]
    )
    return (r["n"], r["qty"], r["keys"], str(r["lo"]), r["flag"])


def _duck_lineitem_agg(con, path):
    n, qty, keys, lo, flag = con.execute(LINEITEM_AGG.format(path=path)).fetchone()
    return (n, qty, keys, str(lo), flag)


def test_exotic_encodings_read_parity(spark, tmp_path):
    """DELTA_BINARY_PACKED + DELTA_BYTE_ARRAY + page v2: both engines
    equal each other AND the PLAIN source, exact values."""
    import make_encoded_fixtures as mef

    src = os.path.join(SF_DIR, "lineitem.parquet")
    dst = str(tmp_path / "lineitem.parquet")
    enc = mef.rewrite_table(src, dst)
    assert enc["l_orderkey"] == "DELTA_BINARY_PACKED"
    assert enc["l_returnflag"] == "DELTA_BYTE_ARRAY"
    con = duckdb.connect()
    truth = _duck_lineitem_agg(con, src)
    assert _duck_lineitem_agg(con, dst) == truth
    assert _spark_lineitem_agg(spark, dst) == truth
    # and the exotic encodings are physically present, not silently
    # downgraded (rewrite_table already gates this; re-check one here
    # so the test stands alone)
    md = pq.ParquetFile(dst).metadata
    encs = {
        md.schema.column(i).name: md.row_group(0).column(i).encodings
        for i in range(md.num_columns)
    }
    assert "DELTA_BINARY_PACKED" in encs["l_orderkey"], encs
    assert "DELTA_BYTE_ARRAY" in encs["l_returnflag"], encs


def test_byte_stream_split_contract(spark, tmp_path):
    """BSS floats: loud vectorized failure, exact non-vectorized decode,
    exact DuckDB decode. If a Spark upgrade adds the vectorized decoder,
    the first assertion flips and this pin should be RELAXED to full
    parity (that's an improvement arriving, not a regression)."""
    from pyspark.sql import functions as F

    src = os.path.join(SF_DIR, "lineitem.parquet")
    dst = str(tmp_path / "bss.parquet")
    pq.write_table(
        pq.read_table(src),
        dst,
        use_dictionary=False,
        version="2.6",
        column_encoding={"l_quantity": "BYTE_STREAM_SPLIT"},
    )
    con = duckdb.connect()
    truth = con.execute(
        f"SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) "
        f"FROM read_parquet('{src}')"
    ).fetchone()[0]
    # DuckDB decodes BSS natively
    got_duck = con.execute(
        f"SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) "
        f"FROM read_parquet('{dst}')"
    ).fetchone()[0]
    assert got_duck == truth

    def spark_sum():
        return (
            spark.read.parquet(dst)
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                .cast("double")
                .alias("s")
            )
            .collect()[0]["s"]
        )

    # vectorized: loud, typed failure — never silent wrong values
    assert spark.conf.get("spark.sql.parquet.enableVectorizedReader") == "true"
    with pytest.raises(Exception, match="BYTE_STREAM_SPLIT"):
        spark_sum()
    # non-vectorized fallback: exact decode (the documented mitigation)
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    try:
        assert spark_sum() == truth
    finally:
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
