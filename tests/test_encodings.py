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


def test_codec_matrix_cross_engine(spark, tmp_path):
    """Round-14 codec axis, layer 1: the interop-safe codec set. Each
    of snappy / gzip / zstd / LZ4_RAW / uncompressed must (a) land
    physically (thrift codec id via DuckDB parquet_metadata — pyarrow's
    own printer calls LZ4_RAW "LZ4", so the id check goes through the
    engine that names them unambiguously) and (b) decode to the exact
    PLAIN-source values in BOTH engines. These five are the only codecs
    make_codec_fixtures.py uses; the two non-interop codecs in this
    stack get their own boundary pins below."""
    import make_codec_fixtures as mcf

    src = os.path.join(SF_DIR, "lineitem.parquet")
    con = duckdb.connect()
    truth = _duck_lineitem_agg(con, src)
    t = pq.read_table(src)
    for codec in mcf.CODECS:
        dst = str(tmp_path / f"lineitem_{codec}.parquet")
        pq.write_table(
            t, dst, compression=None if codec == "none" else codec
        )
        got = {
            r[0]
            for r in con.execute(
                f"SELECT DISTINCT compression FROM parquet_metadata('{dst}')"
            ).fetchall()
        }
        assert got == {mcf.EXPECT_THRIFT[codec]}, (codec, got)
        assert _duck_lineitem_agg(con, dst) == truth, codec
        assert _spark_lineitem_agg(spark, dst) == truth, codec


def test_mixed_codec_directory_scan(spark, tmp_path):
    """Round-14 codec axis, layer 2: ONE directory mixing all five
    codecs file-by-file (the make_codec_fixtures layout) must scan to
    the exact source values in both engines — per-FILE codec dispatch,
    the thing a single-codec fixture can never exercise. At 100 TB a
    table accumulates files from differently-tuned writers; a reader
    that latches the first file's codec corrupts silently."""
    import make_codec_fixtures as mcf

    src = os.path.join(SF_DIR, "lineitem.parquet")
    d = str(tmp_path / "lineitem.parquet")
    con = duckdb.connect()
    used = mcf.rewrite_table(src, d, con)
    assert used == sorted(mcf.CODECS), used
    truth = _duck_lineitem_agg(con, src)
    assert _duck_lineitem_agg(con, f"{d}/*.parquet") == truth
    assert _spark_lineitem_agg(spark, d) == truth


def test_spark_lz4hadoop_duckdb_boundary(spark, tmp_path):
    """Round-14 codec axis, boundary pin #1 (the codec analog of the
    BYTE_STREAM_SPLIT contract): Spark's ``compression=lz4`` writes the
    LEGACY Hadoop-framed LZ4 (thrift codec LZ4, not LZ4_RAW — probed
    2026-08 on Spark 4.1.2). Spark and pyarrow decode it exactly;
    DuckDB rejects the PAGES — but ``COUNT(*)`` still succeeds because
    it is answered from row-group metadata without touching a page, so
    a count-only health check passes on a table real queries cannot
    read. All three behaviors pinned; if a DuckDB upgrade adds the
    legacy-LZ4 decoder the SUM assertion flips and this pin should be
    RELAXED to full parity. Interop lakes must write lz4 via LZ4_RAW
    (pyarrow spelling: "lz4") or use zstd."""
    from pyspark.sql import functions as F

    src = os.path.join(SF_DIR, "lineitem.parquet")
    d = str(tmp_path / "lz4hadoop")
    spark.read.parquet(src).coalesce(1).write.option(
        "compression", "lz4"
    ).parquet(d)
    import glob as _glob

    f = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
    # Spark names the legacy variant explicitly in the file suffix
    assert ".lz4hadoop.parquet" in f, f
    con = duckdb.connect()
    got_codec = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT compression FROM parquet_metadata('{f}')"
        ).fetchall()
    }
    assert got_codec == {"LZ4"}, got_codec  # legacy id, NOT LZ4_RAW
    truth = _duck_lineitem_agg(con, src)
    # Spark decodes its own output exactly
    assert _spark_lineitem_agg(spark, f) == truth
    # pyarrow decodes it exactly too
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(f)
    assert t.num_rows == truth[0]
    assert float(
        pc.sum(t["l_quantity"].cast(pa.decimal128(18, 6))).as_py()
    ) == truth[1]
    # DuckDB: metadata-only COUNT(*) SUCCEEDS (the trap)...
    assert con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{f}')"
    ).fetchone() == (truth[0],)
    # ...but any page-touching read fails loudly with the codec name
    with pytest.raises(duckdb.Error, match='codec "LZ4"'):
        con.execute(
            f"SELECT SUM(l_quantity) FROM read_parquet('{f}')"
        ).fetchone()


def test_brotli_not_in_stack(spark, tmp_path):
    """Round-14 codec axis, boundary pin #2: pyarrow writes BROTLI but
    NEITHER engine in this stack decodes it — Spark has no brotli codec
    on the classpath (FAILED_READ_FILE, a loud fail) and DuckDB rejects
    it by name. Brotli parquet is therefore not a lake-interop codec
    here; make_codec_fixtures.py excludes it. If either engine grows
    the decoder its half of this pin should be RELAXED to parity."""
    from pyspark.sql import functions as F

    src = os.path.join(SF_DIR, "nation.parquet")
    dst = str(tmp_path / "nation_brotli.parquet")
    pq.write_table(pq.read_table(src), dst, compression="brotli")
    con = duckdb.connect()
    got_codec = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT compression FROM parquet_metadata('{dst}')"
        ).fetchall()
    }
    assert got_codec == {"BROTLI"}, got_codec
    with pytest.raises(duckdb.Error, match="BROTLI"):
        con.execute(
            f"SELECT SUM(n_nationkey) FROM read_parquet('{dst}')"
        ).fetchone()
    with pytest.raises(Exception, match="FAILED_READ_FILE"):
        spark.read.parquet(dst).agg(
            F.sum("n_nationkey").alias("s")
        ).collect()


def test_lz4raw_dictionary_filter_boundary(tmp_path):
    """Round-14 codec axis, boundary pin #3 — found by this axis's own
    first full-registry replay (J6 was the single red): parquet-mr's
    DICTIONARY-FILTER row-group pruning (parquet.filter.dictionary.
    enabled, ON by default) cannot decompress SOME pyarrow-written
    LZ4_RAW dictionary pages — airlift MalformedInputException "all
    input must be consumed" — for BOTH the vectorized and
    non-vectorized readers, whenever a pushed predicate touches the
    column. Data-dependent: orders rows 6000-8999 trigger it, whole
    lineitem does not. DuckDB decodes the same file fine, and Spark
    reads it fine UNFILTERED (the data-page path is correct), so the
    failure mode is "this table works until someone adds a WHERE
    clause". Pinned: (1) the default-config filtered read fails LOUDLY
    (FAILED_READ_FILE — never silent wrong values); (2) the documented
    mitigation parquet.filter.dictionary.enabled=false decodes
    exactly; (3) a dictionary-FREE LZ4_RAW file (what
    make_codec_fixtures.py writes) is exact under the default config.

    The repro runs in a SUBPROCESS with a cold JVM: parquet-mr's
    decompressor pool makes the failure warmth-sensitive (a prior
    successful LZ4_RAW decompression in the same JVM can mask it), so
    an in-suite shared-session assertion would be order-dependent.
    If a parquet-mr upgrade fixes the dictionary reader, the
    subprocess starts printing DICT_READ_OK and assertion (1) flips —
    RELAX this pin to full parity then."""
    import subprocess
    import sys as _sys

    from tests.conftest import SF_DIR_MID

    src = os.path.join(SF_DIR_MID, "orders.parquet")
    t = pq.read_table(src).slice(6000, 3000)
    f_dict = str(tmp_path / "orders_lz4_dict.parquet")
    f_nodict = str(tmp_path / "orders_lz4_nodict.parquet")
    pq.write_table(t, f_dict, compression="lz4", use_dictionary=True)
    pq.write_table(t, f_nodict, compression="lz4", use_dictionary=False)

    con = duckdb.connect()
    truth = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{f_dict}') "
        f"WHERE o_totalprice > 300000.0"
    ).fetchone()[0]
    assert truth > 0  # the predicate's row-producing path is real
    # DuckDB also decodes the dictionary variant's pages exactly
    assert (
        con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{f_nodict}') "
            f"WHERE o_totalprice > 300000.0"
        ).fetchone()[0]
        == truth
    )

    probe = tmp_path / "probe.py"
    probe.write_text(
        f"""
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
read = lambda p: (spark.read.parquet(p)
                  .filter(F.col("o_totalprice") > 300000.0).count())
try:
    n = read({f_dict!r})
    print("DICT_READ_OK", n)
except Exception as e:
    loud = "FAILED_READ_FILE" in str(e)
    print("DICT_READ_FAIL", "LOUD" if loud else "QUIET")
spark.sparkContext._jsc.hadoopConfiguration().set(
    "parquet.filter.dictionary.enabled", "false")
print("MITIGATED", read({f_dict!r}))
print("NODICT", read({f_nodict!r}))
"""
    )
    out = subprocess.run(
        [_sys.executable, str(probe)],
        capture_output=True,
        text=True,
        timeout=300,
    ).stdout
    # (1) loud failure, not silent wrong values
    assert "DICT_READ_FAIL LOUD" in out, out
    # (2) the dictionary-filter kill switch restores exact reads
    assert f"MITIGATED {truth}" in out, (truth, out)
    # (3) dictionary-free LZ4_RAW needs no mitigation
    assert f"NODICT {truth}" in out, (truth, out)


def test_delta_encoding_zstd_codec_composition(spark, tmp_path):
    """Encodings and codecs COMPOSE (a page is encoded, then the page
    buffer is compressed): the r13 encoding axis ran on snappy pages
    and the r14 codec axis on PLAIN/dictionary encodings, so the
    cross term — DELTA_BINARY_PACKED + DELTA_BYTE_ARRAY under zstd v2
    pages — was on neither tested path. Both engines must decode the
    composition to the exact PLAIN-source values."""
    src = os.path.join(SF_DIR, "lineitem.parquet")
    dst = str(tmp_path / "delta_zstd.parquet")
    pq.write_table(
        pq.read_table(src),
        dst,
        use_dictionary=False,
        version="2.6",
        data_page_version="2.0",
        compression="zstd",
        column_encoding={
            "l_orderkey": "DELTA_BINARY_PACKED",
            "l_returnflag": "DELTA_BYTE_ARRAY",
        },
    )
    con = duckdb.connect()
    got_codec = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT compression FROM parquet_metadata('{dst}')"
        ).fetchall()
    }
    assert got_codec == {"ZSTD"}, got_codec
    md = pq.ParquetFile(dst).metadata
    encs = {
        md.schema.column(i).name: md.row_group(0).column(i).encodings
        for i in range(md.num_columns)
    }
    assert "DELTA_BINARY_PACKED" in encs["l_orderkey"], encs
    assert "DELTA_BYTE_ARRAY" in encs["l_returnflag"], encs
    truth = _duck_lineitem_agg(con, src)
    assert _duck_lineitem_agg(con, dst) == truth
    assert _spark_lineitem_agg(spark, dst) == truth


def test_spark_v2_writer_cross_engine(spark, tmp_path):
    """Spark's OWN parquet v2 writer (write option
    parquet.writer.version=PARQUET_2_0) — every other Spark write in
    this repo uses the v1 default, and the r13 encoding axis covered
    only PYARROW-written v2 pages, so Spark-as-v2-producer was on
    neither tested path. The option must actually engage (encoding set
    flips from v1's PLAIN_DICTIONARY/RLE/BIT_PACKED to v2's
    RLE_DICTIONARY with PLAIN fallback) and the output must decode
    exactly in both engines."""
    import glob as _glob

    src = os.path.join(SF_DIR, "lineitem.parquet")
    df = spark.read.parquet(src)
    out_v1 = str(tmp_path / "v1")
    out_v2 = str(tmp_path / "v2")
    df.coalesce(1).write.parquet(out_v1)
    df.coalesce(1).write.option(
        "parquet.writer.version", "PARQUET_2_0"
    ).parquet(out_v2)

    def encs(d):
        f = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
        md = pq.ParquetFile(f).metadata
        return f, set(md.row_group(0).column(0).encodings)

    f1, e1 = encs(out_v1)
    f2, e2 = encs(out_v2)
    assert "PLAIN_DICTIONARY" in e1, e1  # v1 spelling
    assert "RLE_DICTIONARY" in e2 and "PLAIN_DICTIONARY" not in e2, e2
    con = duckdb.connect()
    truth = _duck_lineitem_agg(con, src)
    assert _duck_lineitem_agg(con, f2) == truth
    assert _spark_lineitem_agg(spark, f2) == truth
