"""Parquet bloom-filter axis (r15): Spark/parquet-mr writes row-group
bloom filters; these tests pin (1) the filters are actually present in
the footer, (2) they are FUNCTIONAL (membership answers the way a
bloom must: no false negatives, near-all-negative for absent probes),
(3) point lookups over bloom-bearing files stay exact in BOTH engines
— DuckDB 1.0.0 predates bloom READ support (added in 1.2), so for the
oracle the filters are opaque footer payload it must skip cleanly, and
(4) the prune-vs-false-positive contract: pruning may keep extra row
groups (false positives), never drop matching ones.

The fixture writer lives in scripts/make_bloom_fixtures.py; the
full-registry replay against a bloom-bearing sf0.01 layout is recorded
in SCALE.md.
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from make_bloom_fixtures import BLOOM_COLS, bloom_offsets, rewrite_table  # noqa: E402


def _col_offs(offs: dict, name: str) -> list[int]:
    """Per-chunk bloom offsets for one column, over a per-(row group,
    column) map — bloom_offsets stopped merging across row groups in
    r16 (the merge falsely rejected legitimate mixed files)."""
    return [v for (_rg, c), v in offs.items() if c == name]


#: Keys sit above 2^31 so every py4j probe crosses as a Java LONG —
#: a small Python int maps to Java int and parquet-mr's hash(int)
#: overload, which hashes differently than the INT64 column's
#: hash(long) (observed: findHash(hash(0)) == False on a bloom that
#: definitely contains 0L).
KEY_BASE = 2**32


def _write_sparse_keys(spark, path: str, n: int = 4000) -> None:
    """A table whose key k is EVEN offsets only (KEY_BASE + 2i), spread
    uniformly over several small row groups: every row group's
    [min,max] straddles any odd probe, so stats pruning can never skip
    — only a bloom can. That separation is the whole point of the
    axis. Dictionary encoding is disabled for k: 4000 distinct values
    would otherwise stay fully dictionary-encoded and parquet-mr then
    deliberately writes NO bloom (the dictionary already prunes
    exactly) — the bloom path only engages once data pages go PLAIN,
    as a real high-cardinality key's do."""
    df = (
        spark.range(n)
        .selectExpr(f"{KEY_BASE} + id * 2 AS k", "CAST(id AS STRING) AS payload")
        .repartition(1)
    )
    (
        df.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", str(n))
        .option("parquet.enable.dictionary#k", "false")
        .option("parquet.block.size", str(16 * 1024))  # several row groups
        .parquet(path)
    )


def test_bloom_written_and_functional(spark, tmp_path):
    """Presence + functional membership via parquet-mr's own public
    bloom reader: every present key hits (a bloom has NO false
    negatives — a miss here is data loss at prune time), absent probes
    are nearly all misses (a degenerate all-hits bloom would mean the
    writer produced a useless filter and pruning silently died)."""
    path = str(tmp_path / "sparse.parquet")
    _write_sparse_keys(spark, path)
    f = sorted(glob.glob(os.path.join(path, "part-*.parquet")))[0]
    offs = bloom_offsets(spark, f)
    k_offs = _col_offs(offs, "k")
    assert k_offs and all(v >= 0 for v in k_offs), f"no bloom on k: {offs}"

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hp = jvm.org.apache.hadoop.fs.Path(f)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        blocks = reader.getFooter().getBlocks()
        assert blocks.size() >= 2, "fixture must span several row groups"
        # per row group: its own keys all hit; absent odd probes mostly miss
        total_absent_hits = total_absent = 0
        for bi in range(blocks.size()):
            block = blocks.get(bi)
            cols = block.getColumns()
            kcol = next(
                cols.get(i)
                for i in range(cols.size())
                if cols.get(i).getPath().toDotString() == "k"
            )
            bf = reader.getBloomFilterDataReader(block).readBloomFilter(kcol)
            assert bf is not None
            lo = kcol.getStatistics().genericGetMin()
            hi = kcol.getStatistics().genericGetMax()
            for probe in range(int(lo), int(hi) + 1, max(2, (int(hi) - int(lo)) // 40)):
                even = probe - (probe % 2)
                assert bf.findHash(bf.hash(even)), f"false NEGATIVE for {even}"
                odd = even + 1
                total_absent += 1
                total_absent_hits += bool(bf.findHash(bf.hash(odd)))
        # fpp was sized from exact NDV: a handful of false positives is
        # the design; all-positive means the filter is degenerate.
        assert total_absent_hits < total_absent / 2, (
            f"{total_absent_hits}/{total_absent} absent probes hit — "
            "bloom is degenerate, pruning would never skip"
        )
    finally:
        reader.close()


def test_bloom_point_lookup_exact_both_engines(spark, tmp_path):
    """The prune-vs-false-positive CONTRACT on the reader path: with
    blooms present, a present-key point lookup returns exactly its
    rows, an absent-but-in-range key returns zero rows — in Spark
    (which prunes with the bloom, parquet.filter.bloom.enabled default
    true) and in DuckDB 1.0 (which ignores it). Either engine breaking
    on the extra footer payload, or Spark's prune dropping a matching
    row group, fails here."""
    path = str(tmp_path / "sparse.parquet")
    _write_sparse_keys(spark, path)
    con = duckdb.connect()
    for off, want in ((1234, 1), (1235, 0), (0, 1), (7999, 0)):
        probe = KEY_BASE + off
        got_s = spark.read.parquet(path).filter(f"k = {probe}").collect()
        assert len(got_s) == want, f"spark k={probe}: {got_s}"
        if want:
            assert got_s[0]["payload"] == str(off // 2)
        got_d = con.execute(
            f"SELECT payload FROM read_parquet('{path}/*.parquet') WHERE k = {probe}"
        ).fetchall()
        assert len(got_d) == want, f"duckdb k={probe}: {got_d}"
        if want:
            assert got_d[0][0] == str(off // 2)


def test_bloom_fixture_writer_single_table(spark, tmp_path):
    """scripts/make_bloom_fixtures.rewrite_table end-to-end on one real
    testdata table: both gates (presence via parquet-mr footer, DuckDB
    value-hash parity) pass and the declared columns carry blooms."""
    src = "/root/testdata/sf0.001/orders.parquet"
    dst = str(tmp_path / "orders.parquet")
    used = rewrite_table(spark, src, dst, duckdb.connect())
    assert used == list(BLOOM_COLS["orders"])
    f = sorted(glob.glob(os.path.join(dst, "part-*.parquet")))[0]
    offs = bloom_offsets(spark, f)
    # the high-cardinality key carries a bloom in every row group;
    # low-cardinality o_custkey may legitimately stay dictionary-only
    # (no bloom, the dictionary prunes exactly) — the gate inside
    # rewrite_table already adjudicated that per chunk via each chunk's
    # own encodings.
    ok = _col_offs(offs, "o_orderkey")
    assert ok and all(v >= 0 for v in ok), offs
    # and a column that did NOT ask for one doesn't pay for one
    assert all(v == -1 for v in _col_offs(offs, "o_orderstatus")), offs


def test_bloom_string_column_cross_engine(spark, tmp_path):
    """Blooms on a STRING key (xxhash over UTF-8 bytes, the hash-key
    case stats pruning is most useless for): presence + exact lookups
    in both engines."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "skeys.parquet")
    df = spark.range(500).selectExpr(
        "concat('doc-', md5(CAST(id AS STRING))) AS doc_id", "id AS v"
    )
    (
        df.repartition(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .option("parquet.bloom.filter.expected.ndv#doc_id", "500")
        .option("parquet.enable.dictionary#doc_id", "false")
        .parquet(path)
    )
    f = sorted(glob.glob(os.path.join(path, "part-*.parquet")))[0]
    doc_offs = _col_offs(bloom_offsets(spark, f), "doc_id")
    assert doc_offs and all(v >= 0 for v in doc_offs)
    back = spark.read.parquet(path)
    present = back.limit(1).collect()[0]["doc_id"]
    con = duckdb.connect()
    for probe, want in ((present, 1), ("doc-ffffffffnotthere", 0)):
        assert back.filter(F.col("doc_id") == probe).count() == want
        assert (
            con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{path}/*.parquet') "
                f"WHERE doc_id = ?",
                [probe],
            ).fetchone()[0]
            == want
        )
