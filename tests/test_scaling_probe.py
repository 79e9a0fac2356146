"""Builder correctness for the K-replica scale-up probe.

The probe's claim — "K independent shards, K-times-more data" — rests
on the key shifts being consistent across the star schema: replica i's
lineitem must join replica i's orders and nobody else's, and replicated
document text must NOT create cross-replica near-duplicates (else the
dedup family measures an adversarial workload, not scale-up). These are
cheap to verify at sf0.001/K=2 and rot silently if a key column is
added to a table without updating SHIFT_COLS.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from scripts import scaling_probe as sp
from test_dataengineer2026_spark.functions.text import shingles, tokens


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    base_override = "/root/testdata/sf0.001"
    out_root = str(tmp_path_factory.mktemp("probe"))
    orig_base, orig_root = sp.BASE, sp.OUT_ROOT
    sp.BASE, sp.OUT_ROOT = base_override, out_root
    try:
        yield sp.build(spark, 2), base_override
    finally:
        sp.BASE, sp.OUT_ROOT = orig_base, orig_root
        shutil.rmtree(out_root, ignore_errors=True)


def test_shard_isolation_join_counts(spark, scaled_dir):
    """lineitem x orders at K=2 yields exactly 2x the base join rows:
    every fact row still finds its order, and no replica-0 row joins a
    replica-1 order (which would inflate the count)."""
    out, base = scaled_dir
    def join_count(d):
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        o = spark.read.parquet(f"{d}/orders.parquet")
        return li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert join_count(out) == 2 * join_count(base)


def test_shift_cols_cover_every_key_column(spark, scaled_dir):
    """Every *key / *_id column in every table must be in SHIFT_COLS —
    a new key column silently not shifting would cross-link shards."""
    out, _ = scaled_dir
    for table, cols in sp.SHIFT_COLS.items():
        schema = spark.read.parquet(f"{out}/{table}.parquet").columns
        keyish = [
            c for c in schema
            if c.endswith("key") or c.endswith("_id") or c == "doc_id"
        ]
        missing = [c for c in keyish if c not in cols]
        assert not missing, f"{table}: key columns not shifted: {missing}"


def test_replica_text_shares_no_shingles(spark, scaled_dir):
    """Replica-1 documents must share ZERO 3-gram shingles with their
    replica-0 originals — constant duplicate density under scale-up is
    what separates 'more data' from 'denser duplicates'."""
    out, _ = scaled_dir
    d = spark.read.parquet(f"{out}/documents.parquet")
    r0 = d.filter(F.col("doc_id") < sp.OFFSET).select(
        F.col("doc_id").alias("base_id"),
        shingles(tokens("text"), 3).alias("sh0"),
    )
    r1 = d.filter(F.col("doc_id") >= sp.OFFSET).select(
        (F.col("doc_id") - sp.OFFSET).alias("base_id"),
        shingles(tokens("text"), 3).alias("sh1"),
    )
    overlap = (
        r0.join(r1, "base_id")
        .select(F.size(F.array_intersect("sh0", "sh1")).alias("n"))
        .agg(F.sum("n").alias("total"))
        .collect()[0]["total"]
    )
    assert overlap == 0, f"replicas share {overlap} shingles"
