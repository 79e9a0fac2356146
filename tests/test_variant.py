"""VARIANT axis (F9d's foundations): Spark 4's open-format VARIANT
through parquet, pinned at the PHYSICAL level.

What Spark 4.1.2 actually writes for a VariantType column (probed
2026-08): the parquet VARIANT **shredding** layout —
``struct(metadata BINARY, value BINARY, typed_value STRUCT<field:
struct(value BINARY, typed_value <type>), ...>)`` — i.e. fields whose
type is stable across a file land as ORDINARY TYPED COLUMNS
(typed_value.k.typed_value), with the binary-encoded residual in
``value``. That is the whole 100 TB story: a loosely-typed payload
column that still gets columnar encodings, stats, and pruning on its
stable fields, while new producer fields land without a migration.

Interop boundaries pinned here (both matter for a mixed-engine lake):
- DuckDB 1.0 ignores the VARIANT logical annotation and reads the raw
  shredded structure — so an engine with ZERO variant support can
  still query shredded fields exactly.
- pyarrow 16.1 refuses the file outright ("Thrift LogicalType that is
  not recognized") — loud, not silent corruption, but a real reader
  hole for this pyarrow vintage.
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_variant(spark, path: str):
    df = spark.range(4).selectExpr(
        "id",
        """parse_json(concat('{"k": ', id, ', "s": "x', id, '"}')) AS v""",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df


def test_variant_shredded_layout_duckdb_readable(spark, tmp_path):
    """The shredded typed_value columns, read RAW by DuckDB (no variant
    support), must equal what Spark extracts logically via variant_get
    — value parity through two completely different decode paths."""
    path = str(tmp_path / "v.parquet")
    _write_variant(spark, path)
    f = glob.glob(os.path.join(path, "part-*.parquet"))[0]
    con = duckdb.connect()
    desc = dict(
        (r[0], r[1])
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{f}')"
        ).fetchall()
    )
    # the shredding layout is present (metadata/value/typed_value)
    assert "metadata BLOB" in desc["v"] and "typed_value" in desc["v"], desc
    got_duck = con.execute(
        f"SELECT id, v.typed_value.k.typed_value AS k, "
        f"v.typed_value.s.typed_value AS s "
        f"FROM read_parquet('{f}') ORDER BY id"
    ).fetchall()
    got_spark = [
        (r["id"], r["k"], r["s"])
        for r in spark.read.parquet(path)
        .select(
            "id",
            F.variant_get("v", "$.k", "bigint").alias("k"),
            F.variant_get("v", "$.s", "string").alias("s"),
        )
        .orderBy("id")
        .collect()
    ]
    assert got_duck == got_spark == [(i, i, f"x{i}") for i in range(4)]


def test_variant_pyarrow_boundary_is_loud(spark, tmp_path):
    """pyarrow 16.1 predates the VARIANT logical type and must refuse
    the file LOUDLY (unrecognized Thrift LogicalType), never silently
    misread it. A pyarrow upgrade that starts reading these files
    flips this pin — re-probe the layout then."""
    path = str(tmp_path / "v.parquet")
    _write_variant(spark, path)
    f = glob.glob(os.path.join(path, "part-*.parquet"))[0]
    with pytest.raises(OSError, match="LogicalType"):
        pq.read_schema(f)


def test_variant_schema_evolution_across_files(spark, tmp_path):
    """The migration-free evolution story F9d exists for: file A's
    props carry {k}, file B's {k, extra} — each file shreds to a
    DIFFERENT physical typed_value struct, and the directory read must
    still union them, with '$.extra' NULL on pre-evolution rows."""
    path = str(tmp_path / "vevo.parquet")
    a = spark.range(3).selectExpr(
        "id", """parse_json(concat('{"k": ', id, '}')) AS v"""
    )
    b = spark.range(3, 6).selectExpr(
        "id",
        """parse_json(concat('{"k": ', id, ', "extra": "e', id, '"}')) AS v""",
    )
    a.coalesce(1).write.mode("overwrite").parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    rows = (
        spark.read.parquet(path)
        .select(
            "id",
            F.variant_get("v", "$.k", "bigint").alias("k"),
            F.variant_get("v", "$.extra", "string").alias("extra"),
        )
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["k"], r["extra"]) for r in rows] == [
        (i, i, None if i < 3 else f"e{i}") for i in range(6)
    ]
    # per-file logical schemas remain observable for lineage/debugging
    schemas = {
        r["s"]
        for r in spark.read.parquet(path)
        .selectExpr("schema_of_variant(v) AS s")
        .distinct()
        .collect()
    }
    assert schemas == {
        "OBJECT<k: BIGINT>",
        "OBJECT<extra: STRING, k: BIGINT>",
    }


def test_variant_semantics(spark):
    """Scalar semantics F9d leans on: typed coercion (bigint vs
    string), missing path -> NULL, JSON null vs missing
    (is_variant_null distinguishes), try_parse_json on malformed
    input -> NULL instead of a poison-pill exception."""
    df = spark.createDataFrame(
        [("ok", '{"k": 7}'), ("jnull", '{"k": null}'), ("empty", "{}")],
        "tag string, js string",
    ).select("tag", F.parse_json("js").alias("v"))
    got = {
        r["tag"]: (r["ki"], r["ks"], r["missing"], r["knull"])
        for r in df.select(
            "tag",
            F.variant_get("v", "$.k", "bigint").alias("ki"),
            F.variant_get("v", "$.k", "string").alias("ks"),
            F.variant_get("v", "$.nope", "string").alias("missing"),
            F.is_variant_null(F.variant_get("v", "$.k", "variant")).alias("knull"),
        ).collect()
    }
    assert got["ok"] == (7, "7", None, False)
    # JSON null is a PRESENT null value, not a missing path
    assert got["jnull"] == (None, None, None, True)
    # missing path: variant_get yields SQL NULL; Spark's
    # is_variant_null(SQL NULL) returns False (probed) — "not a
    # variant-encoded null", distinct from the jnull case above
    assert got["empty"] == (None, None, None, False)
    bad = spark.createDataFrame([("{oops",)], "js string").select(
        F.try_parse_json("js").alias("v")
    )
    assert bad.collect()[0]["v"] is None


def test_f9d_plan_is_jvm_only(spark):
    """F9d's plan contract: parse_json/variant_get are JVM expressions
    — no Python evaluation node may appear anywhere in the plan (the
    UDF tax at 100 TB is the difference between a scan-rate query and
    a 10x slower one)."""
    from test_dataengineer2026_spark.queries.events_json import variant_props

    df = variant_props(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
