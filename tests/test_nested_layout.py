"""Round-13 nested-parquet axis pins (r12 verdict item #5a).

Two layers:
1. Cross-writer read parity — the make_nested_fixtures probe run
   in-suite at sf0.001: DuckDB-written, pyarrow-written, Spark-modern
   and Spark-LEGACY ("bag/array") nested files must all read back to
   the same exact aggregate in BOTH engines. Parquet LIST has three
   historical physical spellings and each engine carries special-case
   converters; a regression corrupts silently.
2. Nested schema pruning + nested predicate pushdown plan contracts —
   the property that makes STRUCT columns free at 100 TB: a projection
   touching 2 of 3 struct leaves must read 2 leaf columns, and a
   predicate on a nested leaf must reach PushedFilters.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from tests.conftest import SF_DIR


def test_nested_cross_writer_read_parity(spark, tmp_path):
    """All four nested writers x both readers == flat truth, exact
    values including the ORDER-sensitive first-element column."""
    import make_nested_fixtures as mnf

    paths = mnf.build(SF_DIR, str(tmp_path))
    assert len(paths) == 4
    con = duckdb.connect()
    truth = con.execute(
        mnf.DUCK_FLAT_TRUTH.format(src=os.path.join(SF_DIR, "lineitem.parquet"))
    ).fetchone()
    assert truth[0] > 0 and truth[1] > truth[0]  # nonvacuous: multi-item orders
    for p in paths:
        glob_p = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        duck_row = con.execute(mnf.DUCK_NESTED_AGG.format(path=glob_p)).fetchone()
        spark_row = mnf.spark_nested_agg(spark, p)
        assert tuple(duck_row) == tuple(truth), (p, duck_row, truth)
        assert tuple(spark_row) == tuple(truth), (p, spark_row, truth)


def test_spark_legacy_list_physical_shape(spark, tmp_path):
    """The legacy fixture really is the old 'bag/array' spelling — if
    writeLegacyFormat ever stops producing it, the cross-writer test
    above silently loses its third LIST variant."""
    import glob as _glob

    import pyarrow.parquet as pq

    import make_nested_fixtures as mnf

    paths = mnf.build(SF_DIR, str(tmp_path))
    legacy = [p for p in paths if p.endswith("nested_spark_legacy.parquet")][0]
    part = _glob.glob(os.path.join(legacy, "part-*.parquet"))[0]
    import re

    schema_str = str(pq.ParquetFile(part).schema)
    # physical group names carry a field_id token: "group field_id=-1 bag"
    assert re.search(r"group field_id=-?\d+ bag \{", schema_str), schema_str
    assert re.search(r"group field_id=-?\d+ array \{", schema_str), schema_str
    modern = [p for p in paths if p.endswith("nested_spark.parquet")][0]
    part_m = _glob.glob(os.path.join(modern, "part-*.parquet"))[0]
    schema_m = str(pq.ParquetFile(part_m).schema)
    assert re.search(r"group field_id=-?\d+ list \{", schema_m), schema_m
    assert re.search(r"group field_id=-?\d+ element \{", schema_m), schema_m


@pytest.fixture()
def struct_store(spark, tmp_path):
    """A small STRUCT-column parquet store (the N1 shape)."""
    from pyspark.sql import functions as F

    from test_dataengineer2026_spark import tables

    o = tables.load(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_struct.parquet")
    o.select(
        "o_orderkey",
        F.struct("o_orderstatus", "o_totalprice", "o_orderdate").alias(
            "order_info"
        ),
    ).write.parquet(out)
    return out


def test_nested_schema_pruning_plan_contract(spark, struct_store):
    """ReadSchema must carry only the 2 struct leaves the query touches
    (nested schema pruning — Spark default since 3.0). Without it a 100
    TB struct column reads EVERY leaf for any access."""
    from pyspark.sql import functions as F

    from test_dataengineer2026_spark.plans.audit import plan_string

    df = (
        spark.read.parquet(struct_store)
        .filter(F.col("order_info.o_totalprice") > 150000.0)
        .select(F.col("order_info.o_orderstatus").alias("status"))
    )
    plan = plan_string(df, "simple")
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "ReadSchema:" in scan, scan
    read_schema = scan.split("ReadSchema:")[1]
    assert "o_orderstatus" in read_schema and "o_totalprice" in read_schema, scan
    # the pruned leaf: o_orderdate must NOT be decoded
    assert "o_orderdate" not in read_schema, scan
    # nested predicate pushdown: the totalprice filter reaches the scan
    assert "PushedFilters: [" in scan, scan
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "o_totalprice" in pushed, scan
    # and the result is actually nonempty (the contract isn't vacuous)
    assert df.count() > 0


def test_nested_tiny_rowgroups_and_pages(spark, tmp_path):
    """Repetition/definition levels across page boundaries: rewrite the
    nested fixture with ~50-row row groups and ~256-byte pages so list
    elements SPAN data pages and row groups — the decoder state machine
    path a single-page file never touches (the flat row-group-extremes
    probe of r12 covered primitives; this is the nested analogue). Both
    engines must still reproduce the exact flat truth, including
    element order."""
    import pyarrow.parquet as pq

    import make_nested_fixtures as mnf

    paths = mnf.build(SF_DIR, str(tmp_path))
    duck_file = paths[0]
    tiny = str(tmp_path / "nested_tiny.parquet")
    pq.write_table(
        pq.read_table(duck_file),
        tiny,
        row_group_size=50,
        data_page_size=256,
        use_dictionary=False,
    )
    md = pq.ParquetFile(tiny).metadata
    assert md.num_row_groups > 10, md.num_row_groups
    con = duckdb.connect()
    truth = con.execute(
        mnf.DUCK_FLAT_TRUTH.format(src=os.path.join(SF_DIR, "lineitem.parquet"))
    ).fetchone()
    assert con.execute(mnf.DUCK_NESTED_AGG.format(path=tiny)).fetchone() == tuple(truth)
    assert mnf.spark_nested_agg(spark, tiny) == tuple(truth)
