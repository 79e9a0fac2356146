"""Build nested-type parquet fixtures with three different writers and
gate cross-engine read parity (round-13 robustness probe; r12 verdict
item #5a — SCALE.md §20 declared nested/struct columns un-probed for
lack of fixture surface; this tool is the surface).

Usage:
    python scripts/make_nested_fixtures.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.01 -> /tmp/nested_sf001

What it builds (all derived from src's lineitem, deterministically):

    nested_duck.parquet          DuckDB COPY writer (compliant 3-level
                                 list/element naming, MAP key_value)
    nested_pa.parquet            pyarrow 16 writer (compliant; a second
                                 independent encoder implementation)
    nested_spark.parquet/        Spark's modern writer
    nested_spark_legacy.parquet/ Spark with writeLegacyFormat=true —
                                 the OLD Hive "bag/array" 2-level-named
                                 list shape that pre-Spark-2.4 / Hive /
                                 Impala pipelines left all over real
                                 100 TB lakes

Schema per file: l_orderkey BIGINT,
                 items LIST<STRUCT<ln INT, qty DOUBLE, price DOUBLE>>
                 (element order pinned by (ln, qty, price) — ln alone is
                 NOT unique per order in this fixture),
                 attrs MAP<STRING, DOUBLE> ('n' -> item count,
                 's' -> exact qty sum).

Gates (raise, never assert — `python -O` strips asserts): for EVERY
file, Spark's aggregate readback and DuckDB's aggregate readback must
BOTH equal the flat truth computed from the source lineitem in DuckDB:

    n_orders, n_items,
    total_qty / total_price (exact DECIMAL(18,6) sums),
    first_qty (order-SENSITIVE: sum of each list's FIRST element's qty —
    only matches if the engine preserved list element order exactly),
    map_n / map_s (MAP values fetched by KEY, never iteration order).

Probed 2026-08 (pyarrow 16.1, DuckDB 1.x, Spark 4.1): all four
writers x both readers MATCH at sf0.001/sf0.01, including Spark-legacy
"bag/array" read by DuckDB and pyarrow. Things that make this axis
live: parquet LIST has three historical physical spellings
(list/element, array legacy, bag/array Spark-legacy) and every engine
carries special-case converters for each; a regression in any of them
corrupts silently (wrong nesting -> NULLs or flattened rows), which is
why the gate pins exact values and ORDER, not just counts.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nested_sf001"

#: Exact-decimal readback aggregate, parameterized on the items/attrs
#: spellings of each engine. Sums narrow through DECIMAL(18,6) exactly
#: like determinism.py so a double's 1-ulp accumulation-order drift
#: cannot masquerade as a decoder bug.
DUCK_NESTED_AGG = """
SELECT COUNT(*) AS n_orders,
       CAST(SUM(len(items)) AS BIGINT) AS n_items,
       CAST(SUM(q.s) AS DOUBLE) AS total_qty,
       CAST(SUM(p.s) AS DOUBLE) AS total_price,
       CAST(SUM(CAST(items[1].qty AS DECIMAL(18,6))) AS DOUBLE) AS first_qty,
       CAST(SUM(CAST(attrs['n'][1] AS DECIMAL(18,6))) AS DOUBLE) AS map_n,
       CAST(SUM(CAST(attrs['s'][1] AS DECIMAL(18,6))) AS DOUBLE) AS map_s
FROM read_parquet('{path}'),
     LATERAL (SELECT SUM(CAST(x.qty AS DECIMAL(18,6))) AS s
              FROM UNNEST(items) AS t(x)) q,
     LATERAL (SELECT SUM(CAST(x.price AS DECIMAL(18,6))) AS s
              FROM UNNEST(items) AS t(x)) p
"""

DUCK_FLAT_TRUTH = """
WITH ordered AS (
    SELECT l_orderkey, l_quantity, l_extendedprice,
           ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_quantity, l_extendedprice
           ) AS rn
    FROM read_parquet('{src}')
)
SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
       CAST(SUM(CASE WHEN rn = 1
                     THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
           AS first_qty,
       CAST(COUNT(*) AS DOUBLE) AS map_n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS map_s
FROM ordered
"""


def _get_session():
    """Reuse the caller's active SparkSession when one exists (the test
    suite invokes ``build`` under its shared fixture session); only when
    running standalone build a fresh one WITH configs. Calling
    ``builder.config(...).getOrCreate()`` unconditionally would silently
    set non-static confs on the SHARED session (r13 advisor)."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )


def build(src_sf_dir: str, dst_dir: str) -> list[str]:
    """Write the four nested fixture files; returns their paths."""
    os.makedirs(dst_dir, exist_ok=True)
    src = os.path.join(src_sf_dir, "lineitem.parquet")
    if os.path.isdir(src):  # multi-file source layouts glob like the views
        src = os.path.join(src, "**", "*.parquet")
    con = duckdb.connect()
    duck_path = os.path.join(dst_dir, "nested_duck.parquet")
    con.execute(
        f"""
COPY (
  SELECT l_orderkey,
         LIST(STRUCT_PACK(ln := l_linenumber,
                          qty := l_quantity,
                          price := l_extendedprice)
              ORDER BY l_linenumber, l_quantity, l_extendedprice) AS items,
         MAP(['n', 's'],
             [CAST(COUNT(*) AS DOUBLE),
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)]) AS attrs
  FROM read_parquet('{src}')
  GROUP BY l_orderkey
) TO '{duck_path}' (FORMAT PARQUET)
"""
    )

    import pyarrow.parquet as pq

    pa_path = os.path.join(dst_dir, "nested_pa.parquet")
    pq.write_table(pq.read_table(duck_path), pa_path)

    spark = _get_session()
    df = spark.read.parquet(duck_path)
    spark_path = os.path.join(dst_dir, "nested_spark.parquet")
    legacy_path = os.path.join(dst_dir, "nested_spark_legacy.parquet")
    for p in (spark_path, legacy_path):
        shutil.rmtree(p, ignore_errors=True)
    df.write.parquet(spark_path)
    # try/finally: a failed legacy write must not leave the conf stuck
    # on true in a SHARED session (the test suite passes its fixture
    # session into this function via getOrCreate)
    spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
    try:
        df.write.parquet(legacy_path)
    finally:
        spark.conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    return [duck_path, pa_path, spark_path, legacy_path]


def spark_nested_agg(spark, path: str):
    """The same readback aggregate on the Spark side (exact decimal
    sums; first element by POSITION via element_at; map values by KEY)."""
    from pyspark.sql import functions as F

    from test_dataengineer2026_spark.determinism import dsum

    df = spark.read.parquet(path)
    ex = df.select(
        "l_orderkey",
        F.element_at("items", 1)["qty"].alias("first_qty_row"),
        F.element_at("attrs", F.lit("n")).alias("map_n_row"),
        F.element_at("attrs", F.lit("s")).alias("map_s_row"),
        F.posexplode("items").alias("pos", "item"),
    )
    row = ex.agg(
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("item.qty"), "DECIMAL(18,6)").alias("total_qty"),
        dsum(F.col("item.price")).alias("total_price"),
        dsum(
            F.when(F.col("pos") == 0, F.col("first_qty_row")), "DECIMAL(18,6)"
        ).alias("first_qty"),
        dsum(
            F.when(F.col("pos") == 0, F.col("map_n_row")), "DECIMAL(18,6)"
        ).alias("map_n"),
        dsum(
            F.when(F.col("pos") == 0, F.col("map_s_row")), "DECIMAL(18,6)"
        ).alias("map_s"),
    ).collect()[0]
    return tuple(row)


def main() -> int:
    paths = build(SRC, DST)
    con = duckdb.connect()
    src = os.path.join(SRC, "lineitem.parquet")
    if os.path.isdir(src):
        src = os.path.join(src, "**", "*.parquet")
    truth = con.execute(DUCK_FLAT_TRUTH.format(src=src)).fetchone()
    print(f"flat truth from {src}: {truth}")

    spark = _get_session()
    fails = []
    for p in paths:
        glob_p = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        duck_row = con.execute(DUCK_NESTED_AGG.format(path=glob_p)).fetchone()
        spark_row = spark_nested_agg(spark, p)
        for engine, row in (("duckdb", duck_row), ("spark", spark_row)):
            if tuple(row) != tuple(truth):
                fails.append(p)
                print(f"{os.path.basename(p)} [{engine}]: MISMATCH")
                print(f"  truth={truth}")
                print(f"  got  ={tuple(row)}")
                break
        else:
            print(f"{os.path.basename(p)}: MATCH (spark+duckdb == flat truth)")
    if fails:
        # raise, never sys.exit-on-print: the probe's result must be
        # unmissable even under `python -O` or piped output
        raise RuntimeError(f"nested read parity FAILED for: {fails}")
    print("RESULT: ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
