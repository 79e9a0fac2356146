"""Source/sink round-trip queries S2/S3/S4/S6/S7/S8 — the write path
executes for real (repo-local .tmp staging), then the re-read result is
verified against an oracle over the original table, proving the formats
preserve values (TEST.md:59 interchange contract)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from test_dataengineer2026_spark import tables
from test_dataengineer2026_spark.registry import register
from test_dataengineer2026_spark.session import apply_runtime_confs
from test_dataengineer2026_spark.sources import io as sio

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_OUT_ROOT = os.path.join(_REPO_ROOT, ".tmp", "sink_stage")


def _stage(name: str, sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(_OUT_ROOT, tag, name)


@register(
    "S8_partitioned_parquet_roundtrip",
    oracle="""
SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
""",
    tags=("sources", "sink"),
)
def partitioned_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+S2: write documents partitioned by lang, re-read, aggregate.
    The lang=... directory keys are what downstream partition pruning
    uses; the oracle confirms zero value drift through the sink."""
    apply_runtime_confs(spark)
    d = tables.load(spark, sf_dir, "documents")
    out = _stage("docs_parquet", sf_dir)
    sio.sink_parquet(d, out, partition_by=["lang"])
    back = sio.scan_parquet(spark, out)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "S3_csv_roundtrip",
    oracle="""
SELECT r_regionkey, r_name FROM region
""",
    tags=("sources", "csv"),
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+S3: CSV sink then declared-schema CSV scan (no inference)."""
    apply_runtime_confs(spark)
    r = tables.load(spark, sf_dir, "region")
    out = _stage("region_csv", sf_dir)
    sio.sink_csv(r, out)
    return sio.scan_csv(spark, out, "r_regionkey int, r_name string")


@register(
    "S4_json_roundtrip",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
    tags=("sources", "json"),
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+S4: JSON sink then declared-schema JSON scan (TEST.md:59)."""
    apply_runtime_confs(spark)
    n = tables.load(spark, sf_dir, "nation")
    out = _stage("nation_json", sf_dir)
    sio.sink_json(n, out)
    return sio.scan_json(
        spark, out, "n_nationkey int, n_name string, n_regionkey int"
    )
