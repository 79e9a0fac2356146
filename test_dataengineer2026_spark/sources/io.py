"""S1-S10: sources and sinks (SURVEY.md §2.1).

Reference basis: PDF corpus ingestion (TEST.md:26), JSON/CSV interchange
(TEST.md:59), output/ directory layout (TEST.md:135), 10k-PDF production
feed (TEST.md:65,158-163).

Scale notes:
- Parquet is the only sane interior format at 100 TB (columnar, stats,
  pushdown); CSV/JSON exist as edge formats with declared schemas —
  NEVER inferSchema in production (a full extra pass over the data).
- Partitioned sinks (partitionBy) give downstream partition pruning;
  sortWithinPartitions before write gives row-group min/max stats that
  parquet readers skip on.
- Streaming sources/sinks (S9/S10) live in streaming/jobs.py; the
  foreachBatch + checkpoint pattern is the idempotent-retry unit
  (TEST.md:161).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def scan_binary(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S1: one row per file (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S2: columnar scan with pushdown/pruning."""
    return spark.read.parquet(path)


def scan_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """S3: delimited text with a DECLARED schema."""
    return spark.read.csv(path, header=header, schema=schema)


def scan_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """S4: JSON-lines with a DECLARED schema."""
    return spark.read.json(path, schema=schema)


def scan_text(spark: SparkSession, path: str) -> DataFrame:
    """S5: raw text lines (e.g. the reference's data/prueba.txt)."""
    return spark.read.text(path)


def sink_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6: JSON output (TEST.md:59)."""
    df.write.mode(mode).json(path)


def sink_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: CSV output with header (TEST.md:59)."""
    df.write.mode(mode).option("header", True).csv(path)


def sink_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S8: partitioned columnar sink — partition columns become directory
    keys that downstream scans prune statically."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
