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


def scan_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S2: columnar scan with pushdown/pruning.

    Pass ``schema`` when the caller knows it (e.g. reading back a store
    it just wrote): a partitioned write of an EMPTY DataFrame emits no
    data files, so a schema-inferring read of that store fails with
    UNABLE_TO_INFER_SCHEMA — a real incremental-pipeline hazard (an
    empty backfill day must produce an empty frame, not a crash).
    Partition columns present in the schema are still parsed from the
    directory keys."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


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


def parquet_leaf_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet store via the Hadoop
    FileSystem listing API — a driver-side METADATA operation (same class
    of work as Delta/Iceberg reading their manifest), never a data scan,
    and portable to any FS the cluster mounts (HDFS/S3/local)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            n += 1
            total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """S14: small-file compaction — the OPTIMIZE pattern. Size the output
    task count from the store's ACTUAL bytes (metadata listing, above)
    so each output file lands near ``target_bytes``, then rewrite with a
    round-robin repartition.

    Small files are the classic silent killer at 100 TB: a streaming or
    per-partition ingest leaves thousands of KB-sized files per
    partition, and every downstream scan pays a task + open + footer
    read per file. Compaction is pure data movement — one round-robin
    exchange, no sort, no skew sensitivity — and the planner math is
    O(files) metadata on the driver. Returns the output file count.
    """
    import math

    _, total = parquet_leaf_stats(spark, src)
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    return n_out


def scan_orc(spark: SparkSession, path: str) -> DataFrame:
    """S17: ORC columnar scan — Spark-native second columnar format
    (predicate pushdown + column pruning, like parquet)."""
    return spark.read.orc(path)


def sink_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S17: ORC output sink."""
    df.write.mode(mode).orc(path)


def scan_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    row_tag: str = "record",
) -> DataFrame:
    """S20: XML scan (Spark 4 ships format("xml") in core — no extra
    jars). Schema is REQUIRED by this wrapper: XML inference needs a
    full extra pass over the data, and absent elements (XML's encoding
    of NULL) can narrow inferred types per-file; an explicit schema
    keeps the read one-pass and the null contract exact. At 100 TB the
    per-file XML parse cost dwarfs columnar scans — XML is an
    interchange boundary format here (land it, convert to parquet),
    never the analytical store."""
    return (
        spark.read.format("xml").option("rowTag", row_tag).schema(schema).load(path)
    )


def sink_xml(
    df: DataFrame, path: str, row_tag: str = "record", mode: str = "overwrite"
) -> None:
    """S20: XML output sink. One element per row under ``row_tag``;
    NULL columns are omitted (the XML convention — restored as nulls
    by a schema-bearing read); text is entity-escaped by the writer."""
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)
