"""Structured Streaming jobs over the events surface (M1-M9).

Design (SURVEY.md §3.3): the same logical transformations serve batch
and stream; here the batch parquet table is re-fed through a file
stream source so every windowed/stateful operator genuinely executes in
the streaming engine (micro-batches, state store, output modes), while
staying deterministic for the harness:

* file source + ``availableNow`` trigger = bounded, synchronous run
  (M9 trigger control);
* ``complete``/``update`` output modes make results independent of the
  batch split, so the DuckDB oracle can recompute them as batch SQL;
* watermark + append-mode late-data semantics (M1/M8) depend on batch
  boundaries by design — they are exercised in tests/test_streaming.py
  with a controlled two-file split, not in the oracle-checked queries.

At scale the file source swaps for Kafka/object-store listing with the
same plan; state stores shard by the groupBy key across executors.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from test_dataengineer2026_spark import tables

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, "
    "props string"
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_STAGE_ROOT = os.path.join(_REPO_ROOT, ".tmp", "stream_stage")


def stage_events_dir(sf_dir: str) -> str:
    """File stream sources need a directory; stage the single events
    parquet file into one (symlink, no copy)."""
    tag = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(_STAGE_ROOT, tag)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    src = tables.table_path(sf_dir, "events")
    if not os.path.islink(link):
        os.symlink(src, link)
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of events with the same ns->us timestamp handling
    as the batch loader (tables.load)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(stage_events_dir(sf_dir))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str,
) -> Callable[[SparkSession], DataFrame]:
    """Run a bounded streaming query into a memory sink and return the
    materialized result table."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
