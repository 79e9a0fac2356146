"""Multimodal binary-column queries (SURVEY north-star "multimodal
columns"): real mapInPandas plumbing over BINARY payloads, with SQL
oracles recomputing the same features from the source text (the corpus
is ASCII, so char ops == byte ops on the oracle side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from test_dataengineer2026_spark import tables
from test_dataengineer2026_spark.multimodal.binary_ops import (
    attach_binary,
    extract_features,
    sample_frames,
)
from test_dataengineer2026_spark.registry import register
from test_dataengineer2026_spark.session import apply_runtime_confs


@register(
    "V5_mm_binary_features",
    oracle="""
SELECT
  doc_id,
  CAST(length(text) AS BIGINT) AS byte_len,
  md5(text) AS content_md5,
  ascii(substring(text, 1, 1)) AS first_byte,
  CAST(length(text) % 640 AS INTEGER) AS width,
  CAST((length(text) * 7) % 480 AS INTEGER) AS height
FROM documents
""",
    tags=("multimodal", "udf", "mapInPandas"),
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 + multimodal: binary payload -> typed features via mapInPandas
    (Arrow batch iterator). Decoder dimensions are a clearly-marked
    deterministic fake (no imaging libs in this build); everything else
    (md5, lengths, bytes) is real."""
    apply_runtime_confs(spark)
    d = tables.load(spark, sf_dir, "documents")
    return extract_features(attach_binary(d))


@register(
    "MM2_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id, text, g.i AS frame_idx
  FROM documents, unnest(generate_series(0, 2)) AS g(i)
  WHERE g.i < least(3, length(text) // 100)
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(substring(text, frame_idx * 100 + 1, 100)) AS frame_md5,
       CAST(100 AS BIGINT) AS frame_len
FROM f
""",
    tags=("multimodal", "mapInPandas"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: fixed 100-byte windows, up to 3 frames
    per payload — the keyframe-extraction batch shape."""
    apply_runtime_confs(spark)
    d = tables.load(spark, sf_dir, "documents")
    return sample_frames(attach_binary(d), frame_size=100, max_frames=3)
