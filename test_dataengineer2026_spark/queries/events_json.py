"""F9 JSON functions + event analytics over the events table
(SURVEY.md §2.9 F9; repo:TESTDATA.md events surface).

Reference basis: events.props is a JSON string (repo:FIXTURES.md §1.2);
the spec's interchange format is JSON (TEST.md:59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from test_dataengineer2026_spark import tables
from test_dataengineer2026_spark.determinism import dsum, sql_dsum
from test_dataengineer2026_spark.registry import register
from test_dataengineer2026_spark.session import apply_runtime_confs


@register(
    "F9_json_funcs",
    oracle="""
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
  json_extract_string(props, '$.missing') AS absent,
  json_valid(props) AS is_valid
FROM events
WHERE event_type = 'click'
""",
    tags=("functions", "json", "events"),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: JSON path extraction + validity + typed parse of events.props
    ({"k": <int>}), via get_json_object and from_json with a declared
    schema — never schema inference in the hot path."""
    apply_runtime_confs(spark)
    e = tables.load(spark, sf_dir, "events")
    parsed = F.from_json(
        "props", T.StructType([T.StructField("k", T.LongType())])
    )
    return e.filter(F.col("event_type") == "click").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
        F.from_json("props", "map<string,string>").isNotNull().alias("is_valid"),
    )


@register(
    "F9b_json_event_rollup",
    oracle=f"""
SELECT
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS total_value,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
""",
    tags=("json", "events", "agg"),
)
def json_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9b: aggregate over JSON-extracted fields per event type — the
    parse happens once in a projected column, then ordinary JVM-side
    aggregation (no per-row Python)."""
    apply_runtime_confs(spark)
    e = tables.load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", "value", "user_id", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "F9c_to_json",
    oracle="""
SELECT
  n_nationkey,
  to_json(struct_pack(nation := n_name, region := n_regionkey))::VARCHAR AS as_json
FROM nation
""",
    tags=("json",),
)
def to_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9c: emit JSON rows (the spec's JSON output format, TEST.md:59)."""
    apply_runtime_confs(spark)
    n = tables.load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(F.col("n_name").alias("nation"), F.col("n_regionkey").alias("region"))
        ).alias("as_json"),
    )


# E1: gap that closes a session, in microseconds (30 min).
SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "E1_batch_sessionize",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM o
)
SELECT user_id,
       session_id::BIGINT AS session_id,
       COUNT(*) AS n_events,
       MIN(epoch_us(ts))::BIGINT AS start_us,
       MAX(epoch_us(ts))::BIGINT AS end_us,
       (MAX(epoch_us(ts)) - MIN(epoch_us(ts)))::BIGINT AS duration_us
FROM s GROUP BY user_id, session_id
""",
    tags=("events", "sessionization", "window"),
)
def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: batch gap-based sessionization — the offline mirror of M4's
    streaming session window: a new session starts when a user's gap
    since their previous event exceeds 30 minutes (lag + running sum of
    boundary flags, the classic sessionization idiom), then one
    aggregation per (user, session). Both windows and the final groupBy
    share ONE hash partitioning on user_id, so at 100 TB the whole
    query is a single shuffle of (user_id, ts) pairs — event payloads
    are pruned at the scan."""
    from pyspark.sql import Window as W

    apply_runtime_confs(spark)
    e = tables.load(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wo)
    boundary = (
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > SESSION_GAP_US)
    ).cast("bigint")
    sess = F.sum(boundary).over(
        wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    us = F.unix_micros(F.col("ts"))
    s = e.select("user_id", us.alias("us"), sess.alias("session_id"))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )
