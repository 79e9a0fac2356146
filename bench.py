"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (computes every
column, no driver collect, no skipped projections — df.count() would let
Catalyst prune the world). One reused SparkSession; first query warms
the JVM/codegen and is also reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_dataengineer2026_spark import registry
from test_dataengineer2026_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

#: Representative, perf-meaningful subset across operator families.
HEADLINE = [
    "A1_group_agg",          # scan + 8-agg hash aggregation
    "J1_inner_equi_join",    # fact-to-fact shuffle join
    "J7_broadcast_join",     # star-schema broadcast chain
    "W3_running_agg",        # window cumulative sums
    "J10_asof_join",         # as-of union+window plan
    "J12_similarity_join",   # vector cosine top-k
    "D2_minhash_lsh",        # minhash signatures + LSH self-join
    "T5_tfidf_top_term",     # explode + two-level agg + window
    "F9b_json_event_rollup", # JSON extraction + agg
    "M4_session_window",     # structured streaming sessionization
    "SQL1_tpch_q3",          # SQL surface 3-way join top-k
    "V5_mm_binary_features", # mapInPandas multimodal batch path
]


def main() -> None:
    spark = get_session("bench", shuffle_partitions=max(CPUS, 16))
    qs = registry.queries()
    # untimed warmup: JVM/codegen/parquet-footer caches, plus one tiny
    # streaming query so the micro-batch engine + state store are
    # initialized before the timed M4 run (first stream pays ~2.5s of
    # one-time engine setup that is not a property of the query).
    qs["A1_group_agg"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    qs["M2_tumbling_window"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    sf_tag = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_tag)
    except ValueError:
        sf = sf_tag
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
