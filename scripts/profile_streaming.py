"""Per-batch progress profiler for the streaming exhibits (guide §1).

Runs each requested streaming query end-to-end (wall-clock, noop sink
on the returned table) while a StreamingQueryListener captures every
micro-batch's durationMs breakdown and state-operator metrics — the
evidence the r18 verdict asks for on M13/M17 (state machinery cost per
batch x partition). Diagnostic only; bench.py is untouched.

Usage:
  python scripts/profile_streaming.py --queries M13_stream_stream_left_outer \
      [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import registry, tables
from test_dataengineer2026_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


class BatchListener:
    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                ops = []
                for op in p.stateOperators:
                    ops.append(
                        {
                            "op": op.operatorName,
                            "rows_total": op.numRowsTotal,
                            "rows_updated": op.numRowsUpdated,
                            "commit_ms": op.commitTimeMs,
                            "updates_ms": op.allUpdatesTimeMs,
                            "removals_ms": op.allRemovalsTimeMs,
                            "mem_bytes": op.memoryUsedBytes,
                        }
                    )
                outer.batches.append(
                    {
                        "batch": p.batchId,
                        "rows_in": p.numInputRows,
                        "durationMs": dict(p.durationMs),
                        "state_ops": ops,
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.batches: list[dict] = []
        self._listener = _L()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    names = args.queries.split(",")
    spark = get_session("profile_streaming", shuffle_partitions=max(CPUS, 16))
    qs = registry.queries()
    for _t in tables.TABLES:
        tables.load(spark, SF_DIR, _t)
    tables.register_views(spark, SF_DIR)

    for name in names:
        fn = qs[name]
        for rep in range(args.reps):
            lst = BatchListener()
            spark.streams.addListener(lst._listener)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            time.sleep(0.3)  # let listener-bus drain
            spark.streams.removeListener(lst._listener)
            print(
                json.dumps(
                    {"name": name, "rep": rep, "wall_sec": dt, "batches": lst.batches}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
