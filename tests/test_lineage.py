"""Checkpoint-storage release contracts for the iterative family.

DataFrame.unpersist() is a measured NO-OP on localCheckpoint storage
(RDD-level blocks, no CacheManager entry) — lineage.release_checkpoint
unpersists the LogicalRDD's underlying RDD instead. These tests pin
(a) the helper's mechanism and (b) the loop-level contract: an
iterative query leaves O(1) live storage entries, not O(rounds).
"""

from __future__ import annotations

import time

from test_dataengineer2026_spark import registry
from test_dataengineer2026_spark.lineage import release_checkpoint
from tests.conftest import SF_DIR


def _storage_ids(spark) -> set[int]:
    return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}


def test_release_checkpoint_frees_blocks_plain_unpersist_does_not(spark):
    df = spark.range(50_000).selectExpr("id", "id * 2 AS x")
    before = _storage_ids(spark)
    ck = df.localCheckpoint()
    assert _storage_ids(spark) - before, "checkpoint did not materialize blocks"
    ck.unpersist(True)
    assert _storage_ids(spark) - before, (
        "plain unpersist freed checkpoint blocks — Spark behavior changed; "
        "lineage.py's workaround (and this test) can simplify"
    )
    assert release_checkpoint(ck) is True
    assert not (_storage_ids(spark) - before)


def test_iterative_queries_leave_o1_storage(spark):
    """GR4 runs BFS_MAX_HOPS rounds, D6 runs CC rounds; each must leave
    at most ONE new storage entry (its final materialized result) —
    intermediate rounds' blocks are released as soon as the next round
    lands."""
    qs = registry.queries()
    for name in ("GR4_bfs_levels", "D6_neardup_clusters"):
        before = _storage_ids(spark)
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        # The releases inside the loop (release_checkpoint, unpersist)
        # are non-blocking, so block removal can lag the query's return
        # under load (r7 advisor flake warning) — poll briefly before
        # judging a leak.
        leaked = _storage_ids(spark) - before
        deadline = time.monotonic() + 10.0
        while len(leaked) > 1 and time.monotonic() < deadline:
            time.sleep(0.25)
            leaked = _storage_ids(spark) - before
        assert len(leaked) <= 1, (name, leaked)
