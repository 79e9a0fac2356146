"""Lineage-truncation helpers for iterative algorithms.

Iterative jobs (BFS, PageRank, connected components) end each round in
``localCheckpoint()`` so the logical plan stays constant-size instead of
growing ~k^rounds (SCALE.md §13 records the driver OOM this prevented).
The catch: the checkpoint's storage is RDD-level — it never registers
with the SQL CacheManager, so ``DataFrame.unpersist()`` on the returned
frame finds no cache entry and frees NOTHING (verified empirically on
this Spark: getRDDStorageInfo still shows every block after
``df.unpersist(True)``). Without a real release, O(rounds) dead node
tables pile up in storage memory until nondeterministic ContextCleaner
GC.

``release_checkpoint`` reaches the actual storage: a checkpointed
Dataset's analyzed plan is a ``LogicalRDD`` wrapping the materialized
internal RDD, and unpersisting THAT RDD frees the blocks (verified: the
storage list goes empty). It also calls plain ``unpersist()`` first so
the same helper releases CacheManager-tracked frames (``.cache()``),
letting loop code treat "drop the previous round" uniformly.

Private-API note: ``_jdf`` / ``queryExecution().analyzed()`` is
internal PySpark surface, so everything is wrapped defensively — on a
build where the shape differs the helper degrades to the old (no-op)
behavior instead of failing the query. Blocks are then reclaimed by
ContextCleaner as before; the helper is an optimization with a safe
floor, not a correctness dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_checkpoint(df: DataFrame) -> bool:
    """Free a frame's materialized storage (cache OR localCheckpoint).

    ONLY call this on frames no live plan will read again: a locally
    checkpointed RDD's lineage is truncated, so after release it cannot
    be recomputed (Spark logs exactly that warning on the unpersist).
    The iterative loops satisfy this by construction — they release
    round N-1 only after round N has eagerly materialized, and never
    release the final result they return.

    Returns True if RDD-level checkpoint blocks were explicitly
    released, False when only the (possibly no-op) CacheManager path
    ran. Non-blocking: uses async unpersist so the caller's next round
    is not gated on block deletion.
    """
    try:
        df.unpersist(blocking=False)
    except Exception:  # pragma: no cover - unpersist is best-effort
        pass
    try:
        plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            return True
    except Exception:  # pragma: no cover - private API drifted
        pass
    return False
