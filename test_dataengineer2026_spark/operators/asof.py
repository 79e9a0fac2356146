"""As-of join (J10) and range join (J9) — operators Spark lacks natively
(SURVEY.md §2.4, §4.3).

Spark-first design, no Pandas fallback needed:

* **as-of** = union-tag + running ``last(ignorenulls)`` window. One
  shuffle on the join keys, one per-partition sort — the same cost
  profile as a sort-merge join, and it scales to arbitrarily many rows
  per key (unlike a naive join + filter which is quadratic per key).
  This is the standard streaming/CDC "latest value at or before t"
  plan. DuckDB's ASOF JOIN is the semantic reference.

* **range join** = equi-key prefilter + BETWEEN predicate evaluated
  inside the join, so Catalyst keeps a hash/sort-merge strategy rather
  than a nested loop. For pure (no equi-key) interval joins, bucketize
  the time axis to manufacture an equi key first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    left_tiebreak: str,
    right_tiebreak: str,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` (or ``<`` if strict) sharing ``keys``.

    Deterministic under timestamp ties: among right rows with the maximal
    eligible timestamp, the one with the largest ``right_tiebreak`` wins;
    at equal timestamps right rows sort before left rows (non-strict), so
    a same-instant right row is eligible.

    The payload travels as ONE struct column through a single
    ``last(ignorenulls)``, so the matched right row is selected
    atomically — a NULL inside one payload column can never be backfilled
    from an older right row (which per-column carries would do).

    Returns all left columns plus ``payload`` columns (null when no
    eligible right row exists).
    """
    keys = list(keys)
    payload = list(payload)

    from pyspark.sql import types as T

    payload_t = T.StructType([right.schema[c] for c in payload])
    lcols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.col(left_tiebreak).alias("__tb"),
        F.lit(None).cast(payload_t).alias("__p"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_tiebreak).alias("__tb"),
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
    ).select(*[F.col(c) for c in tagged_left.columns])  # align column order

    # At equal __ts: right rows (0) before left rows (1) makes same-instant
    # right rows visible; strict mode flips the tag order instead.
    tag_order = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__ts"), tag_order, F.col("__tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = tagged_left.unionByName(tagged_right)
    carried = unioned.select(
        *unioned.columns,
        F.last(F.col("__p"), ignorenulls=True).over(w).alias("__v"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__v.{c}").alias(c) for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    lower: Column,
    upper: Column,
    probe: Column,
    how: str = "inner",
) -> DataFrame:
    """Interval containment join with a leading equi key: the equi part
    drives the shuffle/hash strategy and the BETWEEN filters in place."""
    return left.join(right, equi & probe.between(lower, upper), how)
