"""Physical-plan audit helpers (SURVEY.md §4.2's "engine-side
obligations", made checkable).

The 100 TB design contract is mostly about what the PLAN looks like,
not what the local run returns: filters must reach the parquet scan
(PushedFilters), projections must prune the read schema (ReadSchema),
small dims must broadcast, hot paths must stay inside whole-stage
codegen, and no operator may introduce an Exchange the query doesn't
need. These helpers extract those facts from ``df.explain`` output so
tests can pin them — a regression that silently turns a broadcast join
into a 100 TB shuffle now fails CI, not the cluster bill.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (``df.explain`` without stdout)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def scan_read_schemas(plan: str) -> list[str]:
    """ReadSchema clause of every file scan in the plan."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def pushed_filters(plan: str) -> list[str]:
    """PushedFilters clause of every file scan (empty list = no scan
    carries pushed predicates)."""
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]


def exchange_count(plan: str) -> int:
    """Number of shuffle Exchange operators in the (initial) simple-mode
    plan (pass ``plan_string(df, "simple")``).

    AQE may later coalesce partitions or convert joins, but every
    planned Exchange is data crossing the cluster at scale — count them
    against the minimum the query semantically needs. Broadcast and
    single-partition (collect-side) exchanges are excluded.
    """
    return len(re.findall(r"Exchange hashpartitioning", plan)) + len(
        re.findall(r"Exchange rangepartitioning", plan)
    )


def join_kinds(plan: str) -> list[str]:
    """Physical join operators in plan order."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def has_wholestage_codegen(plan: str) -> bool:
    """True if any stage runs fused codegen. Simple mode marks fused
    operators with ``*(n)``; formatted mode with ``[codegen id : n]``."""
    return bool(re.search(r"\*\(\d+\)|\[codegen id : \d+\]", plan))


def audit(df: DataFrame) -> dict:
    """One-call summary used by the audit script and tests."""
    formatted = plan_string(df, "formatted")
    simple = plan_string(df, "simple")
    return {
        "exchanges": exchange_count(simple),
        "joins": join_kinds(simple),
        "pushed_filters": pushed_filters(formatted),
        "read_schemas": scan_read_schemas(formatted),
        "wholestage": has_wholestage_codegen(simple),
    }
