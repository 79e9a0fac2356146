"""W10_pattern_funnel semantics on a hand-built corpus.

The oracle parity at sf0.01 proves Spark == DuckDB on generated data;
these pins prove the SEMANTICS both engines agree on are the intended
ones — strict event-time ordering between steps, greedy leftmost
match, non-converting users excluded — on adversarial boundary cases
the generator may never emit.
"""

from __future__ import annotations

import datetime

from test_dataengineer2026_spark import registry


def _ts(sec: int):
    return datetime.datetime(2024, 1, 1, 0, 0, sec)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (i, _ts(sec), uid, et, 1.0, "{}")
            for i, (uid, et, sec) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_w10_strict_ordering_and_greedy_match(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            # u1 converts, but only via the LATER click/purchase:
            (1, "view", 10),
            (1, "click", 10),      # tie with view -> NOT after it (strict >)
            (1, "click", 20),      # the click that counts
            (1, "purchase", 15),   # before the matched click -> skipped
            (1, "purchase", 30),   # the purchase that counts
            # u2: click only BEFORE the first view -> no chain
            (2, "click", 5),
            (2, "view", 10),
            (2, "purchase", 20),
            # u3: purchase only BEFORE the click -> no chain
            (3, "view", 5),
            (3, "purchase", 8),
            (3, "click", 20),
        ],
    )
    out = {
        r["user_id"]: (r["t_view_us"], r["t_click_us"], r["t_purchase_us"], r["span_us"])
        for r in registry.queries()["W10_pattern_funnel"](
            spark, str(tmp_path)
        ).collect()
    }
    base_us = int(_ts(0).replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    assert set(out) == {1}, out  # u2/u3 never complete the chain
    assert out[1] == (
        base_us + 10_000_000,
        base_us + 20_000_000,
        base_us + 30_000_000,
        20_000_000,
    )


def test_w10_earliest_view_is_greedy_anchor(spark, tmp_path):
    """Two full chains exist; the reported one anchors on the EARLIEST
    view, then the earliest click after it — not the tightest span."""
    _write_events(
        spark,
        tmp_path,
        [
            (7, "view", 10),
            (7, "view", 40),       # later view would give a tighter span
            (7, "click", 41),
            (7, "purchase", 42),
        ],
    )
    rows = registry.queries()["W10_pattern_funnel"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # anchored at view@10 (greedy leftmost), click@41, purchase@42
    assert r["span_us"] == 32_000_000
