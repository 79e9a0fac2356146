"""Distributional fingerprint of a testdata generation (DuckDB, no Spark).

The harness regenerates every parquet table each round with fresh
randomness, and round 9 proved the regeneration shifts WORKLOADS, not
just bytes: GR1's one data-dependent exchange shrank ~10 MB and M4's
session-window steady state moved 1.25 -> 1.8 s with identical plans —
each initially misread as noise/regression and diagnosed the slow way
(shuffle-byte diffs, a tmpfs A/B). This profile makes the next shift a
two-minute diff instead: run it per round, commit the JSON, and when a
timing band moves, compare fingerprints BEFORE suspecting the code.

Everything here is chosen because some query's cost is a function of
it: session structure drives M4/E1 (merge count), per-user fan-out
drives the window family, doc-length quantiles drive the shingling
family (D2/T5), embedding-norm spread drives the ANN recall/cost
trade, and key cardinalities drive every groupBy's reduce width.

Usage:
    python scripts/data_profile.py [SF_DIR]   # default /root/testdata/sf0.1
    python scripts/data_profile.py --update   # also rewrite DATA_PROFILE.json

Prints one JSON object; --update rewrites the committed
DATA_PROFILE.json (tests/test_data_profile.py checks drift loosely —
structure, not values, since values legitimately change every round).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROFILE_PATH = os.path.join(REPO, "DATA_PROFILE.json")

#: The session gap M4_session_window uses (queries/streaming_q.py) —
#: profiled with the same gap so the session count here predicts the
#: state-store group count there.
SESSION_GAP_MIN = 30


def parse_args(argv: list[str] | None = None):
    """CLI: optional sf_dir; --update rewrites DATA_PROFILE.json."""
    import argparse

    ap = argparse.ArgumentParser(
        description=(
            "Fingerprint a testdata generation's distributions (row "
            "counts, key cardinalities, session structure, doc-length "
            "and embedding stats) so data-vintage workload shifts are "
            "diagnosable by diff instead of by re-measurement."
        )
    )
    ap.add_argument(
        "sf_dir", nargs="?", default=DEFAULT_SF_DIR,
        help=f"testdata directory (default {DEFAULT_SF_DIR})",
    )
    ap.add_argument(
        "--update", action="store_true",
        help="also rewrite the committed DATA_PROFILE.json",
    )
    return ap.parse_args(argv)


def _q(con, sql: str) -> list[tuple]:
    return con.execute(sql).fetchall()


def profile(sf_dir: str) -> dict:
    """One dict per table; every number is a workload driver somewhere."""
    con = duckdb.connect()
    # p() is interpolated into SQL string literals; escape single quotes
    # so a quoted path breaks nothing (r9 advisor)
    p = lambda t: os.path.join(sf_dir, f"{t}.parquet").replace("'", "''")  # noqa: E731
    out: dict[str, dict] = {"sf_dir": sf_dir}

    # Row counts for every table: the zeroth-order fingerprint.
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        out.setdefault("rows", {})[t] = _q(
            con, f"SELECT count(*) FROM read_parquet('{p(t)}')"
        )[0][0]

    # events: the streaming/window/sessionize family's workload.
    (n_users, ts_min, ts_max, n_types) = _q(con, f"""
        SELECT count(DISTINCT user_id), min(ts), max(ts),
               count(DISTINCT event_type)
        FROM read_parquet('{p("events")}')
    """)[0]
    sessions, max_user_events, p50_gap_s = _q(con, f"""
        WITH g AS (
          SELECT user_id, ts,
                 date_diff('second',
                           lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                           ts) AS gap_s
          FROM read_parquet('{p("events")}')
        )
        SELECT
          sum(CASE WHEN gap_s IS NULL
                     OR gap_s > {SESSION_GAP_MIN * 60} THEN 1 ELSE 0 END),
          (SELECT max(c) FROM (SELECT count(*) c FROM g GROUP BY user_id)),
          median(gap_s)
        FROM g
    """)[0]
    out["events"] = {
        "distinct_users": n_users,
        "distinct_event_types": n_types,
        "ts_span_hours": round(
            (ts_max - ts_min).total_seconds() / 3600, 2
        ),
        f"sessions_gap{SESSION_GAP_MIN}m": sessions,
        "max_events_per_user": max_user_events,
        "median_intra_user_gap_s": p50_gap_s,
    }

    # documents: the dedup/shingling/tf-idf family's workload.
    row = _q(con, f"""
        SELECT count(DISTINCT lang), count(DISTINCT source),
               min(n_chars), median(n_chars),
               quantile_cont(n_chars, 0.9), max(n_chars),
               sum(n_chars)
        FROM read_parquet('{p("documents")}')
    """)[0]
    out["documents"] = {
        "distinct_langs": row[0],
        "distinct_sources": row[1],
        "n_chars": {
            "min": row[2], "p50": row[3],
            "p90": row[4], "max": row[5], "total": row[6],
        },
    }

    # embeddings: the ANN ladder's workload.
    row = _q(con, f"""
        SELECT count(DISTINCT label), any_value(len(embedding)),
               median(sqrt(list_sum(list_transform(
                   embedding, x -> CAST(x AS DOUBLE) * x))))
        FROM read_parquet('{p("embeddings")}')
    """)[0]
    out["embeddings"] = {
        "distinct_labels": row[0],
        "dim": row[1],
        "median_l2_norm": round(row[2], 4),
    }

    # join-key fan-outs: reduce-width drivers for the SQL/join family.
    out["fanout"] = {
        "lineitem_per_order_max": _q(con, f"""
            SELECT max(c) FROM (SELECT count(*) c
            FROM read_parquet('{p("lineitem")}') GROUP BY l_orderkey)
        """)[0][0],
        "orders_per_customer_max": _q(con, f"""
            SELECT max(c) FROM (SELECT count(*) c
            FROM read_parquet('{p("orders")}') GROUP BY o_custkey)
        """)[0][0],
    }
    return out


def main() -> None:
    args = parse_args()
    prof = profile(args.sf_dir)
    line = json.dumps(prof, default=str)
    print(line)
    if args.update:
        with open(PROFILE_PATH, "w") as f:
            f.write(json.dumps(prof, default=str, indent=1) + "\n")
        print(f"wrote {PROFILE_PATH}", file=sys.stderr)


if __name__ == "__main__":
    main()
