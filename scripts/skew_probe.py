"""Measured skew-join probe: what does a hot key actually cost, and do
the two mitigations (AQE skew-split, explicit salting) actually pay?

J1b_salted_skew_join proves the salted join is SEMANTICALLY identical
to the plain join (its oracle is the plain SQL join), but the sf0.1
testdata is uniform, so nothing in the repo *measures* the mechanism.
This probe builds a deliberately skewed fact table — one hot key owning
``hot_share`` of all rows — and times the same join+agg four ways:

  uniform_static   control: same row count, uniform keys, AQE off
  skewed_static    AQE off, broadcast off -> hash-partitioned SMJ; the
                   hot key's whole row mass lands in ONE task (the
                   straggler a 1000-executor cluster would idle behind)
  skewed_aqe       AQE skew-join split on. Thresholds are lowered to
                   probe scale (16 MiB vs the 256 MiB production
                   default) so the splitter fires on a ~240 MB hot
                   partition; at 100 TB the defaults fire unmodified.
  skewed_salted    the J1b mechanism: fact.salt = hash(row) % SALT,
                   dim exploded x SALT, equi-join on (key, salt) with
                   AQE off — spreads the hot key over SALT tasks at the
                   cost of SALT x dim-side shuffle volume.

All four run the identical aggregation and the probe asserts the three
skewed variants return row-identical results (the uniform control
differs by construction). It also prints the shuffle-partition row
histogram for hash(key) vs hash(key, salt) at P=32 — the imbalance
number the timings should track.

Broadcast is disabled in every strategy: with a broadcastable dim the
right answer is "broadcast, no shuffle, skew irrelevant" (J7), and the
probe would measure nothing. This isolates the fact-to-fact case where
both sides genuinely shuffle.

Usage:
    python scripts/skew_probe.py [n_fact] [hot_share]   # 20e6, 0.4

One JSON line to stdout; parquet scratch in /tmp/spark_graft_skew/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from test_dataengineer2026_spark.session import get_session

OUT_ROOT = "/tmp/spark_graft_skew"
N_KEYS = 100_000
SALT = 16
P = 32

#: Conf names toggled per strategy (reset to these defaults between runs).
_BASE_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.adaptive.skewJoin.enabled": "false",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}
_AQE_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # Probe-scale thresholds: the hot partition is ~hundreds of MB, the
    # production defaults (256 MiB / 5x factor) are sized for executor
    # memory at cluster scale. Factor stays default; only bytes shrink.
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
}


def build_fact(spark, n_fact: int, hot_share: float, skewed: bool) -> DataFrame:
    """Fact rows (id, key, amount). Skewed: the first ``hot_share`` of
    ids all map to key 0; the rest spread uniformly over [1, N_KEYS).
    Uniform control: every id spreads over [0, N_KEYS). Deterministic
    in ``id`` either way (no RNG — rebuilds are bit-identical)."""
    df = spark.range(n_fact).select(
        F.col("id"),
        (
            F.when(F.col("id") < int(n_fact * hot_share), F.lit(0)).otherwise(
                F.pmod(F.xxhash64("id"), F.lit(N_KEYS - 1)) + 1
            )
            if skewed
            else F.pmod(F.xxhash64("id"), F.lit(N_KEYS))
        ).alias("key"),
        (F.pmod(F.col("id"), F.lit(10_000)).cast("double") / 100.0).alias("amount"),
    )
    return df


def build_dim(spark) -> DataFrame:
    """Dim rows (key, category) — one row per key, 7 categories."""
    return spark.range(N_KEYS).select(
        F.col("id").alias("key"),
        F.pmod(F.col("id"), F.lit(7)).cast("int").alias("category"),
    )


def _set_confs(spark, confs: dict[str, str]) -> None:
    for k, v in confs.items():
        spark.conf.set(k, v)


def _agg(joined: DataFrame) -> DataFrame:
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("amount").cast("decimal(18,2)")).alias("total"),
    )


def plain_join(fact: DataFrame, dim: DataFrame) -> DataFrame:
    return _agg(fact.join(dim, "key"))


def salted_join(fact: DataFrame, dim: DataFrame) -> DataFrame:
    f = fact.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(SALT)))
    d = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
    return _agg(f.join(d, ["key", "salt"]))


#: Targeted variant: salt fan-out for detected hot keys only. Wider
#: than the blanket SALT because only hot keys pay the dim explosion.
SALT_T = 32


def salted_targeted_join(fact: DataFrame, dim: DataFrame, n_fact: int) -> DataFrame:
    """Production-grade partial salting: one partial-agg pass detects
    keys whose row count exceeds an average partition's share, ONLY
    those keys get salted (and only their dim rows explode, SALT_T
    ways). The hot set is bounded by construction — at most P keys can
    each exceed 1/P of the rows — so its broadcast never grows with
    data. At 100 TB this is the shape that beats blanket salting: the
    dim is itself large there, and multiplying ALL of it x SALT is a
    shuffle-volume regression, while multiplying a handful of hot keys
    is noise. (Aggregation skew needs none of this — see _group.)"""
    hot = (
        fact.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > n_fact // P)
        .select("key", F.lit(True).alias("is_hot"))
    )
    f = fact.join(F.broadcast(hot), "key", "left").withColumn(
        "salt",
        F.when(
            F.col("is_hot"), F.pmod(F.xxhash64("id"), F.lit(SALT_T))
        ).otherwise(F.lit(0)),
    )
    d = dim.join(F.broadcast(hot), "key", "left").withColumn(
        "salt",
        F.explode(
            F.when(
                F.col("is_hot"), F.sequence(F.lit(0), F.lit(SALT_T - 1))
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return _agg(f.drop("is_hot").join(d.drop("is_hot"), ["key", "salt"]))


def _run(spark, confs: dict[str, str], df: DataFrame) -> float:
    _set_confs(spark, confs)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def partition_histogram(df: DataFrame, *cols: str) -> dict[str, int]:
    """max/median rows per partition when hash-partitioned on ``cols``."""
    counts = sorted(
        r["n"]
        for r in df.repartition(P, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {
        "partitions": len(counts),
        "max_rows": counts[-1],
        "median_rows": counts[len(counts) // 2],
    }


def parse_args(argv: list[str] | None = None) -> tuple[int, float]:
    """CLI: (n_fact, hot_share); rejects non-positive sizes and
    hot_share outside (0, 1)."""
    import argparse

    ap = argparse.ArgumentParser(
        description=(
            "Build a deliberately skewed fact table (one hot key owning "
            "hot_share of rows) and time the same join+agg under static, "
            "AQE-skew-split, and salted strategies; asserts all skewed "
            "variants return identical results."
        )
    )
    ap.add_argument(
        "n_fact", type=float, nargs="?", default=20_000_000,
        help="fact-table row count (default 2e7; floats like 2e6 accepted)",
    )
    ap.add_argument(
        "hot_share", type=float, nargs="?", default=0.4,
        help="fraction of rows owned by the hot key (default 0.4)",
    )
    args = ap.parse_args(argv)
    n_fact = int(args.n_fact)
    if n_fact < 1:
        ap.error("n_fact must be >= 1")
    if not 0.0 < args.hot_share < 1.0:
        ap.error("hot_share must be in (0, 1)")
    return n_fact, args.hot_share


def main() -> None:
    n_fact, hot_share = parse_args()
    spark = get_session("skew-probe", shuffle_partitions=P)
    shutil.rmtree(OUT_ROOT, ignore_errors=True)

    # Materialize both facts to parquet so every strategy reads the same
    # bytes from disk (a range() source would hide the scan cost).
    for name, skewed in (("fact_skew", True), ("fact_uniform", False)):
        build_fact(spark, n_fact, hot_share, skewed).write.mode("overwrite").parquet(
            os.path.join(OUT_ROOT, name)
        )
    fact_skew = spark.read.parquet(os.path.join(OUT_ROOT, "fact_skew"))
    fact_uni = spark.read.parquet(os.path.join(OUT_ROOT, "fact_uniform"))
    dim = build_dim(spark)

    # warmup: codegen + shuffle machinery on a throwaway slice
    _run(spark, _BASE_CONFS, plain_join(fact_uni.limit(100_000), dim))

    # Aggregation-skew control: groupBy on the same hot key. Partial
    # (map-side) aggregation collapses the hot key to one row per input
    # split BEFORE the shuffle, so the reducer for key 0 receives
    # O(splits) rows, not O(hot rows) — aggregation skew is benign and
    # needs no salting; only JOINS materialize the hot key's row mass
    # in one task. Measuring both sides of that asymmetry is the point.
    def _group(f: DataFrame) -> DataFrame:
        return f.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("amount").cast("decimal(18,2)")).alias("total"),
        )

    timings = {
        "uniform_static": _run(spark, _BASE_CONFS, plain_join(fact_uni, dim)),
        "skewed_static": _run(spark, _BASE_CONFS, plain_join(fact_skew, dim)),
        "skewed_aqe": _run(spark, _AQE_CONFS, plain_join(fact_skew, dim)),
        "skewed_salted": _run(spark, _BASE_CONFS, salted_join(fact_skew, dim)),
        "skewed_salted_targeted": _run(
            spark, _BASE_CONFS, salted_targeted_join(fact_skew, dim, n_fact)
        ),
        "agg_uniform": _run(spark, _BASE_CONFS, _group(fact_uni)),
        "agg_skewed": _run(spark, _BASE_CONFS, _group(fact_skew)),
    }

    # The three skewed strategies must agree row-for-row (7-row result).
    # Raise (don't assert): these are the probe's correctness gates and
    # must survive `python -O`.
    _set_confs(spark, _BASE_CONFS)
    ref = sorted(map(tuple, plain_join(fact_skew, dim).collect()))
    _set_confs(spark, _AQE_CONFS)
    if sorted(map(tuple, plain_join(fact_skew, dim).collect())) != ref:
        raise RuntimeError("AQE-skew-split join result diverged from plain join")
    _set_confs(spark, _BASE_CONFS)
    if sorted(map(tuple, salted_join(fact_skew, dim).collect())) != ref:
        raise RuntimeError("salted join result diverged from plain join")
    if sorted(map(tuple, salted_targeted_join(fact_skew, dim, n_fact).collect())) != ref:
        raise RuntimeError("targeted-salt join result diverged from plain join")

    salted_fact = fact_skew.withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(SALT))
    )
    # Targeted layout: cold keys keep salt 0 (hash(key, 0) still spreads
    # them BY KEY), only the hot key fans out SALT_T ways.
    targeted_fact = fact_skew.withColumn(
        "salt",
        F.when(
            F.col("key") == 0, F.pmod(F.xxhash64("id"), F.lit(SALT_T))
        ).otherwise(F.lit(0)),
    )
    print(
        json.dumps(
            {
                "n_fact": n_fact,
                "hot_share": hot_share,
                "n_keys": N_KEYS,
                "salt": SALT,
                "timings_sec": timings,
                "skew_speedup_aqe": round(
                    timings["skewed_static"] / max(timings["skewed_aqe"], 1e-9), 2
                ),
                "skew_speedup_salted": round(
                    timings["skewed_static"] / max(timings["skewed_salted"], 1e-9), 2
                ),
                "skew_speedup_targeted": round(
                    timings["skewed_static"]
                    / max(timings["skewed_salted_targeted"], 1e-9),
                    2,
                ),
                "hist_key": partition_histogram(fact_skew, "key"),
                "hist_key_salt": partition_histogram(salted_fact, "key", "salt"),
                "hist_key_salt_targeted": partition_histogram(
                    targeted_fact, "key", "salt"
                ),
                "load_avg_1m": round(os.getloadavg()[0], 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
