"""Correctness of the skew-join probe's builder and mitigation paths.

The probe's timing claims only mean something if (a) the skewed fact
actually carries the advertised hot-key mass, (b) all three skewed
strategies compute the identical answer, and (c) salting measurably
flattens the shuffle-partition histogram. All three are cheap at 200k
rows; the 20M-row timing run stays in scripts/skew_probe.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scripts import skew_probe as kp


N = 200_000
HOT = 0.4


@pytest.fixture(scope="module")
def skew_tables(spark):
    fact = kp.build_fact(spark, N, HOT, skewed=True).cache()
    dim = kp.build_dim(spark).cache()
    try:
        yield fact, dim
    finally:
        fact.unpersist()
        dim.unpersist()


def test_hot_key_owns_advertised_share(spark, skew_tables):
    fact, _ = skew_tables
    hot = fact.filter(F.col("key") == 0).count()
    assert hot == int(N * HOT)
    # remainder spreads: no other key exceeds 1% of rows
    top_other = (
        fact.filter(F.col("key") != 0)
        .groupBy("key")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert top_other < N * 0.01


def test_salted_join_matches_plain(spark, skew_tables):
    """Both salting variants must be row-identical to the plain key
    join — the same invariant J1b's oracle pins, here on data that is
    actually skewed."""
    fact, dim = skew_tables
    plain = sorted(map(tuple, kp.plain_join(fact, dim).collect()))
    salted = sorted(map(tuple, kp.salted_join(fact, dim).collect()))
    targeted = sorted(
        map(tuple, kp.salted_targeted_join(fact, dim, N).collect())
    )
    assert plain == salted
    assert plain == targeted
    assert len(plain) == 7  # one row per category


def test_targeted_salting_detects_only_the_hot_key(spark, skew_tables):
    """The heavy-hitter detection must find exactly key 0 at 40% hot
    share (no uniform key reaches the 1/P threshold), so the dim-side
    explosion is bounded to SALT_T rows."""
    fact, dim = skew_tables
    from pyspark.sql import functions as F
    hot = (
        fact.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > N // kp.P)
        .collect()
    )
    assert [r["key"] for r in hot] == [0]


def test_salting_flattens_partition_histogram(spark, skew_tables):
    """hash(key) concentrates >= hot_share of rows in one partition;
    hash(key, salt) must cut the max partition by at least 2x (exact
    spread depends on (key,salt) birthday collisions at P=32 — a
    cluster-scale P spreads further)."""
    fact, _ = skew_tables
    h_key = kp.partition_histogram(fact, "key")
    salted = fact.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(kp.SALT)))
    h_salt = kp.partition_histogram(salted, "key", "salt")
    assert h_key["max_rows"] >= N * HOT  # hot key is one indivisible bucket
    assert h_salt["max_rows"] * 2 <= h_key["max_rows"]
