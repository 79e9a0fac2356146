"""Relational Bloom filter — a broadcastable runtime join filter.

The scale problem: a selective dimension predicate (e.g. "urgent orders
only") should cut the FACT side's shuffle volume before the join, not
after — at 100 TB the dominant cost of ``fact JOIN dim`` is shuffling
fact rows whose keys the join will immediately discard. Engines call the
fix a runtime filter / semi-join reduction (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects one when
statistics allow); this module builds the same structure explicitly, as
plain relational algebra, so the plan shape is pinned and auditable:

* **build**: hash each dim key with ``k`` seeded xxhash64 functions onto
  an ``m``-bit address space, OR the bits into 64-bit words, and collapse
  to a SINGLE ROW holding a ``map<word_idx, word>`` — O(distinct keys)
  work, one partial-aggregated shuffle of at most ``m/64`` words.
* **probe**: broadcast that one row against the fact table (a broadcast
  nested-loop of a 1-row build is a constant-space append of one column)
  and keep rows whose ``k`` probe bits are all set.

False positives are possible (the subsequent exact join removes them);
false NEGATIVES are impossible — every inserted key sets exactly the bits
the probe checks — so pre-filtering never changes the join result. With
``m`` = 2^17 and ``k`` = 3 the filter is 16 KiB regardless of fact size;
sizing follows the standard fpr ~= (1 - e^(-k*n/m))^k.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits in the filter (2^17) and number of seeded hash probes.
DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 3


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k independent bit addresses for a key: xxhash64 seeded by position.

    Seeding by prepending a literal column gives k distinct hash
    functions from the one xxhash64 primitive (hashing the tuple
    ``(i, key)``), the same trick dedup.py uses for MinHash.
    """
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    dim: DataFrame,
    key: str,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """One-row DataFrame ``(bf: map<int, long>)`` — the filter's set words.

    Sparse map, not a dense array: only words with at least one set bit
    are stored, so a small dim costs far less than m/64 entries. The
    aggregation is a groupBy on word index (partial map-side bit_or, at
    most m/64 groups) followed by a collapse to one map row.
    """
    pos = F.explode(
        F.array(*_positions(F.col(key), k, m_bits))
    ).alias("pos")
    words = (
        dim.select(pos)
        .select(
            F.expr("cast(pos div 64 as int)").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("bf")
    )


def bloom_probe(
    fact: DataFrame,
    bf: DataFrame,
    key: str,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """Filter ``fact`` to rows whose key MIGHT be in the filter.

    The one-row ``bf`` is broadcast-joined on (BroadcastNestedLoopJoin of
    a single row — constant memory), the k bit tests run inside codegen,
    and the helper column is dropped, so the surviving plan is scan →
    filter: the fact side shrinks BEFORE any shuffle toward the real
    join. A missing word in the sparse map means bit unset (coalesce 0).
    """
    probed = fact.join(F.broadcast(bf.withColumnRenamed("bf", "__bf")))
    helpers = []
    for i, p in enumerate(_positions(F.col(key), k, m_bits)):
        helpers.append(f"__p{i}")
        probed = probed.withColumn(f"__p{i}", p)
    tests = [
        F.expr(
            f"coalesce(element_at(__bf, cast({h} div 64 as int)), 0L)"
            f" & shiftleft(1L, cast(pmod({h}, 64) as int))"
        )
        != 0
        for h in helpers
    ]
    might_contain = reduce(lambda a, b: a & b, tests)
    return probed.filter(might_contain).drop("__bf", *helpers)
