"""Z-order (Morton) layout — multi-dimensional data clustering for pruning.

The scale problem: parquet min/max pruning (row-group stats, partition
files) only helps along the physical sort order. Sorting a 100 TB fact
table by ``a`` makes ``WHERE a BETWEEN ..`` skip almost everything, but a
predicate on ``b`` still scans every file. Interleaving the bits of both
keys into one Morton code and range-partitioning + sorting on IT gives
every file a small axis-aligned rectangle of (a, b) space, so a 2-D box
predicate intersects only the files whose rectangle overlaps the box —
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything is codegen arithmetic (shift/mask/or per bit — no UDF); the
write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``, i.e.
one range-exchange over the data, the same cost as any global sort.
Caveat at scale: keys must first be normalized into the ``bits``-wide
integer domain (rank or min-max scale) so the interleave balances both
dimensions; the raw-int fast path below assumes keys already fit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of two non-negative
    integer columns (a's bit i lands at 2i, b's at 2i+1).

    The expansion is 2*bits shift/mask/or terms — a flat whole-stage-
    codegen expression, constant cost per row.
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_by(
    df: DataFrame,
    a: Column | str,
    b: Column | str,
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` for a Z-order write: range-partition on the Morton
    code of (a, b) into ``n_files`` output tasks and sort each partition
    by it, then drop the helper column (projection preserves the order).

    Write the result with a parquet sink; each output file then covers a
    compact Z-range = a small (a, b) rectangle, which min/max stats
    expose to any engine's scan pruning.

    Pass pre-normalized expressions for ``a``/``b`` (rank or min-max
    scaled into the same ``bits``-wide domain) — if one key's domain is
    much wider, its high bits dominate every interleaved prefix and the
    layout degenerates to a single-column sort on that key.
    """
    z = z_value(a, b, bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
