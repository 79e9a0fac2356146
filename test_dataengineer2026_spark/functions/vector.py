"""Vector math over ARRAY<FLOAT> columns (F10, SURVEY.md §2.9).

Pure JVM higher-order expressions — zip_with + left-fold aggregate —
no Python in the data path. Every element is cast to DOUBLE before
multiplication and the fold is sequential left-to-right, which matches
DuckDB's list_sum over list_transform bitwise (verified empirically),
so cosine/top-k queries stay oracle-checkable.

At 100 TB: these expressions vectorize inside whole-stage codegen; for
very wide vectors (>1k dims) a Pandas UDF over Arrow batches with NumPy
BLAS becomes faster — that variant lives in the udf_surface module —
but the 64-d harness vectors stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column) -> Column:
    return c.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; deterministic (dot folds + sqrt + one divide)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential fold (PQ encode/ADC scoring)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def srp_sign_bits(emb: Column, n_planes: int, dim: int) -> Column:
    """Sign-random-projection bits: plane p is a deterministic ±1
    hyperplane derived from md5(p||'_'||i) per dimension i — the
    engine-portable stand-in for a seeded Gaussian projection.

    Returns an array of n_planes ints (1 if projection > 0 else 0).
    """
    idx = F.sequence(F.lit(1), F.lit(dim))

    def sign_for(p: Column, i: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(p.cast("string"), F.lit("_"), i.cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("int")
        return (h % 2) * 2 - 1

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(emb, idx, lambda x, i: _d(x) * sign_for(p, i).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            1,
        ).otherwise(0),
    )
