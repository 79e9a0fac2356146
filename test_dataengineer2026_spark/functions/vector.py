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


def srp_plane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """±1 SRP hyperplane matrix, derived per (plane p, dimension i) as
    md5(f"{p}_{i}") first-6-hex-digits parity — EXACTLY the derivation
    the DuckDB oracle performs in SQL (md5 || substr || :: INTEGER % 2),
    so the sign values are engine-identical by construction
    (tests/test_properties.py pins this against an independent DuckDB
    evaluation). Computed once driver-side: the matrix is row-constant,
    and deriving it inside the plan recomputed n_planes x dim md5+conv
    calls PER ROW (~3M hashes at sf0.1 — measured as the dominant cost
    of the SRP bucketing stage)."""
    import hashlib  # noqa: PLC0415

    return [
        [
            (int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:6], 16) % 2) * 2
            - 1
            for i in range(1, dim + 1)
        ]
        for p in range(n_planes)
    ]


def srp_sign_bits(emb: Column, n_planes: int, dim: int) -> Column:
    """Sign-random-projection bits: plane p is a deterministic ±1
    hyperplane derived from md5(p||'_'||i) per dimension i — the
    engine-portable stand-in for a seeded Gaussian projection.

    Returns an array of n_planes ints (1 if projection > 0 else 0).
    The plane matrix enters the plan as a nested literal array (a few
    KB of constants — at any scale this is broadcast-for-free inside
    the serialized plan); per-row work is the dim multiply-adds only.
    The fold order and double values are identical to the previous
    in-plan md5 derivation, so oracle parity is unchanged.
    """
    smat = F.array(
        *[
            F.array(*[F.lit(float(s)) for s in row])
            for row in srp_plane_signs(n_planes, dim)
        ]
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    emb,
                    F.element_at(smat, (p + 1).cast("int")),
                    lambda x, s: _d(x) * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            1,
        ).otherwise(0),
    )
