"""Graph operator building blocks (GR2 triangle counting).

Degree-ordered edge orientation: point every undirected edge from its
lower-(degree, id) endpoint to the higher one. Wedge enumeration then
fans out only over OUT-neighborhoods, and a vertex's out-degree under
this total order is bounded by O(sqrt(m)) — the classic bound that
makes triangle enumeration O(m^1.5) instead of sum-of-squared-degrees.
On a skewed graph (one hub of degree n) the difference is C(n,2)
candidate wedges collapsing to ~0: the hub sorts above all its
neighbors, so no wedge is ever centered there.

The (degree, id) pair is compared as a struct — no packed-integer
arithmetic that could overflow on a 100 TB graph's degree range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(pairs: DataFrame) -> DataFrame:
    """Undirected degree per node from a (u, v) u<v distinct edge list."""
    return (
        pairs.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def orient_by_degree(pairs: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient each undirected edge low-(degree, id) -> high-(degree, id).

    Returns columns (src, dst, src_ord, dst_ord) where *_ord is the
    struct(degree, id) sort key — carried so downstream wedge joins can
    order out-neighbors without re-joining the degree table. Two
    broadcast-eligible joins against the degree table (O(nodes), tiny
    next to O(edges)); the edge list itself never shuffles here.
    """
    du = deg.select(
        F.col("node").alias("u"), F.col("degree").alias("du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("degree").alias("dv")
    )
    withdeg = pairs.join(du, "u").join(dv, "v")
    u_ord = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    v_ord = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    u_first = u_ord < v_ord
    return withdeg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, u_ord).otherwise(v_ord).alias("src_ord"),
        F.when(u_first, v_ord).otherwise(u_ord).alias("dst_ord"),
    )


def wedge_candidate_count(oriented: DataFrame) -> DataFrame:
    """Number of candidate wedges the closure join will enumerate:
    sum over centers of C(out_degree, 2). One aggregation, no join —
    the cost model the degree orientation is optimizing."""
    return (
        oriented.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outd"))
        .agg(
            F.coalesce(
                F.sum(F.expr("outd * (outd - 1) div 2")), F.lit(0)
            ).alias("n_wedges")
        )
    )


def triangles_oriented(oriented: DataFrame) -> DataFrame:
    """Enumerate each triangle exactly once from degree-oriented edges.

    Wedge: two out-edges (x->y, x->z) from the same center with
    y ordered before z; closure: the oriented edge y->z exists. Every
    triangle has a unique lowest-(degree, id) corner, so it appears as
    exactly one wedge+closure — same multiset of triangles as the
    u<v formulation, with hub fan-out capped. Returns corners (a, b, c).
    """
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    o3 = oriented.select("src", "dst").alias("o3")
    return (
        o1.join(
            o2,
            (F.col("o1.src") == F.col("o2.src"))
            & (F.col("o1.dst_ord") < F.col("o2.dst_ord")),
        )
        .join(
            o3,
            (F.col("o3.src") == F.col("o1.dst"))
            & (F.col("o3.dst") == F.col("o2.dst")),
        )
        .select(
            F.col("o1.src").alias("a"),
            F.col("o1.dst").alias("b"),
            F.col("o2.dst").alias("c"),
        )
    )
