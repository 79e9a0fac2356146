"""Similarity search over embedding columns (J12 similarity join + the
SURVEY north-star "similarity search": brute-force cosine top-k baseline
and an LSH-bucketed approximate variant as the scale path).

100 TB design notes:

* **brute force** is O(|Q| x |C|): correct baseline, and the right
  answer when |Q| is small (broadcast the queries, stream the corpus —
  no shuffle of the corpus at all). The plan below broadcasts the query
  side explicitly.
* **SRP-LSH** (sign random projections, Charikar) buckets vectors by
  t tables of b sign-bits each; candidates = bucket collisions, an
  equi-join. Recall/cost is tuned by (t, b). Hash planes are derived
  from md5 so the whole pipeline — bucketing included — is
  value-checkable against the DuckDB oracle.
* exact top-k per query = window row_number over (rounded cosine,
  vec_id) — ranking on the ROUNDED value makes the selected set stable
  across engines; the tiebreaker resolves rounding-induced ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from test_dataengineer2026_spark.functions.vector import cosine, srp_sign_bits

SRP_TABLES = 4
SRP_BITS = 6
SRP_PLANES = SRP_TABLES * SRP_BITS
DIM = 64


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k most-cosine-similar corpus vectors per query vector."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_emb"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 9).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


IVF_SEEDS = 16
IVF_PROBES = 2


def ivf_assign(
    df: DataFrame,
    seeds: DataFrame,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) — assign each vector to its ``probes`` nearest seed
    cells by cosine (rounded to 9dp, seed-id tiebreak, so the cell
    assignment is bit-deterministic across engines)."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("emb"))
    s = seeds.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("s_emb")
    )
    scored = F.broadcast(s).crossJoin(v).select(
        "id", "cell", F.round(cosine(F.col("emb"), F.col("s_emb")), 9).alias("s")
    )
    w = W.partitionBy("id").orderBy(F.col("s").desc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= probes)
        .select("id", "cell")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    seeds: DataFrame,
    probes: int = IVF_PROBES,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: corpus vectors live in their single nearest seed
    cell; each query probes its ``probes`` nearest cells and runs exact
    cosine top-k over only those cells' members.

    At 100 TB the corpus is PARTITIONED BY cell on disk, so a probe
    reads only `probes / n_cells` of the data — the classic
    inverted-file trade of recall for a bounded candidate set. Real IVF
    trains centroids (k-means); a deterministic seed subset stands in
    here so the whole pipeline (assignment included) stays
    value-checkable against the SQL oracle — the plan shape is
    identical either way.
    """
    cells = ivf_assign(corpus, seeds, probes=1, id_col=id_col, vec_col=vec_col)
    qcells = ivf_assign(queries, seeds, probes=probes, id_col=id_col, vec_col=vec_col)
    cand = (
        qcells.withColumnRenamed("id", "query_id")
        .join(cells.withColumnRenamed("id", "cand_id"), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_emb"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 9).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def srp_buckets(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, table_idx, bucket) — one row per LSH table."""
    bits = srp_sign_bits(F.col(vec_col), SRP_PLANES, DIM)
    with_bits = df.select(F.col(id_col).alias("vid"), bits.alias("bits"))
    weights = F.array(*[F.lit(1 << p) for p in range(SRP_BITS)])
    buckets = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("bits"), t * SRP_BITS + 1, SRP_BITS),
                    weights,
                    lambda bit, w: bit * w,
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            for t in range(SRP_TABLES)
        ]
    )
    return with_bits.select(
        "vid", F.posexplode(buckets).alias("table_idx", "bucket")
    )


def srp_neighbor_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate similar-pair search: SRP bucket collisions verified
    with exact cosine >= threshold."""
    b = srp_buckets(df, id_col, vec_col)
    cands = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("emb_a"))
    vb = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("emb_b"))
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 9).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
