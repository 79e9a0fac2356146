"""ANN quality tests: recall of the approximate variants (J12c seeded
IVF, J12d k-means IVF) against the exact brute-force baseline (J12),
and the measurable effect of centroid training (cell balance)."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from test_dataengineer2026_spark import tables
from test_dataengineer2026_spark.operators import similarity as S
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load(spark, SF_DIR, "embeddings")


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.query_id, r.cand_id) for r in df.collect()}


def _cell_sizes(spark, emb, cents) -> list[int]:
    cv = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    return [
        r.n
        for r in S._assign_cells(cv, cents, 1)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_ivf_recall_vs_brute_force(spark, emb):
    """Both IVF variants must recover the large majority of the exact
    top-10 neighbors with 2 probes over 16 cells (measured 2026-08:
    seeded 0.82, trained 0.80 at sf0.001; 0.90 / 0.78 at sf0.01)."""
    seeds = emb.filter(F.col("vec_id") < S.IVF_SEEDS)
    q = emb.filter(F.col("vec_id") < 5)
    truth = _pairs(S.cosine_topk(q, emb, k=10))
    assert len(truth) == 50
    seeded = _pairs(S.ivf_topk(q, emb, seeds))
    trained = _pairs(S.ivf_topk_trained(q, emb, seeds))
    assert len(seeded & truth) / len(truth) >= 0.7
    assert len(trained & truth) / len(truth) >= 0.7


def test_kmeans_training_balances_cells(spark, emb):
    """The point of training: member counts spread more evenly across
    cells, so per-probe scan cost is bounded and task sizes even out.
    (Recall at a fixed probe budget is NOT asserted to improve — smaller
    candidate sets trade some of it away; probes is the tuning knob.)"""
    seeds = emb.filter(F.col("vec_id") < S.IVF_SEEDS)
    seeded_cents = seeds.select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    trained_cents = S.kmeans_centroids(emb, seeds)
    before = _cell_sizes(spark, emb, seeded_cents)
    after = _cell_sizes(spark, emb, trained_cents)
    assert len(after) == len(before) == S.IVF_SEEDS
    assert statistics.pstdev(after) < statistics.pstdev(before)
    assert min(after) >= min(before)


def test_kmeans_centroids_deterministic(spark, emb):
    """The exact-integer update step makes training bit-reproducible:
    two independent runs produce identical centroid arrays."""
    seeds = emb.filter(F.col("vec_id") < S.IVF_SEEDS)
    a = {r.cell: r.c_emb for r in S.kmeans_centroids(emb, seeds).collect()}
    b = {r.cell: r.c_emb for r in S.kmeans_centroids(emb, seeds).collect()}
    assert a == b


def test_pq_rerank_recovers_recall(spark, emb):
    """J12e/J12f: raw ADC over 8-byte codes is a coarse ranker; the
    shortlist + exact re-rank recipe recovers most of the exact top-10
    while touching only shortlist/N of the raw vectors (measured at
    sf0.001: 0.34 raw -> 0.90 reranked)."""
    seeds = emb.filter(F.col("vec_id") < S.PQ_K)
    q = emb.filter(F.col("vec_id") < 5)
    truth = _pairs(S.cosine_topk(q, emb, k=10))
    raw = _pairs(S.pq_topk(q, emb, seeds))
    reranked = _pairs(S.pq_topk_reranked(q, emb, seeds))
    assert len(reranked & truth) / len(truth) >= 0.6
    assert len(reranked & truth) >= len(raw & truth)


def test_pq_codes_are_compact_and_deterministic(spark, emb):
    """PQ encode emits one code in [0, PQ_K) per (vector, subspace) —
    the 32x-compression invariant — and re-encoding is bit-stable."""
    seeds = emb.filter(F.col("vec_id") < S.PQ_K)
    cb = S.pq_codebook(seeds)
    enc = S.pq_encode(emb, cb)
    n_vecs = emb.count()
    assert enc.count() == n_vecs * S.PQ_M
    rng = enc.agg(F.min("code"), F.max("code")).first()
    assert rng[0] >= 0 and rng[1] < S.PQ_K
    a = sorted((r.id, r.m, r.code) for r in enc.collect())
    b = sorted((r.id, r.m, r.code) for r in S.pq_encode(emb, cb).collect())
    assert a == b


def test_srp_neighbor_pairs_releases_bucket_cache(spark, emb):
    """Cache hygiene (r18 advisor / verdict #7): srp_neighbor_pairs is
    called from TWO queries (D5, J12b), so a bucket-table cache entry
    that outlives the call accumulates storage-memory pressure in a
    long-lived shared session. The candidate pairs are checkpointed
    eagerly and the cache released BEFORE the function returns — no
    CacheManager entry may survive, and the returned frame must still
    produce pairs without it."""
    from test_dataengineer2026_spark.operators.similarity import (
        srp_neighbor_pairs,
    )

    spark.catalog.clearCache()
    jsc = spark._jsparkSession.sharedState().cacheManager()
    out = srp_neighbor_pairs(emb)
    assert jsc.isEmpty(), (
        "srp_neighbor_pairs left a CacheManager entry behind"
    )
    assert out.count() > 0  # frame is usable after the release
