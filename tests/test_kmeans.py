"""Behavioral tests for the Lloyd k-means operator (oracle equality is
covered registry-wide by test_oracle.py; these pin the clustering
semantics on planted data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators.kmeans import (
    assign_clusters,
    lloyd_kmeans,
    update_centroids,
)


def _qf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, q array<long>")


def test_planted_clusters_separate(spark):
    # two tight groups far apart; k=2 init picks one point from each side
    near_a = [(i, [1000 + i, 0]) for i in range(5)]
    near_b = [(10 + i, [100000 + i, 50000]) for i in range(5)]
    qf = _qf(spark, near_a + near_b)
    out = lloyd_kmeans(qf, k=2, iters=3).collect()
    by_vec = {r["vec_id"]: r["cluster"] for r in out}
    a_clusters = {by_vec[i] for i in range(5)}
    b_clusters = {by_vec[10 + i] for i in range(5)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_argmin_tie_breaks_to_lowest_cluster(spark):
    qf = _qf(spark, [(0, [5, 5])])
    # two identical centroids → equidistant; first (lowest id) must win
    out = assign_clusters(qf, {3: [0, 0], 7: [0, 0]}).collect()[0]
    assert out["cluster"] == 3
    assert out["dist2"] == 50


def test_centroid_update_floor_mean_negative(spark):
    # mean of (-3, -4) = -3.5 → floor = -4 (not truncation's -3)
    qf = _qf(spark, [(0, [-3]), (1, [-4])])
    assigned = assign_clusters(qf, {0: [0]})
    cents = update_centroids(assigned)
    assert cents == {0: [-4]}


def test_empty_cluster_drops_out(spark):
    # all points hug centroid 0; centroid 1 gets no members and vanishes
    qf = _qf(spark, [(0, [1]), (1, [2]), (2, [3])])
    assigned = assign_clusters(qf, {0: [2], 1: [1000]})
    cents = update_centroids(assigned)
    assert set(cents) == {0}
    assert cents[0] == [2]  # floor((1+2+3)/3)


def test_final_plan_is_single_shuffle(spark):
    """The returned frame is map + one grouped agg — the iterative work
    happened at construction time (documented cut_lineage behavior)."""
    from naive_query_engine_spark import plans
    from naive_query_engine_spark.queries import QUERIES

    from .conftest import SF_SMOKE

    spark.catalog.clearCache()
    df = QUERIES["embedding_kmeans_lloyd"].fn(spark, SF_SMOKE)
    text = plans.explain_text(df, "simple")
    n = text.count("Exchange") - text.count("BroadcastExchange")
    assert n <= 2, text[:2000]
