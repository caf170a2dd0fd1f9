"""Behavioral invariants for the r4c operators (skyline / attribution /
bounded-hop BFS) and the ``distributed_prefix_max`` primitive.

The DuckDB oracle (tests/test_oracle.py) pins exact values for all three
registered queries; these tests pin the PROPERTIES that make each operator
correct by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators.analytics import (
    events_attribution_last_touch,
    part_skyline_pareto,
)
from naive_query_engine_spark.operators.clustering import (
    BFS_MAX_HOPS,
    BFS_SEED_MOD,
    graph_bfs_reach,
)
from naive_query_engine_spark.operators.layout import distributed_prefix_max
from naive_query_engine_spark.queries import t

from .conftest import SF_ORACLE


def test_prefix_max_matches_local_exclusive_scan(spark):
    """distributed_prefix_max == a single-threaded exclusive running max,
    including NULL on the first row and across partition boundaries."""
    rows = [(i, v) for i, v in enumerate([5, 3, 9, 9, 1, 12, 0, 7])]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["pm"]
        for r in distributed_prefix_max(df, [F.col("k")], "v", "pm", n_parts=3)
        .collect()
    }
    expected, best = {}, None
    for k, v in rows:
        expected[k] = best
        best = v if best is None or v > best else best
    assert got == expected


def test_skyline_is_exactly_the_non_dominated_set(spark):
    """Independent O(n²)-on-collapsed-points check: a (price, size) point
    is in the output iff NO other point dominates it (<= price, >= size,
    one strict) — verified against the raw part table, not the oracle."""
    pts = (
        t(spark, SF_ORACLE, "part")
        .groupBy(
            F.col("p_retailprice").cast("decimal(12,2)").alias("price"),
            F.col("p_size").alias("size"),
        )
        .count()
        .collect()
    )
    points = [(float(r["price"]), r["size"]) for r in pts]
    non_dominated = {
        (p, s)
        for (p, s) in points
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for (p2, s2) in points
        )
    }
    got = {
        (r["price"], r["best_size"])
        for r in part_skyline_pareto(spark, SF_ORACLE).collect()
    }
    assert got == non_dominated


def test_attribution_partitions_all_purchases(spark):
    """Every purchase lands in exactly one channel; channels are only
    marketing touch types or 'organic'; revenue totals are conserved."""
    out = events_attribution_last_touch(spark, SF_ORACLE).collect()
    assert {r["channel"] for r in out} <= {"click", "view", "organic"}
    ev = t(spark, SF_ORACLE, "events").filter(F.col("event_type") == "purchase")
    n_purchases = ev.count()
    assert sum(r["n_conversions"] for r in out) == n_purchases
    total_rev = float(
        ev.agg(F.sum(F.col("value").cast("decimal(12,2)"))).collect()[0][0]
    )
    assert abs(sum(r["attributed_revenue"] for r in out) - total_rev) < 1e-6


def test_bfs_seeds_are_level_zero_and_hops_bounded(spark):
    """Level 0 is exactly the seed set; no hop exceeds the cap; level
    sizes can only shrink-or-grow within reach (sanity, not exactness —
    the oracle pins values)."""
    out = {r["hops"]: r for r in graph_bfs_reach(spark, SF_ORACLE).collect()}
    n_seeds = (
        t(spark, SF_ORACLE, "documents")
        .filter(F.col("doc_id") % BFS_SEED_MOD == 0)
        .count()
    )
    assert out[0]["n_docs"] == n_seeds
    assert out[0]["min_doc"] == 0
    assert max(out) <= BFS_MAX_HOPS
