"""Persistent bucketed near-dup EDGE table (VERDICT r4 #3).

The graph family's probes (BFS blast-radius, degree distribution,
component joins) all key on the source vertex.  ``write_edge_table``
persists the symmetrized near-dup edge set bucketed by that key — the
graph twin of the bucketed shingle index — so every probe reads the edge
side with no exchange.  These tests pin

1. the vertex-keyed degree aggregation over the bucketed table runs with
   NO Exchange at all (bucketing satisfies the partial agg's required
   distribution), and a frontier join shuffles ONLY the frontier side,
2. the stored-table bodies (``bfs_hops_histogram``,
   ``degree_log_histogram``) produce byte-identical results to the
   self-contained registered queries (which build the edge frame through
   the session cache).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from naive_query_engine_spark import plans
from naive_query_engine_spark.operators.clustering import (
    BFS_SEED_MOD,
    bfs_hops_histogram,
    degree_log_histogram,
    write_edge_table,
)
from naive_query_engine_spark.queries import QUERIES, t

from .conftest import SF_SMOKE

EDGE_TABLE = "b_near_dup_edges"


@pytest.fixture(scope="module")
def edge_table(spark):
    write_edge_table(t(spark, SF_SMOKE, "documents"), EDGE_TABLE, n_buckets=8)
    yield
    spark.sql(f"DROP TABLE IF EXISTS {EDGE_TABLE}")


def test_bucketed_degree_agg_has_no_exchange(spark, edge_table):
    """groupBy(source vertex) over the bucketed edge table must not
    shuffle — the write-once-shuffle-never property that makes degree /
    component probes O(edges-read) instead of O(edges-shuffled)."""
    sym = spark.table(EDGE_TABLE)
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    text = plans.explain_text(deg, "simple")
    assert "Exchange" not in text, text


def test_bucketed_frontier_join_shuffles_frontier_only(spark, edge_table):
    """A BFS frontier joining the bucketed edge set on the vertex key
    must exchange ONLY the (small) frontier side; the edge table is
    already hash-distributed by the bucketing."""
    sym = spark.table(EDGE_TABLE)
    frontier = spark.range(0, 64).select(F.col("id").alias("doc"))
    j = frontier.join(sym, frontier.doc == sym.a)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        text = plans.explain_text(j, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert text.count("Exchange") == 1, text
    assert "SortMergeJoin" in text, text


def test_edge_table_bodies_match_registered_queries(spark, edge_table):
    """Same histograms from the maintained table as from the
    self-contained registered queries."""
    sym = spark.table(EDGE_TABLE)
    d = t(spark, SF_SMOKE, "documents")
    seeds = d.select(F.col("doc_id").alias("doc")).filter(
        F.col("doc") % BFS_SEED_MOD == 0
    )
    via_table = sorted(tuple(r) for r in bfs_hops_histogram(seeds, sym).collect())
    via_query = sorted(
        tuple(r) for r in QUERIES["graph_bfs_reach"].fn(spark, SF_SMOKE).collect()
    )
    assert via_table == via_query
    assert via_table  # non-vacuous: the smoke corpus has real near-dups

    dd_table = sorted(tuple(r) for r in degree_log_histogram(sym).collect())
    dd_query = sorted(
        tuple(r)
        for r in QUERIES["graph_degree_distribution"].fn(spark, SF_SMOKE).collect()
    )
    assert dd_table == dd_query
    assert dd_table
