"""PageRank semantics on a known graph, beyond oracle agreement.

A star graph (hub connected to n leaves, undirected) has a closed-form
fixpoint: the hub's rank must exceed any leaf's, and all leaves must tie
exactly (integer arithmetic → exact equality, no tolerance).  Also pins
rank-mass conservation within damping bounds: each iteration's total is
15% * SCALE * |V| + 85% of distributed mass, so the total stays within
floor-rounding of |V| * SCALE.
"""

from __future__ import annotations

# queries first: full package init (operator registration) before
# importing operator internals
from naive_query_engine_spark.queries import QUERIES  # noqa: F401
from naive_query_engine_spark.operators.clustering import (  # noqa: E402
    PR_SCALE,
    pagerank_int,
)


def _star_edges(spark, n_leaves: int):
    rows = [(0, i) for i in range(1, n_leaves + 1)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_star_graph_hub_dominates_and_leaves_tie(spark):
    n = 8
    ranks = {r["node"]: r["rank"] for r in pagerank_int(_star_edges(spark, n)).collect()}
    assert set(ranks) == set(range(n + 1))
    hub = ranks[0]
    leaves = {ranks[i] for i in range(1, n + 1)}
    assert len(leaves) == 1, f"leaves must tie exactly, got {leaves}"
    assert hub > leaves.pop()


def test_rank_mass_bounded(spark):
    n = 8
    total = sum(r["rank"] for r in pagerank_int(_star_edges(spark, n)).collect())
    n_nodes = n + 1
    # damping preserves mass up to floor rounding: each of PR_ITERS
    # iterations can lose at most 1 micro-unit per edge-contribution plus
    # 1 per node update; a loose but sufficient envelope:
    assert total <= n_nodes * PR_SCALE
    assert total >= n_nodes * PR_SCALE - 3 * (2 * n + n_nodes)


def test_pagerank_query_shape(spark):
    from tests.conftest import SF_ORACLE

    out = QUERIES["graph_pagerank"].fn(spark, SF_ORACLE).collect()
    assert [r["rnk"] for r in out] == list(range(1, len(out) + 1))
    ranks = [r["pagerank_micro"] for r in out]
    assert ranks == sorted(ranks, reverse=True)
    # suppliers (odd ids) are the high-degree side of the bipartite graph
    # (each supplier serves many customers), so the top of the ranking
    # must contain at least one supplier node
    assert any(r["node"] % 2 == 1 for r in out)
