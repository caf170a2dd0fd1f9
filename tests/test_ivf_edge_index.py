"""Persistent bucketed IVF edge index (the maintained-index form of the
r7 substrate).

The five IVF-substrate queries ride a session cache; at 100 TB the
substrate is a MAINTAINED table.  These tests pin

1. per-vertex aggregation over the bucketed table is exchange-free (the
   groupBy key is the bucket key),
2. the neighbor-lookup probe join is exchange-free on the INDEX side
   (the serving-path property), and
3. the table's contents equal the session-built edge frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from naive_query_engine_spark import plans
from naive_query_engine_spark.operators.kmeans import (
    ivf_mutual_knn_edges,
    write_ivf_edge_index,
)

from .conftest import SF_SMOKE

INDEX_TABLE = "b_ivf_edge_index"


@pytest.fixture(scope="module")
def ivf_index(spark):
    write_ivf_edge_index(spark, SF_SMOKE, INDEX_TABLE, n_buckets=8)
    yield
    spark.sql(f"DROP TABLE IF EXISTS {INDEX_TABLE}")


def test_degree_aggregation_has_no_exchange(spark, ivf_index):
    """groupBy on the bucket key aggregates without any Exchange — the
    write-once-shuffle-never property for the graph-overlay rollups."""
    deg = spark.table(INDEX_TABLE).groupBy("vec_a").agg(
        F.count(F.lit(1)).alias("deg")
    )
    text = plans.explain_text(deg, "simple")
    assert "Exchange" not in text, text


def test_probe_join_is_exchange_free_on_index_side(spark, ivf_index):
    """A query-id set probing for neighbors exchanges ONLY itself; the
    index side reads bucket-aligned (exactly one Exchange in the plan,
    and it is the probe's)."""
    probe = spark.range(0, 50).select(F.col("id").alias("vec_a"))
    hits = spark.table(INDEX_TABLE).join(probe, "vec_a")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        text = plans.explain_text(hits, "simple")
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert text.count("Exchange") == 1, text
    assert "SortMergeJoin" in text, text


def test_table_matches_session_built_edges(spark, ivf_index):
    via_table = sorted(tuple(r) for r in spark.table(INDEX_TABLE).collect())
    via_session = sorted(
        tuple(r) for r in ivf_mutual_knn_edges(spark, SF_SMOKE).collect()
    )
    assert via_table == via_session and via_table
