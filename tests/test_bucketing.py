"""Bucketed-table co-located join: the write-once-shuffle-never pattern.

Two tables bucketed on their join keys with equal bucket counts must join
with NO Exchange on either side — the property that turns a repeated
fact-fact join from a cluster-wide shuffle into a local merge at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from naive_query_engine_spark import plans
from naive_query_engine_spark.queries import t
from naive_query_engine_spark.sources import write_bucketed

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    write_bucketed(
        t(spark, SF_SMOKE, "lineitem"), "b_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        t(spark, SF_SMOKE, "orders"), "b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    # force the shuffle-join path so bucketing (not broadcast) is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        text = plans.explain_text(joined, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in text, text
    assert "SortMergeJoin" in text, text


def test_bucketed_join_correct(spark, bucketed_tables):
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert n == t(spark, SF_SMOKE, "lineitem").count()


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key needs no exchange either."""
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    text = plans.explain_text(agg, "simple")
    assert "Exchange" not in text, text
