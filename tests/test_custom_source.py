"""Python DataSource API: the reference's TableSource extension point."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from naive_query_engine_spark.sources import synthetic


@pytest.fixture(scope="module")
def registered(spark):
    synthetic.register(spark)
    return spark


def test_custom_source_reads(registered):
    df = (
        registered.read.format("synthetic_events")
        .option("rows", 1000)
        .option("partitions", 8)
        .load()
    )
    assert df.count() == 1000
    assert dict(df.dtypes) == {
        "event_id": "bigint", "user_id": "bigint",
        "event_type": "string", "value": "double",
    }
    assert df.rdd.getNumPartitions() == 8


def test_custom_source_deterministic_across_partitioning(registered):
    a = (
        registered.read.format("synthetic_events")
        .option("rows", 500).option("partitions", 1).load().collect()
    )
    b = (
        registered.read.format("synthetic_events")
        .option("rows", 500).option("partitions", 7).load().collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_custom_source_through_sql_and_aggregation(registered):
    df = (
        registered.read.format("synthetic_events")
        .option("rows", 2000).option("partitions", 4).load()
    )
    df.createOrReplaceTempView("synth_events")
    out = registered.sql(
        "SELECT event_type, count(*) AS n FROM synth_events GROUP BY event_type"
    ).collect()
    assert sum(r.n for r in out) == 2000
    assert len(out) == 5  # all five event types appear

    # filters compose like any relation
    n = df.filter(F.col("user_id") < 10).count()
    assert 0 < n < 2000
