"""Salting must be result-invariant: salted == plain, always."""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators.skew import salted_agg, salted_join
from naive_query_engine_spark.queries import dec, t

from .conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain(spark):
    li = t(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = t(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    salted = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=4,
                         salt_on="l_quantity").select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_agg_equals_plain(spark):
    li = t(spark, SF_SMOKE, "lineitem").withColumn("qd", dec(F.col("l_quantity")))
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qd").alias("sq"),
        F.max("l_quantity").alias("mx"),
    )
    salted = salted_agg(
        li,
        "l_returnflag",
        {"n": ("qd", "count"), "sq": ("qd", "sum"), "mx": ("l_quantity", "max")},
        n_salts=4,
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_sketch_aggregates_close_to_exact(spark):
    """Sketches (HLL, t-digest) are engine-specific by design — graded
    against exact values with tolerance, not against the oracle."""
    ev = t(spark, SF_SMOKE, "events")
    r = ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5, 1000).alias("p50_approx"),
        F.percentile("value", 0.5).alias("p50_exact"),
    ).collect()[0]
    assert abs(r.approx_users - r.exact_users) <= max(2, 0.05 * r.exact_users)
    assert abs(r.p50_approx - r.p50_exact) <= 0.5


def test_aqe_splits_skewed_join(spark):
    """AQE detects and splits the hot partition at runtime — the first line
    of defense before explicit salting (thresholds shrunk so the test-size
    hot key qualifies).  NOTE: inspect the DataFrame's OWN QueryExecution
    after collect(); write()/count() execute cloned plans."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id")).alias("k"),
            (F.rand(seed=7) * 1e9).cast("long").alias("v"),
        )
        right = spark.range(2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = left.join(right, "k")
        rows = j.collect()
        assert len(rows) == 101000  # 100k hot-key rows + 1k distinct odd keys
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
