"""Runtime bloom-filter join pruning — the scan-reduction feature that
matters at 100 TB: when a shuffle join's build side carries a selective
filter, Spark injects a `bloom_filter_agg` over the build keys and a
`might_contain` predicate on the probe-side SCAN, so most non-matching
fact rows die before the shuffle instead of after it.

Local corpus sizes sit below the default application-side threshold
(10 GB), so the test lowers the thresholds to prove the machinery —
production keeps the defaults, where the filter kicks in exactly when the
probe side is big enough for pruning to pay."""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.sources import read_corpus_table

from .conftest import SF_ORACLE

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # shuffle join, the bloom target
}


def _urgent_join(spark):
    li = read_corpus_table(spark, SF_ORACLE, "lineitem")
    o = read_corpus_table(spark, SF_ORACLE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_prunes_probe_scan(spark):
    baseline = {r["o_orderpriority"]: r["n"] for r in _urgent_join(spark).collect()}

    old = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        df = _urgent_join(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "probe side missing the runtime bloom predicate"
        assert "bloom_filter_agg" in plan, "build side missing the bloom aggregate"
        # the predicate must sit on the lineitem (probe) branch, keyed by l_orderkey
        bloom_line = next(ln for ln in plan.splitlines() if "might_contain" in ln)
        assert "l_orderkey" in bloom_line
        # row-level pruning never changes the result
        filtered = {r["o_orderpriority"]: r["n"] for r in df.collect()}
        assert filtered == baseline
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
