"""Scaling probe: replicate the fact tables N× and measure headline queries.

The driver's corpus tops out at sf0.1 (600k lineitem rows, single-row-group
files).  This probe answers the question the small benches can't: do the
plans scale *linearly* when the data grows and (critically) when the input
arrives as MANY splits, the way a real 100 TB table would?

It synthesizes sf0.1 × N by unioning key-shifted copies, written as N
parquet files (so scans parallelize), then times a representative query
set.  Results land in one JSON line per scale for BASELINE.md.

Run: python tools/scale_probe.py [N ...]   (default 10 30)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from naive_query_engine_spark import get_spark  # noqa: E402
from naive_query_engine_spark.queries import QUERIES, t  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
PROBE_QUERIES = [
    "q01_pricing_summary",
    "q06_forecast_revenue",
    "join_inner_chain",
    "window_rank",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q07_nation_trade",
    "q09_profit_by_nation_year",
    "dedup_minhash_lsh",
    "similarity_cosine_pairs",
    # r4 additions: the rotated-in bench families + the learned-quantizer
    # path, so future rounds measure them at scale by default
    "dedup_substring_strided",
    "text_bm25_topk",
    "embedding_kmeans_lloyd",
    "similarity_ivf_kmeans_topk",
    # r4-late additions
    "agg_weighted_median",
    "events_cumulative_unique_users",
    "mv_incremental_refresh",
    "embedding_centroid_outliers",
    # r4c additions: the prefix-max skyline, the binning-free drift
    # statistic, and the hybrid-retrieval composition — future rounds
    # measure them at scale by default
    "part_skyline_pareto",
    "events_value_drift_ks",
    "retrieval_rrf_fusion",
    # r9 additions: the PIT feature backfill, the snapshot diff, the
    # WebDataset TAR index, and the IVF-PQ serving scan — future rounds
    # measure them at scale by default.  (The maintenance tick is
    # deliberately absent: at the registered fixed K its cost is the
    # documented O(n²/K) calibration artifact; its scale story is the
    # grow-K probe rows in BASELINE.md.)
    "features_pit_backfill",
    "orders_snapshot_diff",
    "multimodal_tar_member_index",
    "similarity_ivfpq_adc_topk",
]
#: tables that must scale with N.  In TPC-H *everything except nation and
#: region* grows linearly with SF — including customer/supplier/part, which
#: is why forced broadcast hints on them were the r1 scale bug.  Scaling
#: them here lets the probe show AQE switching those joins to shuffle
#: strategy once they cross autoBroadcastJoinThreshold.
FACTS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def synthesize(spark, n_copies: int, out_dir: str) -> None:
    # SPARK_GRAFT_PROBE_TABLES=embeddings,events replicates only those
    # fact tables (the rest are linked at 1x) — for targeted re-measures
    # of queries that touch a known table subset, where synthesizing all
    # eight facts at 10-100x would dominate the probe's wall-clock.
    sel = os.environ.get("SPARK_GRAFT_PROBE_TABLES")
    scaled = {s.strip() for s in sel.split(",")} if sel else set(FACTS)
    for name in ("region", "nation"):
        shutil.copy(f"{BASE_SF}/{name}.parquet", f"{out_dir}/{name}.parquet")
    for name in set(FACTS) - scaled:
        shutil.copy(f"{BASE_SF}/{name}.parquet", f"{out_dir}/{name}.parquet")
    for name, key in FACTS.items():
        if name not in scaled:
            continue
        base = t(spark, BASE_SF, name)
        span = base.agg(F.max(key)).collect()[0][0] + 1
        copies = None
        for i in range(n_copies):
            c = base.withColumn(key, F.col(key) + F.lit(i * span))
            copies = c if copies is None else copies.unionAll(c)
        # one file per copy → scans parallelize like a real multi-split table
        copies.repartition(n_copies).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [10, 30]
    # SPARK_GRAFT_PROBE_QUERIES=a,b,c probes a subset (any registered
    # name) instead of the standard list — for targeted re-measures
    # without paying for the full set.
    global PROBE_QUERIES
    sel = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    if sel:
        PROBE_QUERIES = [q.strip() for q in sel.split(",") if q.strip()]
    spark = get_spark(app_name="nqes-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in scales:
        work = tempfile.mkdtemp(prefix=f"nqes-scale{n}-")
        try:
            t0 = time.perf_counter()
            synthesize(spark, n, work)
            synth_sec = round(time.perf_counter() - t0, 1)
            timings = {}
            join_strategies = {}
            for q in PROBE_QUERIES:
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    QUERIES[q].fn(spark, work).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                timings[q] = round(best, 3)
                # capture the AQE-final plan: execute through a count wrapper
                # (collects ONE row even for wide-output queries — collecting
                # the query itself OOMs the driver at 100× on e.g.
                # join_inner_chain's 60M rows) and read only the final-plan
                # section (AdaptiveSparkPlan prints initial + final).
                cnt = QUERIES[q].fn(spark, work).groupBy().count()
                cnt.collect()
                plan = cnt._jdf.queryExecution().executedPlan().toString()
                plan = plan.split("== Initial Plan ==")[0]
                join_strategies[q] = {
                    "broadcast_hash": plan.count("BroadcastHashJoin"),
                    "sort_merge": plan.count("SortMergeJoin"),
                    "shuffled_hash": plan.count("ShuffledHashJoin"),
                }
            print(json.dumps({
                "scale_x": n,
                "lineitem_rows": 600_000 * n,
                "synthesize_sec": synth_sec,
                "queries": timings,
                "join_strategies": join_strategies,
                "total": round(sum(timings.values()), 3),
            }))
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
