"""Sketch aggregations with hash-checkable accuracy contracts.

Approximate aggregates (HyperLogLog++ distinct counts, t-digest-style
quantiles) are how 100 TB pipelines afford per-key cardinalities and
distribution summaries: constant memory, one pass, mergeable partials —
versus an exact COUNT(DISTINCT) whose shuffle grows with cardinality.

The sketch VALUES cannot be oracle-compared (DuckDB's estimators differ
bit-for-bit), so each query exports the contract instead: the exact
answer plus a boolean ``within_tolerance`` computed Spark-side from the
sketch.  The oracle asserts the exact answer and ``true`` — if a Spark
upgrade or a data change pushes the sketch outside its advertised error
bound, the value-hash breaks and the driver flags it.  (Spark's HLL++ and
percentile_approx are deterministic for a given dataset: their merges are
commutative, so partition order doesn't change the estimate.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query, t

#: relative-error budget for approx_count_distinct (HLL++ rsd=0.02 →
#: 3-sigma ≈ 6%; 5% flags anything beyond normal estimator behavior)
HLL_TOLERANCE = 0.05
#: absolute rank tolerance for percentile_approx at accuracy=10000
PCT_ACCURACY = 10_000


@query(
    "sketch_approx_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS within_tolerance
    FROM lineitem
    """,
    tags=("sketch", "aggregate", "approximate"),
)
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct count of lineitem part keys, exported as its
    accuracy contract: exact count + |approx − exact|/exact ≤ 5%."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").alias("n_exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_approx"),
    )
    rel_err = (
        F.abs(F.col("n_approx") - F.col("n_exact")).cast("double") / F.col("n_exact")
    )
    return agg.select(
        F.col("n_exact").cast("long").alias("n_exact"),
        (rel_err <= HLL_TOLERANCE).alias("within_tolerance"),
    )


@query(
    "sketch_approx_quantiles",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_ok, TRUE AS p95_ok
    FROM lineitem
    """,
    tags=("sketch", "aggregate", "approximate", "quantile"),
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx on l_extendedprice, exported as its rank
    contract: the approximate p50/p95 must sit within ±1% of the row
    count in TRUE rank position (checked by counting rows at or below
    the estimate — exact integer comparisons, no float summation)."""
    li = t(spark, sf_dir, "lineitem")
    approx = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], PCT_ACCURACY).alias("qs"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.col("qs")[0].alias("p50_est"), F.col("qs")[1].alias("p95_est"), "n_rows"
    )
    ranks = li.crossJoin(approx).agg(
        F.first("n_rows").alias("n_rows"),
        F.sum(F.when(F.col("l_extendedprice") <= F.col("p50_est"), 1).otherwise(0)).alias(
            "rank50"
        ),
        F.sum(F.when(F.col("l_extendedprice") <= F.col("p95_est"), 1).otherwise(0)).alias(
            "rank95"
        ),
    )
    tol = F.col("n_rows") / 100  # ±1% of rows
    return ranks.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.abs(F.col("rank50") - F.col("n_rows") * 0.5) <= tol).alias("p50_ok"),
        (F.abs(F.col("rank95") - F.col("n_rows") * 0.95) <= tol).alias("p95_ok"),
    )


@query(
    "sketch_hll_mergeable",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS merged_within_tolerance,
           TRUE AS merge_equals_direct
    FROM events
    """,
    tags=("sketch", "aggregate", "approximate", "mergeable"),
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes sketches a 100 TB primitive: MERGEABILITY.
    Distinct users are sketched independently per event_type (the shape of
    a partitioned/incremental pipeline: sketch each shard or day, store
    the bytes), then the partial sketches are union-merged — the merged
    estimate must (a) sit within the HLL tolerance of the exact global
    distinct and (b) equal the single-pass whole-dataset sketch exactly
    (HLL union is a coordinate-wise max: merging partials loses nothing
    vs sketching the whole).  Contract export only — sketch bytes differ
    across engines (see module docstring)."""
    ev = t(spark, sf_dir, "events")
    per_group = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_merged")
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n_direct"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    rel_err = (
        F.abs(F.col("n_merged") - F.col("n_exact")).cast("double") / F.col("n_exact")
    )
    return direct.crossJoin(merged).select(
        F.col("n_exact").cast("long").alias("n_exact"),
        (rel_err <= HLL_TOLERANCE).alias("merged_within_tolerance"),
        (F.col("n_merged") == F.col("n_direct")).alias("merge_equals_direct"),
    )


@query(
    "events_wau_sliding",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events)
    SELECT CAST(dd.d AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau_exact,
           TRUE AS hll_ok
    FROM days dd JOIN du u ON u.d BETWEEN dd.d - 6 AND dd.d
    GROUP BY dd.d
    """,
    tags=("events", "window", "sketch", "mergeable"),
)
def events_wau_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day active users per day — the canonical "WAU" rollup.

    Exact path: dedupe to (day, user) once (the only shuffle that scales
    with raw volume), then explode each presence to the <=7 window-end
    days it supports and count distinct per window — fan-out is a
    constant 7x of the *deduped* set, never of raw events.

    Scale path, verified as a contract: one HLL sketch per day (constant
    bytes/day), the same 7x explode over SKETCH ROWS, union-merge per
    window — at 100 TB the window pass touches kilobytes per day instead
    of re-scanning user ids, and mergeability (see
    ``sketch_hll_mergeable``) makes it lossless vs sketching each window
    directly.  ``hll_ok`` asserts the merged estimate stays within 5% of
    the exact count for every window."""
    ev = t(spark, sf_dir, "events")
    window_ends = [F.date_add(F.col("d"), i) for i in range(7)]
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    exact = (
        du.select(F.explode(F.array(*window_ends)).alias("d"), "user_id")
        .join(days, "d")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau_exact"))
    )
    daily_sk = du.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = (
        daily_sk.select(F.explode(F.array(*window_ends)).alias("d"), "sk")
        .join(days, "d")
        .groupBy("d")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_hll"))
    )
    rel_err = (
        F.abs(F.col("wau_hll") - F.col("wau_exact")).cast("double") / F.col("wau_exact")
    )
    return exact.join(merged, "d").select(
        F.col("d").cast("string").alias("day"),
        F.col("wau_exact").cast("long").alias("wau_exact"),
        (rel_err <= HLL_TOLERANCE).alias("hll_ok"),
    )
