"""Custom aggregation via grouped-map Pandas (the UDAF surface).

The reference's only extension point is the compiled-in Rust
``AggregateOperator`` trait (aggregate/mod.rs:225-235).  The Spark-native
equivalent for aggregations the built-ins can't express is
``groupBy(...).applyInPandas`` — per-group Arrow batches into a Python
function, one shuffle on the group key, state bounded by group size.

Demonstrated with an order-statistics aggregate (median inter-event gap):
medians need the whole group, so they're exactly the case built-in partial
aggregation cannot handle.  Gaps are exact integer microseconds, so the
median (avg of two middle ints at worst) is deterministic across engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import epoch_micros, query, t

GAP_SCHEMA = "user_id long, median_gap_us double, n_gaps long"


def median_inter_event_gap(events: DataFrame) -> DataFrame:
    """Per-user median gap between consecutive events (µs precision).

    The kernel is a local closure, NOT a module-level function: closures
    cloudpickle by value, so executors never need this package importable
    (the driver harness runs from an arbitrary cwd)."""

    def _median_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        gaps = pdf["gap_us"]
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "median_gap_us": [float(gaps.median())],
                "n_gaps": [int(len(gaps))],
            }
        )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "user_id",
            (epoch_micros("ts") - F.lag(epoch_micros("ts")).over(w)).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("user_id").applyInPandas(_median_gap, GAP_SCHEMA)


@query(
    "custom_agg_median_gap",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(MEDIAN(gap_us) AS DOUBLE) AS median_gap_us,
           CAST(COUNT(gap_us) AS BIGINT)  AS n_gaps
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("udaf", "pandas-udf", "aggregate"),
)
def custom_agg_median_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median inter-event gap per user via applyInPandas (grouped-map UDAF)."""
    return median_inter_event_gap(t(spark, sf_dir, "events"))


@query(
    "agg_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_quantity,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, l_quantity,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM g
    )
    SELECT l_returnflag,
           CAST(MIN(l_quantity) AS DOUBLE) AS weighted_median_qty
    FROM c WHERE cum * 2 >= tot
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "weighted-median", "order-statistic"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (revenue-weighted median order quantity per
    return flag): the smallest q whose cumulative weight reaches half the
    total.  Unlike the grouped-map median UDAF above, this never ships
    whole groups to Python: collapsing to the DISTINCT value domain first
    (groupBy flag+quantity) makes the cumulative window run over the
    value-domain frame — bounded by distinct quantities (~50), not rows —
    so the shape survives any corpus size.  Every weight is a DECIMAL sum
    and the half-total test is ``cum*2 >= tot`` in decimals — no float
    accumulation, no division, exact in both engines."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("w")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("tot"),
    )
    return (
        c.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").cast("double").alias("weighted_median_qty"))
    )


@query(
    "agg_mode_exact",
    oracle="""
    SELECT o_orderstatus, mode_priority, CAST(mode_count AS BIGINT) AS mode_count
    FROM (
      SELECT o_orderstatus, o_orderpriority AS mode_priority,
             COUNT(*) AS mode_count,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ) t WHERE rn = 1
    """,
    tags=("aggregate", "mode", "order-statistic"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC mode per group (most frequent order priority per
    order status, lowest value on count ties).  Spark's builtin
    ``F.mode`` is documented non-deterministic on ties (and DuckDB's
    ``mode()`` makes its own tie choice), so a hash-stable mode must be
    the two-level formulation: count (group, value) pairs — map-side
    combinable, the heavy stage — then a value-cardinality-bounded
    ROW_NUMBER over (count DESC, value).  The window never sees corpus
    rows, only one row per distinct (status, priority) — mode at 100 TB
    is an aggregation problem, not a sort problem."""
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("mode_count")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("mode_count").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("mode_count").cast("long").alias("mode_count"),
        )
    )
