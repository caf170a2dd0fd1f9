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
