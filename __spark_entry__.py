"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``naive_query_engine_spark.queries.QUERIES`` — the registry
where every operator from SURVEY.md §2 (plus the pipeline extensions) is
declared once as (Spark fn, DuckDB oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from naive_query_engine_spark import queries as _queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _queries.QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every implemented query/operator, keyed by SURVEY §2-derived name."""
    return {name: spec.fn for name, spec in _queries.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in _queries.QUERIES.items()
        if spec.oracle is not None
    }
