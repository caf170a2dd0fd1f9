"""Behavioral invariants for round-5 operators (independent local
recomputes, per the landing discipline)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_join_size_estimator_bounds(spark):
    """CM inner product over-estimates (collisions only add) and, at
    w=65536 with these table sizes, stays within a few percent; the true
    side must equal an independent pandas recompute."""
    r = QUERIES["sketch_join_size_estimate"].fn(spark, SF_SMOKE).collect()[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")["user_id"].value_counts()
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")["o_custkey"].value_counts()
    true_rows = int((ev * o).dropna().sum())
    assert r["true_rows"] == true_rows
    assert r["est_rows"] >= r["true_rows"]  # CM never undercounts
    assert r["est_over_true"] < 1.25, r["est_over_true"]
