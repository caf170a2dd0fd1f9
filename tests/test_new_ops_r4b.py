"""Behavioral invariants for the late-round-4 operators.

The DuckDB oracle (tests/test_oracle.py) already pins exact values; these
tests pin the PROPERTIES that make each operator correct by construction,
so a future edit that happens to move both engines the same wrong way
still fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators.custom_agg import agg_weighted_median
from naive_query_engine_spark.operators.analytics import (
    events_cumulative_unique_users,
)
from naive_query_engine_spark.operators.pipeline import mv_incremental_refresh
from naive_query_engine_spark.operators.similarity import (
    OUTLIER_K,
    embedding_centroid_outliers,
)
from naive_query_engine_spark.queries import t

from .conftest import SF_ORACLE


def test_weighted_median_halves_the_weight(spark):
    """For each flag, qty <= median holds >= half the total revenue weight
    AND qty < median holds < half — the two-sided defining property."""
    med = {
        r.l_returnflag: r.weighted_median_qty
        for r in agg_weighted_median(spark, SF_ORACLE).collect()
    }
    li = t(spark, SF_ORACLE, "lineitem").select(
        "l_returnflag", "l_quantity", F.col("l_extendedprice").cast("decimal(12,2)").alias("w")
    )
    for flag, m in med.items():
        grp = li.filter(F.col("l_returnflag") == flag)
        tot = grp.agg(F.sum("w")).collect()[0][0]
        le = grp.filter(F.col("l_quantity") <= m).agg(F.sum("w")).collect()[0][0]
        lt = grp.filter(F.col("l_quantity") < m).agg(F.sum("w")).collect()[0][0] or 0
        assert le * 2 >= tot, (flag, m)
        assert lt * 2 < tot, (flag, m)


def test_cumulative_users_reconciles_and_is_monotone(spark):
    rows = sorted(
        events_cumulative_unique_users(spark, SF_ORACLE).collect(),
        key=lambda r: r.day,
    )
    assert rows[0].new_users == rows[0].cum_users
    for a, b in zip(rows, rows[1:]):
        assert b.cum_users == a.cum_users + b.new_users  # exact telescoping
    n_users = t(spark, SF_ORACLE, "events").select("user_id").distinct().count()
    assert rows[-1].cum_users == n_users  # curve ends at total uniques


def test_mv_refresh_equals_full_recompute(spark):
    """Merged partials == full recompute — the algebraic-aggregate law the
    operator exists to demonstrate (also the oracle, re-pinned here
    engine-internally so it holds at any SF the oracle never sees)."""
    full = (
        t(spark, SF_ORACLE, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("revenue"),
        )
    )
    merged = mv_incremental_refresh(spark, SF_ORACLE)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_leakage_safe_split_never_straddles_a_component(spark):
    """The defining guarantee: no near-dup component has documents on
    both sides of the split (per-doc derivation, independent of the
    registered query's aggregated output)."""
    from naive_query_engine_spark.operators.clustering import connected_components
    from naive_query_engine_spark.operators.dedup import ngram_jaccard_pairs
    from naive_query_engine_spark.operators.quality import TRAIN_BUCKETS, hash_bucket

    d = t(spark, SF_ORACLE, "documents")
    edges = ngram_jaccard_pairs(d).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    comp = connected_components(d.select(F.col("doc_id").alias("id")), edges)
    split = F.when(hash_bucket(F.col("component")) < TRAIN_BUCKETS, "train").otherwise(
        "test"
    )
    straddling = (
        comp.select("component", split.alias("split"))
        .groupBy("component")
        .agg(F.count_distinct("split").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert straddling == 0
    # and there IS at least one multi-doc component, or the guarantee is vacuous
    multi = (
        comp.groupBy("component").count().filter(F.col("count") > 1).count()
    )
    assert multi > 0


def test_peak_concurrency_matches_naive_global_sweep(spark):
    """The distributed prefix-sum sweep must equal the textbook
    single-partition-window sweep exactly (same boundaries, same tie
    order) — the whole point of the global_rank-style offset trick is
    changing the PLAN, never the result."""
    from naive_query_engine_spark.operators.events import events_peak_concurrency

    row = events_peak_concurrency(spark, SF_ORACLE).collect()[0]
    ev = t(spark, SF_ORACLE, "events")
    sess = ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = sess.select(
        F.col("w.start").alias("ts"), F.lit(1).alias("delta"), "user_id"
    ).unionByName(
        sess.select(F.col("w.end").alias("ts"), F.lit(-1).alias("delta"), "user_id")
    )
    from pyspark.sql import Window as W

    naive = (
        bounds.withColumn(
            "cum",
            F.sum("delta").over(
                W.orderBy("ts", "delta", "user_id").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        )
        .agg(F.max("cum"))
        .collect()[0][0]
    )
    assert row.peak_concurrency == naive
    assert 1 <= row.peak_concurrency <= row.n_sessions


def test_centroid_outliers_shape(spark):
    out = embedding_centroid_outliers(spark, SF_ORACLE).collect()
    by_label: dict[int, list] = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r)
    n_labels = t(spark, SF_ORACLE, "embeddings").select("label").distinct().count()
    assert len(by_label) == n_labels
    for label, rows in by_label.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, OUTLIER_K + 1)), label
        d = [r.dist2_scaled for r in rows]
        assert d == sorted(d, reverse=True), label  # farthest-first
        assert all(x >= 0 for x in d), label
