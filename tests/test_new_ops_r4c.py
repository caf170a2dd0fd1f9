"""Behavioral invariants for the r4c operators (skyline, attribution,
bounded-hop BFS, KS drift, winsorized mean, constraint audit, RRF fusion,
CUSUM change point, k-anonymity, CEP patterns, CUPED, clustering
coefficient, KMV sketch) and the prefix-max / multi-column prefix-sum
primitives.

The DuckDB oracle (tests/test_oracle.py) pins exact values for every
registered query; these tests pin the PROPERTIES that make each operator
correct by construction — several against independent local recomputes
(Python re, brute-force dominance/adjacency scans, argmax replays).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators.analytics import (
    events_attribution_last_touch,
    part_skyline_pareto,
)
from naive_query_engine_spark.operators.clustering import (
    BFS_MAX_HOPS,
    BFS_SEED_MOD,
    graph_bfs_reach,
)
from naive_query_engine_spark.operators.layout import distributed_prefix_max
from naive_query_engine_spark.queries import t

from .conftest import SF_ORACLE


def test_prefix_max_matches_local_exclusive_scan(spark):
    """distributed_prefix_max == a single-threaded exclusive running max,
    including NULL on the first row and across partition boundaries."""
    rows = [(i, v) for i, v in enumerate([5, 3, 9, 9, 1, 12, 0, 7])]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["pm"]
        for r in distributed_prefix_max(df, [F.col("k")], "v", "pm", n_parts=3)
        .collect()
    }
    expected, best = {}, None
    for k, v in rows:
        expected[k] = best
        best = v if best is None or v > best else best
    assert got == expected


def test_skyline_is_exactly_the_non_dominated_set(spark):
    """Independent O(n²)-on-collapsed-points check: a (price, size) point
    is in the output iff NO other point dominates it (<= price, >= size,
    one strict) — verified against the raw part table, not the oracle."""
    pts = (
        t(spark, SF_ORACLE, "part")
        .groupBy(
            F.col("p_retailprice").cast("decimal(12,2)").alias("price"),
            F.col("p_size").alias("size"),
        )
        .count()
        .collect()
    )
    points = [(float(r["price"]), r["size"]) for r in pts]
    non_dominated = {
        (p, s)
        for (p, s) in points
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for (p2, s2) in points
        )
    }
    got = {
        (r["price"], r["best_size"])
        for r in part_skyline_pareto(spark, SF_ORACLE).collect()
    }
    assert got == non_dominated


def test_attribution_partitions_all_purchases(spark):
    """Every purchase lands in exactly one channel; channels are only
    marketing touch types or 'organic'; revenue totals are conserved."""
    out = events_attribution_last_touch(spark, SF_ORACLE).collect()
    assert {r["channel"] for r in out} <= {"click", "view", "organic"}
    ev = t(spark, SF_ORACLE, "events").filter(F.col("event_type") == "purchase")
    n_purchases = ev.count()
    assert sum(r["n_conversions"] for r in out) == n_purchases
    total_rev = float(
        ev.agg(F.sum(F.col("value").cast("decimal(12,2)"))).collect()[0][0]
    )
    assert abs(sum(r["attributed_revenue"] for r in out) - total_rev) < 1e-6


def test_bfs_seeds_are_level_zero_and_hops_bounded(spark):
    """Level 0 is exactly the seed set; no hop exceeds the cap; level
    sizes can only shrink-or-grow within reach (sanity, not exactness —
    the oracle pins values)."""
    out = {r["hops"]: r for r in graph_bfs_reach(spark, SF_ORACLE).collect()}
    n_seeds = (
        t(spark, SF_ORACLE, "documents")
        .filter(F.col("doc_id") % BFS_SEED_MOD == 0)
        .count()
    )
    assert out[0]["n_docs"] == n_seeds
    assert out[0]["min_doc"] == 0
    assert max(out) <= BFS_MAX_HOPS


def test_prefix_sums_multi_matches_single(spark):
    """The multi-column prefix sum agrees with two single-column runs and
    with a local scan."""
    from naive_query_engine_spark.operators.layout import (
        distributed_prefix_sum,
        distributed_prefix_sums,
    )

    rows = [(i, i % 3, (i * 7) % 5) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    multi = {
        r["k"]: (r["a_cum"], r["b_cum"])
        for r in distributed_prefix_sums(df, [F.col("k")], ["a", "b"], n_parts=4)
        .collect()
    }
    ca = cb = 0
    for k, a, b in rows:
        ca, cb = ca + a, cb + b
        assert multi[k] == (ca, cb)
    single = {
        r["k"]: r["a_cum"]
        for r in distributed_prefix_sum(df, [F.col("k")], "a", "a_cum", n_parts=4)
        .collect()
    }
    assert single == {k: v[0] for k, v in multi.items()}


def test_ks_bounds_and_half_sizes(spark):
    """0 <= KS <= 1; the two halves partition the corpus; ks_num is the
    exact integer numerator of ks_stat."""
    from naive_query_engine_spark.operators.events import events_value_drift_ks
    from naive_query_engine_spark.queries import t as t_

    r = events_value_drift_ks(spark, SF_ORACLE).collect()[0]
    n_total = t_(spark, SF_ORACLE, "events").count()
    assert r["n_early"] + r["n_late"] == n_total
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert r["ks_num"] == round(r["ks_stat"] * r["n_early"] * r["n_late"])


def test_winsorized_mean_between_cuts_and_conserves_counts(spark):
    """lo_cut <= winsorized_mean <= hi_cut and the clipped counts are
    consistent with the percentile levels (~5% each side)."""
    from naive_query_engine_spark.operators.analytics import (
        events_value_winsorized,
    )

    for r in events_value_winsorized(spark, SF_ORACLE).collect():
        assert r["lo_cut"] <= r["winsorized_mean"] <= r["hi_cut"]
        # interpolated p05/p95: at most ~5% + 1 row clipped per side
        assert r["n_clipped_low"] <= r["n"] * 0.05 + 1
        assert r["n_clipped_high"] <= r["n"] * 0.05 + 1


def test_audit_constraints_finds_the_real_corpus_violation(spark):
    """The generated corpus is referentially intact (all FK + notnull
    checks report zero violations) — but its lineitem (l_orderkey,
    l_linenumber) "PK" is genuinely non-unique (the generator repeats
    line numbers), and the audit must REPORT that, not mask it.  The
    exact surplus is pinned by the DuckDB oracle; here we pin the
    pass/fail split."""
    from naive_query_engine_spark.operators.quality import audit_constraints

    rows = {r["constraint_name"]: r for r in audit_constraints(spark, SF_ORACLE).collect()}
    assert len(rows) == 8
    for name, r in rows.items():
        assert r["n_checked"] > 0, r
        if name == "pk_lineitem_unique":
            assert r["n_violations"] > 0, r  # the detector must fire
        else:
            assert r["n_violations"] == 0, r


def test_rrf_fusion_prefers_doubly_retrieved_docs(spark):
    """A neighbor present in BOTH lists at rank r scores strictly above a
    neighbor present in one list at the same rank; per-query output is
    exactly FUSED_TOP_K rows with distinct fused ranks 1..K."""
    from naive_query_engine_spark.operators.retrieval import (
        FUSED_TOP_K,
        retrieval_rrf_fusion,
    )

    out = retrieval_rrf_fusion(spark, SF_ORACLE).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert sorted(r["fused_rnk"] for r in rows) == list(
            range(1, FUSED_TOP_K + 1)
        )
    both = [r for r in out if r["lex_rank"] is not None and r["dense_rank"] is not None]
    single = [r for r in out if (r["lex_rank"] is None) != (r["dense_rank"] is None)]
    for b in both:
        for s in single:
            srank = s["lex_rank"] if s["lex_rank"] is not None else s["dense_rank"]
            if srank >= min(b["lex_rank"], b["dense_rank"]):
                assert b["rrf_fp"] > s["rrf_fp"], (b, s)


def test_cusum_changepoint_matches_local_argmax(spark):
    """The reported change day is the argmax of |n·cum_k − k·total| over a
    locally recomputed daily series, and the means are the exact
    before/after averages."""
    from naive_query_engine_spark.operators.events import (
        events_changepoint_cusum,
    )

    r = events_changepoint_cusum(spark, SF_ORACLE).collect()[0]
    daily = sorted(
        (str(row["day"]), row["c"])
        for row in t(spark, SF_ORACLE, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    total = sum(c for _, c in daily)
    n = len(daily)
    best, cum = None, 0
    for k, (day, c) in enumerate(daily, start=1):
        cum += c
        s = abs(n * cum - k * total)
        if best is None or s > best[0] or (s == best[0] and day < best[1]):
            best = (s, day, k, cum)
    assert r["change_day"] == best[1]
    assert r["cusum_scaled"] == best[0]
    assert r["days_before"] == best[2]
    assert r["mean_before"] == best[3] / best[2]


def test_k_anonymity_counts_are_consistent(spark):
    """Cell counts partition the table; exposed rows are bounded by
    n_small_cells * (K_ANON - 1)."""
    from naive_query_engine_spark.operators.quality import (
        K_ANON,
        audit_k_anonymity,
    )

    r = audit_k_anonymity(spark, SF_ORACLE).collect()[0]
    n_customers = t(spark, SF_ORACLE, "customer").count()
    assert r["n_cells"] > 0 and r["min_cell"] >= 1
    assert r["n_exposed_rows"] <= r["n_small_cells"] * (K_ANON - 1)
    assert 0.0 <= r["exposed_share"] <= 1.0
    # exposed_share denominator is the full table
    assert abs(r["exposed_share"] - r["n_exposed_rows"] / n_customers) < 1e-12


def test_sequence_patterns_match_python_regex(spark):
    """Each pattern's user count equals a locally recomputed count over
    per-user symbol strings built with Python's re — independent of both
    engines' SQL regex paths."""
    import re as _re

    from naive_query_engine_spark.operators.events import (
        CEP_PATTERNS,
        events_sequence_patterns,
    )

    rows = (
        t(spark, SF_ORACLE, "events")
        .select("user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("sym"))
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["sym"]))
    strings = ["".join(s for _, _, s in sorted(v)) for v in by_user.values()]
    expected = {
        name: sum(1 for s in strings if _re.search(pat, s))
        for name, pat in CEP_PATTERNS
    }
    got = {
        r["pattern"]: r["n_users"]
        for r in events_sequence_patterns(spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_cuped_is_unbiased_and_reduces_variance(spark):
    """CUPED must (a) leave the OVERALL weighted mean unchanged (the
    adjustment is mean-zero across all users), (b) share one theta across
    arms, and (c) report rho_sq in [0, 1] equal to the squared Pearson
    correlation of locally recomputed per-user (pre, post) pairs."""
    from naive_query_engine_spark.operators.analytics import events_ab_cuped
    from naive_query_engine_spark.queries import epoch_micros

    out = {r["arm"]: r for r in events_ab_cuped(spark, SF_ORACLE).collect()}
    assert set(out) == {"A", "B"}
    a, b = out["A"], out["B"]
    assert a["theta"] == b["theta"] and a["rho_sq"] == b["rho_sq"]
    assert 0.0 <= a["rho_sq"] <= 1.0
    # weighted mean of adjusted == weighted mean of raw (mean-zero adjustment)
    n = a["n_users"] + b["n_users"]
    raw = (a["mean_post"] * a["n_users"] + b["mean_post"] * b["n_users"]) / n
    adj = (a["adjusted_mean"] * a["n_users"] + b["adjusted_mean"] * b["n_users"]) / n
    assert abs(raw - adj) < 1e-9
    # rho_sq against a local recompute
    ev = t(spark, SF_ORACLE, "events")
    us = epoch_micros(F.col("ts"))
    mid = ev.agg(F.floor((F.min(us) + F.max(us)) / F.lit(2.0)).cast("long")).collect()[0][0]
    rows = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(us < F.lit(mid), 1).otherwise(0)).alias("pre"),
            F.sum(F.when(us >= F.lit(mid), 1).otherwise(0)).alias("post"),
        )
        .collect()
    )
    import math
    n = len(rows)
    sx = sum(r["pre"] for r in rows); sy = sum(r["post"] for r in rows)
    sxx = sum(r["pre"] ** 2 for r in rows); syy = sum(r["post"] ** 2 for r in rows)
    sxy = sum(r["pre"] * r["post"] for r in rows)
    rho_sq = ((n * sxy - sx * sy) ** 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert math.isclose(a["rho_sq"], rho_sq, rel_tol=1e-12)


def test_clustering_coefficient_consistent_with_triangle_list(spark):
    """C = 3T/W identity against locally recomputed wedge and triangle
    counts from the SAME graph (brute-force over the collapsed edge
    list — independent of the oriented enumeration)."""
    from itertools import combinations

    from naive_query_engine_spark.operators.clustering import (
        _cosupplier_graph,
        graph_clustering_coefficient,
    )

    r = graph_clustering_coefficient(spark, SF_ORACLE).collect()[0]
    edges_df, _, _ = _cosupplier_graph(spark, SF_ORACLE)
    edges = {(row["u"], row["v"]) for row in edges_df.collect()}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    # each triangle counted once: from its (u, v) edge with the third
    # vertex strictly greater than both endpoints
    triangles = 0
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v and w > u:
                triangles += 1
    assert r["n_edges"] == len(edges)
    assert r["wedges"] == wedges
    assert r["n_triangles"] == triangles
    if wedges:
        assert abs(r["global_clustering"] - 3 * triangles / wedges) < 1e-12


def test_kmv_estimates_within_theory_bounds(spark):
    """KMV at K=64: union/intersection estimates within 3-sigma
    (~3/sqrt(K-1) ≈ 38%) of exact; jaccard in [0,1]; the sketch is
    saturated at this SF (the sub-K degenerate branch is covered by the
    sf0.001 oracle run, where it must equal the exact count)."""
    from naive_query_engine_spark.operators.sketches import (
        KMV_K,
        sketch_kmv_jaccard,
    )

    r = sketch_kmv_jaccard(spark, SF_ORACLE).collect()[0]
    assert r["sketch_size"] == KMV_K  # saturated at sf0.01
    assert 0.0 <= r["est_jaccard"] <= 1.0
    bound = 3.0 / (KMV_K - 1) ** 0.5
    assert abs(r["est_union"] - r["exact_union"]) / r["exact_union"] <= bound
    assert (
        abs(r["est_intersection"] - r["exact_intersection"])
        / max(r["exact_intersection"], 1)
        <= 2 * bound  # two estimator factors compound
    )


def test_sla_buckets_are_monotone_and_partition(spark):
    """30d ⊆ 60d ⊆ 90d ⊆ all; rates consistent with counts."""
    from naive_query_engine_spark.operators.analytics import (
        orders_shipping_latency_sla,
    )

    for r in orders_shipping_latency_sla(spark, SF_ORACLE).collect():
        assert (
            r["n_within_30d"] <= r["n_within_60d"] <= r["n_within_90d"] <= r["n_lineitems"]
        )
        assert abs(r["sla_30d_rate"] - r["n_within_30d"] / r["n_lineitems"]) < 1e-12
        assert r["max_days"] >= 0


def test_growth_accounting_identities(spark):
    """active(w) = new + retained + resurrected (recomputed independently
    from the (user, week) frame) and churned(w) = active(w-1) −
    retained(w) — the accounting must balance exactly."""
    from naive_query_engine_spark.operators.analytics import (
        events_growth_accounting,
    )
    from naive_query_engine_spark.queries import floordiv_col

    out = {r["week"]: r for r in events_growth_accounting(spark, SF_ORACLE).collect()}
    week = floordiv_col(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-05"))).cast("long"),
        F.lit(7).cast("long"),
    )
    active = {
        r["week"]: r["n"]
        for r in t(spark, SF_ORACLE, "events")
        .select("user_id", week.alias("week"))
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for w, r in out.items():
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == active[w]
        if w - 1 in active:
            assert r["n_churned"] == active[w - 1] - r["n_retained"]


def test_elasticity_matches_numpy_polyfit(spark):
    """Per-brand slope/intercept equal numpy's least-squares fit over the
    same (discount_pct, quantity) pairs — an independent solver."""
    import numpy as np

    from naive_query_engine_spark.operators.analytics import (
        orders_discount_elasticity,
    )

    out = {r["p_brand"]: r for r in orders_discount_elasticity(spark, SF_ORACLE).collect()}
    li = t(spark, SF_ORACLE, "lineitem")
    p = t(spark, SF_ORACLE, "part")
    rows = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long").alias("d"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .collect()
    )
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append((r["d"], r["q"]))
    for brand, pts in by_brand.items():
        xs = np.array([x for x, _ in pts], dtype=float)
        ys = np.array([y for _, y in pts], dtype=float)
        if np.ptp(xs) == 0:
            assert out[brand]["slope_qty_per_pct"] is None
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(out[brand]["slope_qty_per_pct"] - slope) < 1e-8
        assert abs(out[brand]["intercept_qty"] - intercept) < 1e-6


def test_incremental_curation_equals_batch_for_any_split(spark):
    """The merge law: partials from ANY batch split merge into the full
    recompute — checked against pipeline_corpus_curation (the single-pass
    form) for a different split than the registered query's %5."""
    from naive_query_engine_spark.operators.pipeline import (
        curation_partials,
        pipeline_corpus_curation,
    )

    d = t(spark, SF_ORACLE, "documents")
    parts = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    state = None
    for p in parts:
        pp = curation_partials(p)
        state = pp if state is None else state.unionAll(pp)
    kept = (
        state.groupBy("fp").agg(F.min("s").alias("s")).select("s.*")
    )
    got = {
        r["predicted_lang"]: (r["n_docs"], r["total_bpe_tokens"])
        for r in kept.groupBy("predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
        )
        .collect()
    }
    want = {
        r["predicted_lang"]: (r["n_docs"], r["total_bpe_tokens"])
        for r in pipeline_corpus_curation(spark, SF_ORACLE).collect()
    }
    assert got == want


def test_dedup_cascade_stage_accounting(spark):
    """Stages chain (kept_i == in_{i+1}), counts are monotone, removed
    balances, and un-embedded survivors PASS THROUGH the semantic stage
    (kept >= in - n_embedded — the sf0.1 oracle caught the draft that
    dropped them)."""
    from naive_query_engine_spark.operators.pipeline import (
        pipeline_dedup_cascade,
    )

    rows = {r["stage"]: r for r in pipeline_dedup_cascade(spark, SF_ORACLE).collect()}
    assert list(rows) == ["exact", "near_dup", "semantic"] or set(rows) == {
        "exact", "near_dup", "semantic"
    }
    ex, nd, se = rows["exact"], rows["near_dup"], rows["semantic"]
    for r in (ex, nd, se):
        assert r["n_removed"] == r["n_in"] - r["n_kept"] >= 0
    assert ex["n_kept"] == nd["n_in"]
    assert nd["n_kept"] == se["n_in"]
    n_embedded = t(spark, SF_ORACLE, "embeddings").count()
    assert se["n_kept"] >= se["n_in"] - n_embedded


def test_bot_regularity_agrees_with_local_recompute(spark):
    """CV² per user equals a Python recompute over second-floored gaps;
    every judged user has enough gaps; flags match the threshold."""
    from naive_query_engine_spark.operators.events import (
        BOT_MIN_EVENTS,
        events_bot_regularity,
    )

    out = {r["user_id"]: r for r in events_bot_regularity(spark, SF_ORACLE).collect()}
    rows = (
        t(spark, SF_ORACLE, "events").select("user_id", "ts", "event_id").collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    for uid, evs in by_user.items():
        evs.sort()
        gaps = [
            int((b[0] - a[0]).total_seconds() * 1_000_000) // 1_000_000
            for a, b in zip(evs, evs[1:])
        ]
        if len(gaps) < BOT_MIN_EVENTS or sum(gaps) == 0:
            assert uid not in out
            continue
        n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        cv_sq = (n * s2 - s1 * s1) / (n * s1 * s1)
        r = out[uid]
        assert r["n_gaps"] == n
        assert abs(r["cv_sq"] - cv_sq) < 1e-9
        assert r["regular_flag"] == (r["cv_sq"] < 0.5)


def test_dim_stats_shape_and_nonnegative_variance(spark):
    """Exactly D dimensions, each covering every vector; population
    variance is non-negative and zero iff min == max."""
    from naive_query_engine_spark.operators.similarity import embedding_dim_stats

    out = embedding_dim_stats(spark, SF_ORACLE).collect()
    n_vecs = t(spark, SF_ORACLE, "embeddings").count()
    assert len(out) == 64
    for r in out:
        assert r["n"] == n_vecs
        assert r["var_q"] >= 0
        if r["min_q"] == r["max_q"]:
            assert r["var_q"] == 0.0
        assert r["min_q"] <= r["mean_q"] <= r["max_q"]


def test_degree_distribution_edge_identity(spark):
    """Σdegree across bins = 2·|edges| of the same graph, and every bin's
    min/max respect the bit-length bucket boundaries."""
    from naive_query_engine_spark.operators.clustering import (
        graph_degree_distribution,
    )
    from naive_query_engine_spark.operators.dedup import ngram_jaccard_pairs

    out = graph_degree_distribution(spark, SF_ORACLE).collect()
    n_edges = ngram_jaccard_pairs(t(spark, SF_ORACLE, "documents")).count()
    assert sum(r["sum_degree"] for r in out) == 2 * n_edges
    for r in out:
        lo, hi = 2 ** (r["log2_bin"] - 1), 2 ** r["log2_bin"] - 1
        assert lo <= r["min_degree"] <= r["max_degree"] <= hi


def test_share_of_parent_sums_to_one(spark):
    """Shares within each region sum to 1; region shares sum to 1."""
    from collections import defaultdict

    from naive_query_engine_spark.operators.analytics import (
        revenue_share_of_parent,
    )

    out = revenue_share_of_parent(spark, SF_ORACLE).collect()
    by_region = defaultdict(float)
    region_share = {}
    for r in out:
        by_region[r["region"]] += r["share_of_region"]
        region_share[r["region"]] = r["region_share_of_total"]
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-9, (region, s)
    assert abs(sum(region_share.values()) - 1.0) < 1e-9


def test_benford_digits_partition_positive_values(spark):
    """Digits 1-9 partition the positive values; deviations are bounded
    by the fixed-point scale (shares and probabilities are both <= 1)."""
    from naive_query_engine_spark.operators.quality import (
        BENFORD_FP,
        audit_benford_first_digit,
    )

    out = audit_benford_first_digit(spark, SF_ORACLE).collect()
    assert {r["digit"] for r in out} <= set(range(1, 10))
    n_pos = (
        t(spark, SF_ORACLE, "events").filter(F.col("value") > 0).count()
    )
    assert sum(r["n_values"] for r in out) == n_pos
    for r in out:
        assert 0 <= r["benford_dev_fp"] <= BENFORD_FP
