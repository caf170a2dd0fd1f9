"""Behavioral invariants for the round-9 operators: the composed
maintenance tick, the IVF-PQ ANN composition, near-dup k-core peeling,
and the point-in-time feature backfill.

(Oracle hash-equality for all four is tests/test_oracle.py's registry
sweep; these pin the SEMANTIC claims the oracles alone can't state —
order sensitivity, candidate-set structure, fixpoint, leakage bounds.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.queries import QUERIES, t

from .conftest import SF_SMOKE


def test_tick_batch2_sees_batch1_admits(spark):
    """The sequential-fold claim, non-vacuous: at least one batch-2
    verdict names a batch-1 ARRIVAL as its best twin (possible only
    because admitted batch-1 vectors joined the corpus before batch 2
    was gated), and no batch-2 verdict ever names a batch-1 REJECT
    (rejects never enter the corpus)."""
    out = QUERIES["similarity_ivf_maintenance_tick"].fn(spark, SF_SMOKE)
    rows = out.collect()
    b1_rejects = {
        r["vec_id"] for r in rows if r["batch"] == 1 and r["is_duplicate"]
    }
    b2_dupof = [
        r["dup_of"]
        for r in rows
        if r["batch"] == 2 and r["dup_of"] is not None
    ]
    assert any(d % 6 == 0 for d in b2_dupof), (
        "no batch-2 verdict references a batch-1 admit - the fold is "
        "indistinguishable from a batch-vs-base gate at this SF"
    )
    assert not (set(b2_dupof) & b1_rejects)


def test_tick_batch1_extends_admit_gate_with_lower_id_peers(spark):
    """Batch 1 is gated against the BASE corpus ∪ its own LOWER-ID
    co-arrivals (the intra-batch pre-pass, VERDICT r9 #3), so vs the
    registered admit gate (base-only candidates) restricted to batch-1
    arrivals the verdicts are MONOTONE: every gate-duplicate stays a
    tick-duplicate; best_cosine never decreases; any divergence (new
    duplicate, changed dup_of) is explained by a lower-id batch-1
    co-arrival; and arrivals whose tick verdict matches the gate's are
    bit-identical."""
    tick = {
        r["vec_id"]: r
        for r in QUERIES["similarity_ivf_maintenance_tick"]
        .fn(spark, SF_SMOKE)
        .filter(F.col("batch") == 1)
        .collect()
    }
    gate = {
        r["vec_id"]: r
        for r in QUERIES["dedup_ingest_admit_gate"]
        .fn(spark, SF_SMOKE)
        .filter(F.col("vec_id") % 6 == 0)
        .collect()
    }
    assert set(tick) == set(gate) and tick
    for vid, g in gate.items():
        tk = tick[vid]
        if g["is_duplicate"]:
            assert tk["is_duplicate"]
        if g["best_cosine"] is not None and tk["best_cosine"] is not None:
            assert tk["best_cosine"] >= g["best_cosine"]
        if (tk["is_duplicate"], tk["dup_of"]) != (
            g["is_duplicate"],
            g["dup_of"],
        ):
            # only a lower-id batch-1 co-arrival can explain the delta
            assert tk["dup_of"] is not None
            assert tk["dup_of"] % 6 == 0 and tk["dup_of"] < vid


def test_ivfpq_candidates_stay_in_probed_cells(spark):
    """Structural IVF-PQ claim: every returned neighbor lives in one of
    its query's probed cells (the inverted file really bounds the scan
    set), and each query returns at most TOP_K ranked rows."""
    from naive_query_engine_spark.operators.similarity import (
        IVF_NPROBE,
        TOP_K,
        _label_cells,
        _qtable,
    )

    out = QUERIES["similarity_ivfpq_adc_topk"].fn(spark, SF_SMOKE)
    assign, probe = _label_cells(_qtable(spark, SF_SMOKE), IVF_NPROBE)
    probed = probe.select(
        F.col("vec_id").alias("query_id"), F.col("cell")
    )
    member = assign.select(F.col("vec_id").alias("neighbor_id"), "cell")
    outside = (
        out.join(member, "neighbor_id")
        .join(
            probed.withColumnRenamed("cell", "qcell"),
            ["query_id"],
        )
        .groupBy("query_id", "neighbor_id", "cell")
        .agg(F.max((F.col("cell") == F.col("qcell")).cast("int")).alias("ok"))
        .filter(F.col("ok") == 0)
        .count()
    )
    assert outside == 0
    per_q = out.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] <= TOP_K for r in per_q)


def test_kcore_fixpoint_and_degree_bound(spark):
    """KCORE_ROUNDS reaches the fixpoint at this SF (one more peel drops
    nobody) and the core is non-vacuous; every survivor's within-core
    degree is >= KCORE_K by the fixpoint definition."""
    from naive_query_engine_spark.operators.clustering import (
        KCORE_K,
        symmetrized_edges,
    )

    out = QUERIES["graph_kcore_peeling"].fn(spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "empty k-core - the registered row went vacuous"
    assert all(r["kcore_degree"] >= KCORE_K for r in rows)
    # one more peel: recompute degrees restricted to the survivor set
    survivors = {r["doc_id"] for r in rows}
    sym = symmetrized_edges(spark, SF_SMOKE)
    deg = (
        sym.filter(
            F.col("a").isin(survivors) & F.col("b").isin(survivors)
        )
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    )
    again = {r["a"] for r in deg if r["d"] >= KCORE_K}
    assert again == survivors


def test_pit_backfill_bounds_and_coverage(spark):
    """PIT-correctness bounds: the windowed features are dominated by
    the lifetime feature, clicks by events, nothing negative; one
    feature row per purchase event."""
    out = QUERIES["features_pit_backfill"].fn(spark, SF_SMOKE)
    rows = out.collect()
    n_purch = (
        t(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_purch
    for r in rows:
        assert 0 <= r["events_7d"] <= r["lifetime_events"]
        assert 0 <= r["clicks_7d"] <= r["events_7d"]


def test_snapshot_diff_classes_and_key_monotonicity(spark):
    """Append-only feed: keys live at T2 are a superset of keys at T1
    (no 'removed' class); all three emitted classes are non-vacuous at
    this SF; 'added' keys have NO order at or before T1."""
    from naive_query_engine_spark.operators.analytics import (
        SNAPSHOT_DIFF_T1,
    )

    out = QUERIES["orders_snapshot_diff"].fn(spark, SF_SMOKE)
    rows = out.collect()
    classes = {r["change_type"] for r in rows}
    assert classes == {"added", "changed", "unchanged"}
    added = [r["o_custkey"] for r in rows if r["change_type"] == "added"]
    assert all(r["prio_t1"] is None for r in rows if r["change_type"] == "added")
    pre_t1 = {
        r["o_custkey"]
        for r in t(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderdate") <= F.lit(SNAPSHOT_DIFF_T1).cast("date"))
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert not (set(added) & pre_t1)


def test_tar_kernel_rejects_corruption(spark):
    """The walk's validation gates: a flipped checksum byte, a broken
    magic, and a truncated data run each reject the WHOLE archive
    (zero member rows); the pristine payload round-trips."""
    from naive_query_engine_spark.operators.multimodal import (
        make_tar_payload,
        tar_index_kernel,
    )

    d = t(spark, SF_SMOKE, "documents").filter(F.col("doc_id") == 5)
    payload = bytes(
        d.select(make_tar_payload(F.col("doc_id")).alias("p")).collect()[0]["p"]
    )
    schema = (
        "doc_id long, member_idx long, name string, size long,"
        " data_offset long"
    )

    def run(raw: bytes) -> int:
        df = spark.createDataFrame([(5, bytearray(raw))], "doc_id long, payload binary")
        return df.mapInPandas(tar_index_kernel(), schema).count()

    assert run(payload) == 1 + 5 % 3  # pristine: all members indexed
    bad_chk = bytearray(payload); bad_chk[148] ^= 0x01
    assert run(bytes(bad_chk)) == 0
    bad_magic = bytearray(payload); bad_magic[257] ^= 0xFF
    assert run(bytes(bad_magic)) == 0
    assert run(payload[: len(payload) - 1024 - 256]) == 0  # truncated run


def test_kcore_ivf_fixpoint_and_cell_locality(spark):
    """Substrate k-core: the 4-round budget reaches fixpoint at this SF
    (one extra peel drops nobody) and every survivor's within-core
    degree is >= KCORE_OVERLAY_K."""
    from naive_query_engine_spark.operators.graph_overlays import (
        KCORE_OVERLAY_K,
    )
    from naive_query_engine_spark.operators.kmeans import (
        ivf_mutual_knn_edges,
    )

    out = QUERIES["graph_kcore_ivf"].fn(spark, SF_SMOKE)
    rows = out.collect()
    assert rows and all(r["kcore_degree"] >= KCORE_OVERLAY_K for r in rows)
    survivors = {r["vec_id"] for r in rows}
    knn = ivf_mutual_knn_edges(spark, SF_SMOKE)
    sym = knn.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")).unionAll(
        knn.select(F.col("vec_b").alias("a"), F.col("vec_a").alias("b"))
    )
    deg = (
        sym.filter(F.col("a").isin(survivors) & F.col("b").isin(survivors))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    )
    assert {r["a"] for r in deg if r["d"] >= KCORE_OVERLAY_K} == survivors


def test_packing_sweep_monotone_and_consistent(spark):
    """Sweep sanity: per source, n_packs and n_oversize_docs are
    non-increasing in ctx; at CTX_TOKENS the sweep's pack count equals
    the packing op's materialized bin count."""
    from collections import defaultdict

    from naive_query_engine_spark.operators.quality import CTX_TOKENS

    rows = QUERIES["dataset_packing_fragmentation_sweep"].fn(
        spark, SF_SMOKE
    ).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["ctx"])
        for a, b in zip(rs, rs[1:]):
            assert a["n_packs"] >= b["n_packs"]
            assert a["n_oversize_docs"] >= b["n_oversize_docs"]
    packs = QUERIES["dataset_pack_context_windows"].fn(spark, SF_SMOKE)
    bins = {
        r["source"]: r["n"]
        for r in packs.groupBy("source")
        .agg(F.countDistinct("bin").alias("n"))
        .collect()
    }
    sweep_at = {r["source"]: r["n_packs"] for r in rows if r["ctx"] == CTX_TOKENS}
    assert sweep_at == bins


def test_ppr_differs_from_global_and_seeds_matter(spark):
    """Personalization is non-vacuous: the segment-seeded supplier
    ranking differs from global PageRank's supplier-side order, and all
    ranks are non-negative with a full top-N emitted."""
    from naive_query_engine_spark.operators.clustering import PR_TOPN

    ppr = (
        QUERIES["graph_pagerank_personalized"].fn(spark, SF_SMOKE).collect()
    )
    pr = QUERIES["graph_pagerank"].fn(spark, SF_SMOKE).collect()
    # sf0.001 has only 10 suppliers, so the supplier-side top-N can be
    # shorter than PR_TOPN at the smallest SF
    assert 0 < len(ppr) <= PR_TOPN
    assert all(r["ppr_micro"] >= 0 for r in ppr)
    ppr_order = [r["node"] for r in sorted(ppr, key=lambda r: r["rnk"])]
    pr_sup_order = [
        r["node"]
        for r in sorted(pr, key=lambda r: r["rnk"])
        if r["node"] % 2 == 1
    ]
    assert ppr_order != pr_sup_order[: len(ppr_order)]


def test_rake_phrases_are_stopword_free(spark):
    """RAKE structural invariants: no extracted phrase contains a
    stopword (they are the boundaries), n_words matches the phrase's
    token count, and ranks are the (score DESC, phrase) order."""
    from naive_query_engine_spark.operators.text import STOPWORDS

    rows = sorted(
        QUERIES["text_rake_keywords"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r["rnk"],
    )
    assert rows
    stop = set(STOPWORDS)
    for r in rows:
        ws = r["phrase"].split(" ")
        assert not (set(ws) & stop), r["phrase"]
        assert r["n_words"] == len(ws)
    keys = [(-r["score_fp"], r["phrase"]) for r in rows]
    assert keys == sorted(keys)
