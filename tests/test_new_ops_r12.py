"""Behavioral invariants for the round-12 operators: the Bloom ingest
prefilter (no-false-negative contract + cross-engine hash algebra), the
UniMax epoch-capped mixture (exact waterfilling invariants), and the
PCM clipping-QA kernel (vs a plain-Python reference, including the
rails and the truncated-payload edge).

(Oracle hash-equality is tests/test_oracle.py's registry sweep; these
pin the SEMANTIC claims the oracle alone can't state.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

# queries first: importing an operator module directly would re-enter
# the quality<->clustering import cycle before the registry initializes
from naive_query_engine_spark.queries import QUERIES  # noqa: I001

from naive_query_engine_spark.operators.quality import UNIMAX_MAX_EPOCHS
from naive_query_engine_spark.operators.sketches import (
    BLOOM_HASH_STARTS,
    BLOOM_WORDS,
    _bloom_hash_cols,
)

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Bloom ingest prefilter


def test_bloom_no_false_negatives(spark):
    """The Bloom contract the fast-admit path rests on: a shingle that IS
    in the corpus always hits the filter, so n_present <= n_maybe for
    every document and a novel_fast doc has zero present shingles."""
    out = QUERIES["dedup_bloom_ingest_prefilter"].fn(spark, SF_SMOKE).collect()
    assert out, "prefilter returned no batch documents"
    for r in out:
        assert r.n_present <= r.n_maybe, r
        assert r.n_false_pos == r.n_maybe - r.n_present, r
        assert r.novel_fast == (r.n_maybe == 0), r
        if r.novel_fast:
            assert r.n_present == 0, r


def test_bloom_hash_cols_match_hashlib(spark):
    """The Spark-side 16-bit md5 slice algebra equals Python's hashlib —
    the same check the oracle's nibble-lookup SQL was validated against,
    pinned so a conv/substring regression can't silently shear the two
    engines apart."""
    rows = spark.createDataFrame(
        [("the quick fox",), ("lorem ipsum dolor",), ("",)], ["g"]
    ).select(*[c.alias(f"h{i}") for i, c in enumerate(_bloom_hash_cols(F.col("g")))],
             "g").collect()
    for r in rows:
        hexd = hashlib.md5(r.g.encode()).hexdigest()
        expect = [int(hexd[s - 1 : s + 3], 16) for s in BLOOM_HASH_STARTS]
        assert [r.h0, r.h1, r.h2] == expect, (r.g, expect)


def test_bloom_state_is_bounded(spark):
    """The filter relation never exceeds its 2^16-bit geometry: at most
    BLOOM_WORDS rows regardless of corpus size — the kilobyte-state
    claim that makes it broadcastable at any scale."""
    from naive_query_engine_spark.operators.dedup import shingle_rows
    from naive_query_engine_spark.queries import t as load

    docs = load(spark, SF_SMOKE, "documents")
    n_words = (
        shingle_rows(docs.filter(F.col("doc_id") % 10 != 0))
        .select("g")
        .distinct()
        .select(F.explode(F.array(*_bloom_hash_cols(F.col("g")))).alias("hv"))
        .select((F.col("hv") / 32).cast("long").alias("w"))
        .distinct()
        .count()
    )
    assert n_words <= BLOOM_WORDS


# ---------------------------------------------------------------------------
# UniMax mixture


def test_unimax_waterfilling_invariants(spark):
    """Exact waterfilling: the budget is filled TO THE TOKEN, no language
    exceeds its epoch cap, saturated languages sit exactly at cap, and
    both classes exist (the constants were chosen so the corpus
    exercises the rule, not a degenerate all-equal split)."""
    rows = QUERIES["dataset_unimax_mixture"].fn(spark, SF_SMOKE).collect()
    total = sum(r.lang_tokens for r in rows)
    budget = (3 * total) // 2
    assert sum(r.alloc_tokens for r in rows) == budget
    sat = [r for r in rows if r.alloc_tokens == r.cap_tokens]
    unsat = [r for r in rows if r.alloc_tokens < r.cap_tokens]
    assert sat and unsat, rows
    for r in rows:
        assert r.cap_tokens == UNIMAX_MAX_EPOCHS * r.lang_tokens
        assert 0 < r.alloc_tokens <= r.cap_tokens
        assert r.epochs_ppm == r.alloc_tokens * 1_000_000 // r.lang_tokens
    # equal-share discipline: unsaturated allocations differ by at most
    # one token (the deterministic remainder distribution)
    allocs = sorted(r.alloc_tokens for r in unsat)
    assert allocs[-1] - allocs[0] <= 1


# ---------------------------------------------------------------------------
# PCM clipping QA kernel


def test_pcm_clipping_kernel_vs_python(spark):
    """The Arrow kernel agrees with a plain-Python model on a payload
    built to hit every branch: both clip rails, the silence band, a
    known peak, a nonzero DC sum, and a dangling half-sample byte."""
    import struct

    from naive_query_engine_spark.operators.multimodal import (
        pcm_clipping_kernel,
    )

    samples = [32767, -32768, 0, 1023, -1023, 1024, -1024, 5000, 32767]
    payload = b"".join(struct.pack("<h", s) for s in samples) + b"\x7f"
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    (row,) = df.mapInPandas(
        pcm_clipping_kernel(),
        "doc_id long, n_samples long, n_clipped long,"
        " n_silence long, peak_abs long, dc_sum long",
    ).collect()
    assert row.n_samples == len(samples)
    assert row.n_clipped == 3  # two rails + the repeated 32767
    assert row.n_silence == sum(1 for s in samples if abs(s) < 1024)
    assert row.peak_abs == 32768
    assert row.dc_sum == sum(samples)


# ---------------------------------------------------------------------------
# graph-ANN beam search


def test_graph_ann_beam_contract(spark):
    """Per query: recall in [0,1] with hits consistent, the visited set
    is at least the entry set and bounded by the DATA-DERIVED fan-out
    ceiling (entries + beam) x (1 + max symmetrized out-degree) — the
    symmetrized degree is not bounded by 2E a priori (a cosine hub can
    be many nodes' top-E choice), so the ceiling is measured from the
    shipped graph, not assumed — and at least one query finds a true
    neighbor (the graph is navigable on this corpus, not vacuous)."""
    from naive_query_engine_spark.operators.similarity import (
        GRAPH_BEAM,
        N_QUERY_VECS,
        TOP_K,
        _g_buckets,
        _g_kept_edges,
        _qtable,
    )
    from naive_query_engine_spark.queries import t as load

    emb = load(spark, SF_SMOKE, "embeddings")
    corpus = _g_buckets(emb).filter(F.col("vec_id") >= N_QUERY_VECS)
    payload = _qtable(spark, SF_SMOKE).select("vec_id", "q", "nrm2")
    kept = _g_kept_edges(corpus, payload)
    sym = (
        kept.select("src", "dst")
        .unionAll(kept.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    max_deg = (
        sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).agg(F.max("d")).collect()[0][0]
    )
    ceiling = (2 + GRAPH_BEAM) * (1 + max_deg)

    rows = QUERIES["similarity_graph_ann_beam"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.hits <= TOP_K
        assert r.recall_at_k == r.hits / TOP_K
        assert 1 <= r.n_visited <= ceiling, (r, max_deg)
    assert any(r.hits > 0 for r in rows)


def test_graph_ann_edges_bounded_degree(spark):
    """The navigable graph's PRE-symmetrization out-degree is bounded by
    2 x GRAPH_DEGREE (top-E per family) — the property that caps the
    build's per-node emission.  Uses the operator's own _g_kept_edges
    helper so the test cannot drift from the shipped construction."""
    from naive_query_engine_spark.operators.similarity import (
        GRAPH_DEGREE,
        N_QUERY_VECS,
        _g_buckets,
        _g_kept_edges,
        _qtable,
    )
    from naive_query_engine_spark.queries import t as load

    emb = load(spark, SF_SMOKE, "embeddings")
    corpus = _g_buckets(emb).filter(F.col("vec_id") >= N_QUERY_VECS)
    payload = _qtable(spark, SF_SMOKE).select("vec_id", "q", "nrm2")
    kept = _g_kept_edges(corpus, payload)
    deg = kept.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    assert deg.agg(F.max("d")).collect()[0][0] <= 2 * GRAPH_DEGREE


# ---------------------------------------------------------------------------
# video scene cuts


def test_scene_cut_kernel_vs_python(spark):
    """The kernel agrees with a plain-Python model on a crafted clip:
    three planted scenes (luma bases 10 / 150 / 10) with +-2 jitter,
    plus a dangling partial frame that must be dropped."""
    import numpy as np

    from naive_query_engine_spark.operators.multimodal import scene_cut_kernel

    rng = [10] * 4 + [150] * 3 + [10] * 5  # scene lengths 4, 3, 5
    frames = []
    for f, base in enumerate(rng):
        frames.append(bytes((base + ((f + p) % 3)) for p in range(64)))
    payload = b"".join(frames) + b"\x01" * 10  # partial 13th frame
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    (row,) = df.mapInPandas(
        scene_cut_kernel(),
        "doc_id long, n_frames long, n_cuts long,"
        " longest_scene_frames long, delta_sum long",
    ).collect()
    sums = [sum(b) for b in frames]
    deltas = [abs(a - b) for a, b in zip(sums[1:], sums)]
    assert row.n_frames == 12
    assert row.n_cuts == 2  # 10->150 and 150->10
    assert row.longest_scene_frames == 5
    assert row.delta_sum == sum(deltas)


def test_scene_cut_recovers_planted_structure(spark):
    """On the registered synthetic corpus the detector recovers the
    planted scene structure EXACTLY: n_cuts = floor((nf-1)/slen) for
    every video (the jitter/jump dead-band argument in the docstring)."""
    rows = (
        QUERIES["multimodal_video_scene_cuts"].fn(spark, SF_SMOKE).collect()
    )
    assert rows
    for r in rows:
        nf = 12 + r.doc_id % 13
        slen = 3 + r.doc_id % 4
        assert r.n_frames == nf
        assert r.n_cuts == (nf - 1) // slen, r
        assert r.longest_scene_frames <= slen


def test_bloom_sparse_filter_scores_empty_words_as_miss(spark):
    """A probe hash landing in a word with NO corpus bits (row absent
    from the packed relation) must score hit=0, not vanish: with a
    one-shingle corpus (3 set bits, 2045 empty words) a novel document
    is fast-admitted with its shingle COUNTED.  (The original inner
    join dropped empty-word probes — dormant at shipped SFs where
    every word is populated, wrong on sparse corpora.)"""
    from naive_query_engine_spark.operators.dedup import shingle_rows
    from naive_query_engine_spark.operators.sketches import (
        _bloom_filter_frames,
        _bloom_verdicts,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "zeta eta theta")], "doc_id long, text string"
    )
    corpus_g = shingle_rows(corpus).select("g").distinct()
    # reuse the production builder on the tiny frame via the same algebra
    from pyspark.sql import functions as F

    from naive_query_engine_spark.operators.sketches import (
        BLOOM_WORD_BITS,
        _bloom_hash_cols,
        _bloom_word,
    )

    cpos = corpus_g.select(
        F.explode(F.array(*_bloom_hash_cols(F.col("g")))).alias("hv")
    )
    bloom = (
        cpos.select(
            _bloom_word(F.col("hv")).alias("word_idx"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(hv % {BLOOM_WORD_BITS} as int))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    (row,) = _bloom_verdicts(batch, bloom, corpus_g).collect()
    assert row.n_shingles == 1
    assert row.n_maybe == 0
    assert row.novel_fast
