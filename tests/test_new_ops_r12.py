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
    is at least the entry set and bounded by the beam-search fan-out
    ceiling (entries + hop fan-outs can never exceed
    (2 + B) * (1 + 2E) vertices — degree is 2E after the two-family
    union and symmetrization), and at least one query finds a true
    neighbor (the graph is navigable on this corpus, not vacuous)."""
    from naive_query_engine_spark.operators.similarity import (
        GRAPH_BEAM,
        GRAPH_DEGREE,
        TOP_K,
    )

    rows = QUERIES["similarity_graph_ann_beam"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    ceiling = (2 + GRAPH_BEAM) * (1 + 2 * GRAPH_DEGREE)
    for r in rows:
        assert 0 <= r.hits <= TOP_K
        assert r.recall_at_k == r.hits / TOP_K
        assert 1 <= r.n_visited <= ceiling, r
    assert any(r.hits > 0 for r in rows)


def test_graph_ann_edges_bounded_degree(spark):
    """The navigable graph's out-degree is bounded by 2*E families
    before symmetrization — the property that caps serving cost per
    hop.  (Symmetrized in-edges can exceed it; the beam expands along
    OUT-edges of the symmetrized set, whose degree is bounded by
    2E + in-degree mass, still corpus-independent in expectation —
    here we pin the pre-symmetrization invariant exactly.)"""
    from pyspark.sql import Window

    from naive_query_engine_spark.operators.similarity import (
        GRAPH_DEGREE,
        GRAPH_SIGN_BITS,
        N_QUERY_VECS,
        _g_bucket_spark,
        _qtable,
        cosine_q,
        dot_q,
    )
    from naive_query_engine_spark.queries import t as load

    emb = load(spark, SF_SMOKE, "embeddings")
    qt = _qtable(spark, SF_SMOKE)
    buck = emb.select(
        "vec_id",
        _g_bucket_spark(F.col("embedding"), 0).alias("b0"),
        _g_bucket_spark(F.col("embedding"), GRAPH_SIGN_BITS).alias("b1"),
    ).filter(F.col("vec_id") >= N_QUERY_VECS)
    a = buck.select(F.col("vec_id").alias("src"), "b0", "b1")
    b = buck.select(
        F.col("vec_id").alias("dst"),
        F.col("b0").alias("c0"),
        F.col("b1").alias("c1"),
    )
    fpairs = (
        a.join(b, (F.col("b0") == F.col("c0")) & (F.col("src") != F.col("dst")))
        .select(F.lit(0).alias("fam"), "src", "dst")
        .unionAll(
            a.join(b, (F.col("b1") == F.col("c1")) & (F.col("src") != F.col("dst")))
            .select(F.lit(1).alias("fam"), "src", "dst")
        )
    )
    pa = qt.select(F.col("vec_id").alias("src"), F.col("q").alias("qa"), F.col("nrm2").alias("na2"))
    pb = qt.select(F.col("vec_id").alias("dst"), F.col("q").alias("qb"), F.col("nrm2").alias("nb2"))
    scored = fpairs.join(pa, "src").join(pb, "dst").select(
        "fam", "src", "dst",
        cosine_q(dot_q(F.col("qa"), F.col("qb")), F.col("na2"), F.col("nb2")).alias("cosine"),
    )
    w = Window.partitionBy("fam", "src").orderBy(F.col("cosine").desc(), F.col("dst"))
    kept = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= GRAPH_DEGREE
    )
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
