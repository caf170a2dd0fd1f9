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
