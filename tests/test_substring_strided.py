"""Winnowed (stride-k) exact-substring dedup: recall contract + index size.

The scale lever over stride-1 ``dedup_substring`` (VERDICT r3 #1): select
one fingerprint (the window-min hash) per ``WINNOW_K`` consecutive window
positions.  These tests pin

1. the **recall guarantee**: any shared verbatim run of
   ``SUBSTR_WINDOW + WINNOW_K - 1`` chars is caught at EVERY alignment of
   the copies (winnowing selection is content-determined, so misaligned
   copies still share the selected fingerprint — positional stride-k
   sampling cannot promise this);
2. the **index reduction**: the winnowed index carries a small fraction of
   the stride-1 window rows (expected density ~2/(K+1));
3. the **split-aware spread** (VERDICT r3 #2): a pre-split input adds NO
   round-robin exchange above the window expansion, and the result is
   identical either way.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from naive_query_engine_spark import plans
from naive_query_engine_spark.operators.dedup import (
    SUBSTR_WINDOW,
    WINNOW_K,
    substring_strided_pairs,
    winnowed_fingerprints,
)

GUARANTEE_LEN = SUBSTR_WINDOW + WINNOW_K - 1


def _noise(tag: str, n_chars: int) -> str:
    """Deterministic non-repeating filler with no shared substrings across
    tags (hex stream of chained sha256, distinct per tag)."""
    out = []
    h = tag.encode()
    while sum(len(x) for x in out) < n_chars:
        h = hashlib.sha256(h).digest()
        out.append(h.hex())
    return "".join(out)[:n_chars]


def test_planted_span_caught_at_every_alignment(spark):
    """A planted GUARANTEE_LEN-char span shared by two otherwise-unrelated
    docs must be reported for every relative alignment 0..WINNOW_K-1."""
    span = _noise("span", GUARANTEE_LEN)
    rows = []
    for off in range(WINNOW_K):
        a_id, b_id = 10 * off, 10 * off + 1
        pre_a = _noise(f"a{off}", 120)
        pre_b = _noise(f"b{off}", 120 + off)  # misalign by `off` chars
        rows.append((a_id, pre_a + span + _noise(f"at{off}", 90)))
        rows.append((b_id, pre_b + span + _noise(f"bt{off}", 90)))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in substring_strided_pairs(d).collect()
    }
    for off in range(WINNOW_K):
        assert (10 * off, 10 * off + 1) in got, (
            f"planted {GUARANTEE_LEN}-char span missed at alignment {off}: {sorted(got)}"
        )


def test_unrelated_docs_share_nothing(spark):
    d = spark.createDataFrame(
        [(1, _noise("u1", 400)), (2, _noise("u2", 400))],
        "doc_id long, text string",
    )
    assert substring_strided_pairs(d).count() == 0


def test_winnowed_index_is_fraction_of_stride1(spark):
    """Fingerprint rows ≈ 2/(K+1) of stride-1 window rows (allow slack for
    truncated suffix windows on short docs)."""
    rows = [(i, _noise(f"d{i}", 600)) for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    n_fp = winnowed_fingerprints(d).count()
    n_windows = sum(len(t) - SUBSTR_WINDOW + 1 for _, t in rows)
    assert n_fp <= 0.5 * n_windows, (n_fp, n_windows)
    assert n_fp >= n_windows // (2 * WINNOW_K)  # sanity: not over-pruned


def test_presplit_input_skips_spread_exchange(spark):
    """VERDICT r3 #2: `spread` must be a no-op (no round-robin Exchange)
    when the input already has >= defaultParallelism partitions, and the
    pair results must be identical either way."""
    rows = [(i, _noise(f"s{i}", 300)) for i in range(12)]
    span = _noise("shared", 2 * GUARANTEE_LEN)
    rows.append((100, _noise("pa", 80) + span))
    rows.append((101, _noise("pb", 95) + span))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    n = spark.sparkContext.defaultParallelism
    pre_split = d.repartition(n + 4)

    fp_plan = plans.explain_text(winnowed_fingerprints(pre_split), "simple")
    # the only exchange allowed is the caller's own repartition (which is
    # part of pre_split's lineage); spread must not add a second one
    assert fp_plan.count("Exchange") - fp_plan.count("BroadcastExchange") <= 1, fp_plan

    base = {
        (r.doc_a, r.doc_b, r.shared_fps)
        for r in substring_strided_pairs(d).collect()
    }
    split = {
        (r.doc_a, r.doc_b, r.shared_fps)
        for r in substring_strided_pairs(pre_split).collect()
    }
    assert base == split
    assert any(p[:2] == (100, 101) for p in base)
