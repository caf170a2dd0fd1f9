"""PQ-ADC invariants beyond oracle agreement.

(a) The ADC score is the *exact* dot product of the query against the
    RECONSTRUCTED (quantized-codebook) neighbor — so for each scored
    pair, recomputing dot(query, concat(codewords of neighbor)) from the
    codebook must reproduce adc_score bit-for-bit.  Pins that the
    operator really is table-lookup ADC, not some other approximation.
(b) Compression accounting: every vector is encoded as exactly PQ_M
    codes drawn from the label vocabulary.
(c) The ADC ranking beats random: mean exact cosine of the ADC top-k
    exceeds the corpus mean similarity by a clear margin (quality floor,
    loose enough to survive any SF).
"""

from __future__ import annotations

import numpy as np

# queries first: it runs register_all(), fully initializing the operator
# modules (importing operators.similarity directly would hit the
# clustering<->similarity registration cycle on a cold interpreter)
from naive_query_engine_spark.queries import QUERIES
from naive_query_engine_spark.operators.similarity import (  # noqa: E402
    N_QUERY_VECS,
    PQ_CENT_SCALE,
    PQ_M,
    PQ_SUB_DIM,
    QUANT,
    TOP_K,
)

from .conftest import SF_ORACLE


def _load(spark):
    rows = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    mat = np.floor(np.array([r["embedding"] for r in rows], dtype=np.float64) * QUANT)
    return ids, labels, mat


def _codebook(ids, labels, mat):
    """cq[label, dim] = floor(SCALE * mean(v)) — mirrors the operator."""
    labs = np.unique(labels)
    cq = np.zeros((labs.max() + 1, mat.shape[1]), dtype=np.int64)
    for lab in labs:
        m = mat[labels == lab]
        cq[lab] = np.floor(PQ_CENT_SCALE * m.sum(axis=0) / len(m))
    return labs, cq


def _encode(vec, labs, cq):
    codes = []
    for m in range(PQ_M):
        sl = slice(m * PQ_SUB_DIM, (m + 1) * PQ_SUB_DIM)
        d2 = ((PQ_CENT_SCALE * vec[sl] - cq[labs][:, sl]) ** 2).sum(axis=1)
        codes.append(labs[np.lexsort((labs, d2))[0]])
    return codes


def test_pq_adc_score_is_reconstructed_dot(spark):
    ids, labels, mat = _load(spark)
    labs, cq = _codebook(ids, labels, mat)
    by_id = {int(i): mat[k] for k, i in enumerate(ids)}

    out = QUERIES["similarity_pq_adc_topk"].fn(spark, SF_ORACLE).collect()
    assert out, "PQ query returned no rows"
    for r in out:
        q = by_id[r["query_id"]]
        codes = _encode(by_id[r["neighbor_id"]], labs, cq)
        recon = np.concatenate(
            [cq[c, m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM] for m, c in enumerate(codes)]
        )
        expect = float(np.dot(q, recon))
        assert expect == r["adc_score"], (
            f"pair ({r['query_id']},{r['neighbor_id']}): ADC {r['adc_score']} "
            f"!= reconstructed dot {expect}"
        )


def test_pq_topk_beats_corpus_mean_similarity(spark):
    ids, labels, mat = _load(spark)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    by_id = {int(i): unit[k] for k, i in enumerate(ids)}

    out = QUERIES["similarity_pq_adc_topk"].fn(spark, SF_ORACLE).collect()
    assert len(out) == N_QUERY_VECS * TOP_K
    picked = np.mean([float(np.dot(by_id[r["query_id"]], by_id[r["neighbor_id"]])) for r in out])
    # corpus mean pairwise cosine ~= |mean vector|^2-ish; compute directly
    # on a slice of pairs for a stable baseline
    rng = np.random.default_rng(0)
    k = min(len(ids), 200)
    sel = rng.choice(len(ids), size=k, replace=False)
    sims = unit[sel] @ unit[sel].T
    base = (sims.sum() - k) / (k * (k - 1))
    assert picked > base + 0.05, f"ADC top-k mean cosine {picked} not above baseline {base}"
