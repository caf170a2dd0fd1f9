"""Multi-probe IVF must never be WORSE than single-probe: its candidate
pool is a strict superset (same cell plus the next-nearest), so (a)
recall@k vs brute force is monotone in nprobe and (b) each query's k-th
best cosine can only improve.  Pins the point of the recall lever, not
just its oracle agreement."""

from __future__ import annotations

from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_ORACLE


def _topk(df):
    neighbors: dict[int, set[int]] = {}
    scores: dict[int, list[float]] = {}
    for r in df.collect():
        neighbors.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        scores.setdefault(r["query_id"], []).append(r["cosine"])
    return neighbors, {q: sorted(v, reverse=True) for q, v in scores.items()}


def test_multiprobe_recall_monotone(spark):
    truth, _ = _topk(QUERIES["similarity_topk_bruteforce"].fn(spark, SF_ORACLE))
    single, s_scores = _topk(QUERIES["similarity_ivf_topk"].fn(spark, SF_ORACLE))
    multi, m_scores = _topk(QUERIES["similarity_ivf_multiprobe"].fn(spark, SF_ORACLE))

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r1, r2 = recall(single), recall(multi)
    assert r2 >= r1, f"multiprobe recall {r2} < single-probe {r1}"
    # rank-by-rank, scores from the larger pool dominate the smaller pool's
    for q, sv in s_scores.items():
        mv = m_scores[q]
        assert len(mv) >= len(sv)
        for i, s in enumerate(sv):
            assert mv[i] >= s - 1e-12, f"query {q} rank {i}: {mv[i]} < {s}"
