"""No broadcast hint may cover an SF-scaling relation.

VERDICT r1's top finding: a forced ``F.broadcast`` on a table that grows
with the data (orders, customer, part, supplier, lineitem-derived
aggregates) overrides AQE's size check, so at 100× the plan builds a
multi-GB broadcast table and OOMs executors — while buying nothing
locally, where those tables sit under ``autoBroadcastJoinThreshold``
anyway.

This guard audits the *analyzed* logical plan of every registered query:
each ``ResolvedHint (strategy=broadcast)`` subtree must be provably
bounded, meaning one of

* every ``Relation`` it covers is a bounded dimension (nation: 25 rows,
  region: 5 rows — fixed by the TPC-H spec, independent of SF);
* the hint's subtree reaches an **ungrouped** aggregate before any
  relation (global max/avg/sum → exactly one row at any scale);
* a ``GlobalLimit`` bounds the subtree; or
* the query is in :data:`HINT_EXCEPTIONS` with a written justification
  (literal top-k filters and label-keyed centroid frames that the
  structural rules can't prove bounded).

Everything else — no hint — is AQE's call, which is the scale-safe
default (the 30× probe in tools/scale_probe.py shows AQE switching the
unhinted joins to shuffle strategy as sizes cross the threshold).
"""

from __future__ import annotations

import re

import pytest

from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_ORACLE

#: first-column prefix → table, and whether it scales with SF.
TABLE_BY_PREFIX = {
    "l_": ("lineitem", True),
    "o_": ("orders", True),
    "c_": ("customer", True),
    "p_": ("part", True),
    "s_": ("supplier", True),
    "n_": ("nation", False),
    "r_": ("region", False),
    "doc": ("documents", True),
    "event": ("events", True),
    "vec": ("embeddings", True),
}

#: queries whose hints are bounded for reasons the structural audit can't
#: see.  Each entry is a human-readable justification the reviewer can
#: check against the operator source.
HINT_EXCEPTIONS = {
    # operators/similarity.py: the hinted frame is embeddings filtered to
    # `vec_id < N_QUERY_VECS` (5) — a literal predicate bounds it to 5
    # rows regardless of corpus size.
    "similarity_topk_bruteforce": "query set: vec_id < N_QUERY_VECS literal filter",
    # operators/similarity.py: hints cover (a) the same 5-row query set
    # and (b) per-label centroids — a grouped aggregate keyed by the
    # label vocabulary, bounded by category count, not corpus size.
    "similarity_ivf_topk": "query set (5 rows) + label-keyed centroids",
    # same hints as similarity_ivf_topk; the probe frame is bounded by
    # nprobe x the vec_id < N_QUERY_VECS literal filter
    "similarity_ivf_multiprobe": "query probes (nprobe x 5 rows) + centroids",
    # composes similarity_topk_bruteforce, inheriting its bounded 5-row
    # query-set hint
    "similarity_recall_at_k": "inherits bruteforce's vec_id < N_QUERY_VECS hint",
    # operators/similarity.py: four per-prefix hints, each covering the
    # same embeddings frame filtered to `vec_id < N_QUERY_VECS` (5) — a
    # literal predicate bounds every hinted subtree to 5 rows regardless
    # of corpus size (the bruteforce justification, once per prefix)
    "embedding_matryoshka_prefix_recall": "query set per prefix: vec_id < N_QUERY_VECS literal filter",
    # operators/similarity.py: hints cover (a) the PQ codebook — a
    # grouped aggregate keyed by (label, subspace), bounded by
    # |labels| x PQ_M, not corpus size — and (b) the ADC lookup tables,
    # bounded by the vec_id < N_QUERY_VECS literal filter x the codebook
    "similarity_pq_adc_topk": "codebook (labels x PQ_M) + ADC tables (5 x codebook)",
    # operators/similarity.py: IVF-PQ composes the two exception classes
    # above — hints cover the per-label sub-centroid codebook
    # (labels x PQ_M rows, label-keyed like similarity_ivf_topk's cent),
    # the ADC tables (N_QUERY_VECS x PQ_M x labels, bounded by the
    # vec_id < 5 literal), and the probe cell set (nprobe x 5 rows via
    # the same literal) — never a corpus-scaling relation unhinted AQE
    # wouldn't handle
    "similarity_ivfpq_adc_topk": "codebook + ADC tables (5 x codebook) + probe cells (nprobe x 5)",
    # operators/kmeans.py: the hinted probe frame is ranked cells filtered
    # to `rn <= IVF_KM_NPROBE AND vec_id < N_QUERY_VECS` — bounded to
    # nprobe x 5 rows by literal predicates (the trained centroid frame is
    # a K-row createDataFrame literal, not a corpus relation)
    "similarity_ivf_kmeans_topk": "query probes (nprobe x 5 rows) + literal centroids",
    # operators/kmeans.py: the sweep's per-depth hints cover the same
    # ranked-cells frame filtered to `rn <= p AND vec_id < N_QUERY_VECS`
    # (p x 5 rows by literal predicates), the K-row createDataFrame
    # centroid literal, and the 1-row brute-force total — the
    # similarity_ivf_kmeans_topk justification, once per probe depth
    "similarity_ivf_nprobe_sweep": "query probes (p x 5 rows, three depths) + literal centroids + 1-row total",
    # composes similarity_ivf_kmeans_topk, inheriting its bounded hints
    "similarity_kmeans_recall_at_k": "inherits ivf_kmeans' bounded probe hint",
    # operators/similarity.py: the hinted audit-label frame is embeddings
    # filtered to `vec_id < KNN_AUDIT_VECS` (20) — a literal predicate
    # bounds it regardless of corpus size; neighbor labels stay unhinted
    "embedding_label_knn_disagreement": "audit labels: vec_id < KNN_AUDIT_VECS filter",
    # operators/similarity.py: same 5-row query-set hint as
    # similarity_topk_bruteforce (vec_id < N_QUERY_VECS literal filter)
    "embedding_hard_negatives": "query set: vec_id < N_QUERY_VECS literal filter",
    # operators/sketches.py: the hinted frame is the bloom bit set — a
    # DISTINCT over (seed, pos) where pos lives in a BLOOM_HEX_DIGITS hex
    # space: ≤ BLOOM_SEEDS · 16^BLOOM_HEX_DIGITS rows (k·m) at ANY input
    # size.  The hash-space bound is invisible to the structural audit.
    "sketch_bloom_membership": "bit set bounded by k x m = BLOOM_SEEDS x 16^BLOOM_HEX_DIGITS",
    # operators/sketches.py: the hinted frame is the count-min counter
    # matrix, grouped by (seed, pos) — ≤ CM_SEEDS · 16^CM_HEX_DIGITS rows
    # (d·w) regardless of stream length.
    "sketch_countmin_freq": "counter matrix bounded by d x w = CM_SEEDS x 16^CM_HEX_DIGITS",
    # operators/similarity.py: the hinted frame is the (label, dim)-keyed
    # centroid aggregate — bounded by |labels| x D (here 10 x 64), the
    # same label-keyed-centroid class as similarity_ivf_topk's exception;
    # the exploded corpus side stays unhinted.
    "embedding_centroid_outliers": "label x dim centroid aggregate (category-bounded)",
    # operators/analytics.py: the hinted frame is the per-type percentile
    # cutpoints — a grouped aggregate keyed by the event_type vocabulary
    # (~5 values), the same category-keyed class as the centroid
    # exceptions; the corpus side of the join stays unhinted.
    "events_value_winsorized": "per-type percentile cutpoints (event_type-keyed, category-bounded)",
    # operators/retrieval.py: composes similarity_topk_bruteforce,
    # inheriting its bounded 5-row query-set hint (vec_id < N_QUERY_VECS
    # literal filter) — the same inheritance as similarity_recall_at_k.
    "retrieval_rrf_fusion": "inherits bruteforce's vec_id < N_QUERY_VECS hint",
    # operators/sketches.py: the hinted frame is the Bloom filter — a
    # grouped aggregate keyed by word_idx, <= BLOOM_WORDS (2048) rows /
    # 8 KiB by geometry regardless of corpus size (pinned in
    # tests/test_new_ops_r12.py::test_bloom_state_is_bounded).
    "dedup_bloom_ingest_prefilter": "bloom relation: word_idx-keyed agg, <= 2048 rows by geometry",
    # operators/similarity.py: the hinted frame is the query payload —
    # embeddings filtered to `vec_id < N_QUERY_VECS` (5), the bruteforce
    # literal-filter justification; the graph/corpus sides stay unhinted
    # (the global-anchor min() hint is an ungrouped aggregate and passes
    # the structural rule on its own).
    "similarity_graph_ann_beam": "query payloads: vec_id < N_QUERY_VECS literal filter",
}

_MARKER = re.compile(r"[+:]- ")


def _depth(line: str) -> int:
    """Indentation depth of a plan-tree line = offset of its node marker."""
    last = None
    for m in _MARKER.finditer(line):
        last = m
    return last.start() if last else -1


def _node(line: str) -> str:
    last = None
    for m in _MARKER.finditer(line):
        last = m
    return line[last.end():] if last else line


def _classify_relation(node: str) -> tuple[str, bool] | None:
    m = re.match(r"Relation \[([^\]#,]+)", node)
    if not m:
        return None
    first_col = m.group(1)
    for prefix, info in TABLE_BY_PREFIX.items():
        if first_col.startswith(prefix):
            return info
    return (first_col, True)  # unknown table: treat as scaling (strict)


def hint_violations(plan_text: str) -> list[str]:
    """Return descriptions of broadcast hints covering SF-scaling scans."""
    lines = plan_text.splitlines()
    bad: list[str] = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line:
            continue
        d = _depth(line)
        j = i + 1
        # a bounded node (ungrouped Aggregate / GlobalLimit) bounds ONLY
        # its own branch — skip that branch and keep scanning siblings,
        # so a hint over join(bounded_agg, scaling_scan) is still caught
        skip_below: int | None = None
        while j < len(lines) and _depth(lines[j]) > d:
            nd = _depth(lines[j])
            if skip_below is not None:
                if nd > skip_below:
                    j += 1
                    continue
                skip_below = None
            node = _node(lines[j])
            if node.startswith("GlobalLimit") or (
                node.startswith("Aggregate [") and "], [" not in node
            ):
                # bounded: exactly one (or LIMIT-many) rows at any SF —
                # everything beneath this node is irrelevant
                skip_below = nd
                j += 1
                continue
            rel = _classify_relation(node)
            if rel is not None:
                table, scales = rel
                if scales:
                    bad.append(f"broadcast hint covers SF-scaling table {table!r}")
                # keep scanning: a multi-relation hint subtree must have
                # every relation bounded
            j += 1
    return bad


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_broadcast_hint_on_scaling_tables(name, spark):
    if name in HINT_EXCEPTIONS:
        pytest.skip(f"documented exception: {HINT_EXCEPTIONS[name]}")
    df = QUERIES[name].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().analyzed().toString()
    bad = hint_violations(plan)
    assert not bad, f"{name}: {bad}\n{plan[:3000]}"
