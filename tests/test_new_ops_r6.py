"""Behavioral invariants for round-6 operators (independent local
recomputes, per the landing discipline)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_SMOKE


def _shingle_sets(max_df: int = 100):
    """Independent pandas recompute of the capped 3-gram shingle sets
    (mirrors operators.dedup.raw_shingle_rows + the df cap, with Python
    re/sets instead of Spark expressions)."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "text"]]
    sets: dict[int, set[str]] = {}
    for doc_id, text in docs.itertuples(index=False):
        toks = re.split(r"[ \t\n\r\f]+", text.strip().lower())
        if len(toks) < 3:
            continue
        sets[doc_id] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    df: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    return {
        d: {g for g in s if df[g] <= max_df} for d, s in sets.items()
    }


def test_containment_matches_bruteforce(spark):
    """Exact pair set, direction, and scores vs a Python-set recompute
    over every document pair."""
    capped = _shingle_sets()
    want = {}
    ids = sorted(capped)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = capped[a], capped[b]
            shared = len(sa & sb)
            if not shared:
                continue
            na, nb = len(sa), len(sb)
            small = min(na, nb)
            containment = shared / small
            if containment < 0.9:
                continue
            contained, container = (a, b) if na <= nb else (b, a)
            want[(contained, container)] = (
                small,
                containment,
                shared / (na + nb - shared),
            )
    rows = QUERIES["dedup_containment"].fn(spark, SF_SMOKE).collect()
    got = {
        (r["doc_contained"], r["doc_container"]): (
            r["n_contained_shingles"],
            r["containment"],
            r["jaccard"],
        )
        for r in rows
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert np.isclose(got[k][1], want[k][1], rtol=0, atol=1e-12)
        assert np.isclose(got[k][2], want[k][2], rtol=0, atol=1e-12)
    # direction invariant: the contained side never has the larger set
    for (contained, container), (small, _, _) in want.items():
        assert len(capped[contained]) <= len(capped[container])
        assert small == min(len(capped[contained]), len(capped[container]))


def test_theil_sen_matches_bruteforce(spark):
    """Median-of-slopes and OLS vs numpy over the daily counts."""
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = (
        ev.assign(d=pd.to_datetime(ev["ts"]).dt.floor("D"))
        .groupby("d")
        .size()
        .sort_index()
    )
    x = (daily.index - pd.Timestamp("1970-01-01")).days.to_numpy()
    y = daily.to_numpy()
    slopes = []
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            slopes.append(
                ((y[j] - y[i]) / (x[j] - x[i]), x[j] - x[i], y[j] - y[i])
            )
    slopes.sort()
    n = len(slopes)
    lo, hi = (n + 1) // 2 - 1, (n + 2) // 2 - 1
    ts_want = (slopes[lo][0] + slopes[hi][0]) / 2
    ols_want = np.polyfit(x.astype(float), y.astype(float), 1)[0]
    r = QUERIES["events_trend_theil_sen"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_days"] == len(x)
    assert r["n_pairs"] == n
    assert np.isclose(r["theil_sen_slope"], ts_want, rtol=0, atol=1e-12)
    assert np.isclose(r["ols_slope"], ols_want, rtol=1e-9)
    # robustness property (the reason the operator exists): poisoning one
    # day with a huge spike moves the recomputed OLS slope by orders of
    # magnitude more than the recomputed Theil-Sen slope
    y2 = y.copy()
    y2[len(y2) // 2] *= 50
    spiked = []
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            spiked.append((y2[j] - y2[i]) / (x[j] - x[i]))
    spiked.sort()
    ts_spiked = (spiked[lo] + spiked[hi]) / 2
    ols_spiked = np.polyfit(x.astype(float), y2.astype(float), 1)[0]
    assert abs(ols_spiked - ols_want) > 10 * abs(ts_spiked - ts_want)


def test_ams_f2_matches_hashlib(spark):
    """Z_s sign sums and the estimator vs a hashlib recompute; the truth
    side is the exact pandas Σf²."""
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")["user_id"]
    n_seeds = 16
    zs = []
    for s in range(n_seeds):
        tot = 0
        for k, cnt in ev.value_counts().items():
            digit = int(
                hashlib.md5(f"{s}|{k}".encode()).hexdigest()[0], 16
            )
            tot += cnt if digit % 2 == 0 else -cnt
        zs.append(tot)
    est_want = sum(z * z for z in zs) / n_seeds
    true_want = int((ev.value_counts() ** 2).sum())
    r = QUERIES["sketch_ams_f2"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_rows"] == len(ev)
    assert r["true_f2"] == true_want
    assert np.isclose(r["est_f2"], est_want, rtol=0, atol=1e-6)
    assert r["est_f2"] > 0


def test_mutual_knn_matches_bruteforce(spark):
    """Edge set and cosines vs a dense numpy kNN on the quantized
    vectors, plus the mutuality invariant itself."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.floor(
        np.stack(emb["embedding"].to_numpy()[order]).astype(np.float64) * 1_000_000
    )
    nrm = np.sqrt((mat * mat).sum(axis=1))
    cos = (mat @ mat.T) / (nrm[:, None] * nrm[None, :])
    k = 5
    topk: dict[int, set[int]] = {}
    for i in range(len(ids)):
        cand = [(-cos[i, j], ids[j]) for j in range(len(ids)) if j != i]
        cand.sort()
        topk[ids[i]] = {d for _, d in cand[:k]}
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if b in topk[a] and a in topk[b]:
                want.add((a, b))
    rows = QUERIES["similarity_mutual_knn"].fn(spark, SF_SMOKE).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert got == want
    idx = {v: i for i, v in enumerate(ids)}
    for r in rows:
        assert r["vec_a"] < r["vec_b"]  # canonical orientation
        assert np.isclose(
            r["cosine"], cos[idx[r["vec_a"]], idx[r["vec_b"]]], rtol=0, atol=1e-12
        )


def test_mmr_matches_bruteforce_greedy(spark):
    """MMR picks vs an independent Python greedy over independently
    recomputed relevance (from the query output's own BM25 frame) and
    cosines (numpy on the quantized vectors) — and the non-vacuity
    check: at least one query must reorder vs pure relevance."""
    lex = {
        (r["query_id"], r["neighbor_id"]): (r["bm25_q"], r["rnk"])
        for r in QUERIES["text_bm25_topk"].fn(spark, SF_SMOKE).collect()
    }
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.floor(
        np.stack(emb["embedding"].to_numpy()[order]).astype(np.float64) * 1_000_000
    )
    nrm = np.sqrt((mat * mat).sum(axis=1))
    idx = {v: i for i, v in enumerate(ids)}

    def cosine(a, b):
        return float(mat[idx[a]] @ mat[idx[b]] / (nrm[idx[a]] * nrm[idx[b]]))

    want = {}
    reordered = 0
    for qid in sorted({q for q, _ in lex}):
        cands = {d: s for (q, d), (s, _) in lex.items() if q == qid}
        mx = max(cands.values())
        reln = {d: s / mx for d, s in cands.items()}
        remaining, picked, rank = sorted(cands), [], 0
        while remaining:
            rank += 1
            best = None
            for d in remaining:
                ms = max((cosine(d, s) for s in picked), default=0.0)
                key = (-(0.7 * reln[d] - 0.3 * ms), d)
                if best is None or key < best:
                    best = key
            d = best[1]
            picked.append(d)
            remaining.remove(d)
            want[(qid, rank)] = (d, -best[0])
        rel_order = [
            d for d, _ in sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))
        ]
        reordered += picked != rel_order
    rows = QUERIES["retrieval_mmr_diversify"].fn(spark, SF_SMOKE).collect()
    got = {(r["query_id"], r["pick_rank"]): (r["neighbor_id"], r["mmr_score"]) for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert np.isclose(got[k][1], want[k][1], rtol=0, atol=1e-12)
    assert reordered >= 1  # diversity term actually does something here


def test_mp4_kernel_rejects_malformed_payloads(spark):
    """The box walk must reject truncated headers, undersized boxes,
    trailing garbage, and a missing leading ftyp — and parse a
    hand-built two-box file (with a 0-byte mdat) correctly."""
    import struct

    from naive_query_engine_spark.operators.multimodal import mp4_box_kernel

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    good = box(b"ftyp", b"mp42" + b"\x00" * 4 + b"iso2") + box(b"mdat", b"")
    cases = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "payload": [
                good,
                good + b"\x01\x02\x03",            # trailing garbage
                good[:-3],                          # truncated mid-box
                struct.pack(">I", 4) + b"ftyp",     # size < 8
                box(b"moov", b"") + box(b"ftyp", b"mp42"),  # ftyp not first
                b"",                                # empty payload
            ],
        }
    )
    out = {r["doc_id"]: r for _, r in next(mp4_box_kernel()([cases])).iterrows()}
    assert (
        out[1]["n_boxes"],
        out[1]["major_brand"],
        out[1]["mdat_bytes"],
        out[1]["is_valid_mp4"],
    ) == (2, "mp42", 0, True)
    for bad in (2, 3, 4, 5, 6):
        assert not out[bad]["is_valid_mp4"], bad
        assert out[bad]["n_boxes"] == 0


def test_mode_matches_pandas(spark):
    """Deterministic mode vs an independent pandas recompute with the
    same (count DESC, value ASC) tie rule."""
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    want = {}
    for status, grp in o.groupby("o_orderstatus"):
        counts = grp["o_orderpriority"].value_counts()
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[status] = top
    rows = QUERIES["agg_mode_exact"].fn(spark, SF_SMOKE).collect()
    got = {r["o_orderstatus"]: (r["mode_priority"], r["mode_count"]) for r in rows}
    assert got == want


def test_heaps_fit_matches_pandas(spark):
    """Checkpoint curve and quantized OLS vs an independent pandas
    recompute — including the saturation signature this corpus must
    produce (constant vocabulary ⇒ beta 0, r_sq NULL)."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "text"]]
    toks = {
        d: re.split(r"[ \t\n\r\f]+", t.strip().lower())
        for d, t in docs.itertuples(index=False)
    }
    max_id = max(toks)
    firsts: dict[str, int] = {}
    for d in sorted(toks):
        for w in toks[d]:
            firsts.setdefault(w, d)
    pts = []
    for i in range(1, 17):
        c = int(np.floor(i * (max_id + 1) / 16.0)) - 1
        nn = sum(len(ws) for d, ws in toks.items() if d <= c)
        vv = sum(1 for fd in firsts.values() if fd <= c)
        if nn > 0 and vv > 0:
            pts.append(
                (round(np.log10(nn) * 1e6), round(np.log10(vv) * 1e6))
            )
    x = np.array([p[0] for p in pts], dtype=object)
    y = np.array([p[1] for p in pts], dtype=object)
    n = len(pts)
    cxy = float(n * sum(a * b for a, b in pts) - sum(x) * sum(y))
    cxx = float(n * sum(a * a for a in x) - sum(x) ** 2)
    r = QUERIES["text_heaps_law_fit"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_points"] == n
    assert np.isclose(r["heaps_beta"], cxy / cxx, rtol=0, atol=1e-12)
    # the corpus signature: 31-word vocab saturates at checkpoint 1 ⇒
    # zero variance in V ⇒ r_sq must be NULL, never NaN/inf/an error
    assert len(set(y)) == 1 and r["r_sq"] is None
    assert np.isclose(
        r["log10_k"], (float(sum(y)) - (cxy / cxx) * float(sum(x))) / n / 1e6,
        rtol=0, atol=1e-9,
    )


def test_dedup_weighted_mixture_matches_unionfind(spark):
    """Effective-mass accounting vs an independent union-find over the
    recomputed Jaccard-edge graph, plus the planner invariants."""
    capped = _shingle_sets()
    parent = {d: d for d in capped}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ids = sorted(capped)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = capped[a], capped[b]
            shared = len(sa & sb)
            if shared and shared / (len(sa) + len(sb) - shared) >= 0.2:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "source"]]
    comp = {d: find(d) for d in capped}
    eff, n = {}, {}
    for doc_id, source in docs.itertuples(index=False):
        n[source] = n.get(source, 0) + 1
        # docs too short to shingle are their own singleton component
        if comp.get(doc_id, doc_id) == doc_id:
            eff[source] = eff.get(source, 0) + 1
    total_eff = sum(eff.values())
    budget = total_eff // len(n)
    rows = QUERIES["pipeline_dedup_weighted_mixture"].fn(spark, SF_SMOKE).collect()
    assert {r["source"] for r in rows} == set(n)
    for r in rows:
        s = r["source"]
        assert r["n_docs"] == n[s]
        assert r["n_effective"] == eff.get(s, 0), s
        assert r["source_budget"] == budget
        if r["n_effective"] > budget:
            assert np.isclose(
                r["sample_rate"], budget / r["n_effective"], rtol=0, atol=1e-12
            )
            assert r["sample_rate"] < 1.0
        else:
            assert r["sample_rate"] == 1.0
        assert np.isclose(
            r["dup_rate"], (r["n_docs"] - r["n_effective"]) / r["n_docs"],
            rtol=0, atol=1e-12,
        )
    # the planner must bite on this corpus: at least one source over
    # budget (down-sampled) — otherwise the query is vacuous here
    assert any(r["sample_rate"] < 1.0 for r in rows)


def test_knn_components_histogram_matches_unionfind(spark):
    """Cluster-size histogram vs union-find over an independently
    recomputed mutual-kNN edge set (dense numpy kNN + mutuality)."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.floor(
        np.stack(emb["embedding"].to_numpy()[order]).astype(np.float64) * 1_000_000
    )
    nrm = np.sqrt((mat * mat).sum(axis=1))
    cos = (mat @ mat.T) / (nrm[:, None] * nrm[None, :])
    k = 5
    topk = {}
    for i in range(len(ids)):
        cand = [(-cos[i, j], ids[j]) for j in range(len(ids)) if j != i]
        cand.sort()
        topk[ids[i]] = {d for _, d in cand[:k]}
    parent = {v: v for v in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if b in topk[a] and a in topk[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    sizes: dict[int, int] = {}
    for v in ids:
        r = find(v)
        sizes[r] = sizes.get(r, 0) + 1
    hist: dict[int, int] = {}
    for s in sizes.values():
        hist[s] = hist.get(s, 0) + 1
    rows = QUERIES["graph_knn_components"].fn(spark, SF_SMOKE).collect()
    got = {r["cluster_size"]: (r["n_clusters"], r["n_vectors"]) for r in rows}
    assert got == {s: (c, s * c) for s, c in hist.items()}
    # conservation: histogram must account for every vector exactly once
    assert sum(r["n_vectors"] for r in rows) == len(ids)
