"""Behavioral invariants for round-7 operators (independent local
recomputes, per the landing discipline).

The r7 wave composes the kNN-graph overlays onto the per-IVF-cell
substrate (VERDICT r6 #3).  The substrate itself is oracle-pinned by
``similarity_mutual_knn_ivf``'s DuckDB oracle; these tests pin the
OVERLAYS by recomputing them in plain Python over the collected edge
frame, so a Spark-side overlay regression cannot hide behind an oracle
that shares its formulation.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from naive_query_engine_spark.operators.clustering import (
    LINK_PRED_TOP,
    MODULARITY_FP,
    RA_FP,
)
from naive_query_engine_spark.operators.kmeans import ivf_mutual_knn_edges
from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_SMOKE


def _ivf_edges(spark) -> list[tuple[int, int]]:
    rows = ivf_mutual_knn_edges(spark, SF_SMOKE).collect()
    edges = [(r["vec_a"], r["vec_b"]) for r in rows]
    assert edges and all(a < b for a, b in edges)  # canonical orientation
    assert len(edges) == len(set(edges))  # no duplicate pairs
    return edges


def test_link_prediction_ivf_matches_python_overlay(spark):
    """Top-N RA candidates vs a dict-based recompute of the overlay
    (sym/deg/wedge/anti-join/rank) over the collected IVF edge set."""
    edges = _ivf_edges(spark)
    edge_set = set(edges)
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {z: len(ns) for z, ns in adj.items()}
    scores: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    for z, ns in adj.items():
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1 :]:
                if (a, b) in edge_set:
                    continue  # already adjacent — not a prediction
                scores[(a, b)][0] += 1  # common neighbor count
                scores[(a, b)][1] += RA_FP // deg[z]
    want = sorted(
        ((ra, cn, a, b) for (a, b), (cn, ra) in scores.items()),
        key=lambda t: (-t[0], -t[1], t[2], t[3]),
    )[:LINK_PRED_TOP]
    got = [
        (r["ra_score_fp"], r["common_neighbors"], r["vec_a"], r["vec_b"])
        for r in QUERIES["graph_link_prediction_ivf"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == want


def test_label_modularity_ivf_matches_python_overlay(spark):
    """Every fixed-point modularity term vs an integer recompute over
    the collected IVF edge set and the parquet labels."""
    edges = _ivf_edges(spark)
    labels = (
        pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")[["vec_id", "label"]]
        .set_index("vec_id")["label"]
        .to_dict()
    )
    m = len(edges)
    intra = sum(1 for a, b in edges if labels[a] == labels[b])
    deg: dict[str, int] = defaultdict(int)
    for a, b in edges:
        deg[labels[a]] += 1
        deg[labels[b]] += 1
    expected_fp = sum(
        (d * d * MODULARITY_FP) // (4 * m * m) for d in deg.values()
    )
    [r] = QUERIES["graph_label_modularity_ivf"].fn(spark, SF_SMOKE).collect()
    assert r["n_edges"] == m
    assert r["n_intra_label"] == intra
    assert r["intra_share_fp"] == (intra * MODULARITY_FP) // m
    assert r["expected_share_fp"] == expected_fp
    assert r["modularity_fp"] == (intra * MODULARITY_FP) // m - expected_fp


def test_ivf_overlays_share_substrate_with_report(spark):
    """The overlays and the recall/precision report price the SAME edge
    frame: the report's n_ivf_edges equals the substrate edge count."""
    n_edges = len(_ivf_edges(spark))
    [r] = QUERIES["similarity_mutual_knn_ivf"].fn(spark, SF_SMOKE).collect()
    assert r["n_ivf_edges"] == n_edges


def test_zip_eocd_kernel_reverse_scan_and_rejects():
    """The trailer-directory walk must (a) locate the EOCD through a
    comment that CONTAINS a decoy EOCD signature (the comment-length
    consistency rule is the only correct disambiguator), and (b) reject
    truncation, signature corruption, count mismatches, and directories
    that don't tile exactly to the EOCD."""
    import struct

    from naive_query_engine_spark.operators.multimodal import zip_eocd_kernel

    def cd_entry(name: bytes, usize: int) -> bytes:
        return (
            b"PK\x01\x02"
            + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
            + struct.pack("<III", 0, usize, usize)
            + struct.pack("<HHHHH", len(name), 0, 0, 0, 0)
            + struct.pack("<I", 0)
            + struct.pack("<I", 0)
            + name
        )

    def eocd(n: int, cd_size: int, cd_off: int, comment: bytes) -> bytes:
        return (
            b"PK\x05\x06"
            + struct.pack("<HHHH", 0, 0, n, n)
            + struct.pack("<II", cd_size, cd_off)
            + struct.pack("<H", len(comment))
            + comment
        )

    local = b"\x00" * 10
    cd = cd_entry(b"fa", 100) + cd_entry(b"fb", 23)
    decoy_comment = b"xx" + b"PK\x05\x06" + b"\x00" * 18 + b"yy"
    good = local + cd + eocd(2, len(cd), len(local), decoy_comment)
    cases = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "payload": [
                good,
                good[:-1],                              # truncated comment
                good.replace(b"PK\x01\x02", b"PK\x01\x03", 1),  # bad CD sig
                local + cd + eocd(3, len(cd), len(local), b""),  # count lies
                local + cd + eocd(2, len(cd) - 1, len(local), b""),  # size lies
                local + cd + eocd(2, len(cd), len(local) - 1, b""),  # offset lies
                b"",                                     # empty payload
            ],
        }
    )
    out = {r["doc_id"]: r for _, r in next(zip_eocd_kernel()([cases])).iterrows()}
    assert (
        out[1]["n_entries"],
        out[1]["cd_size"],
        out[1]["cd_offset"],
        out[1]["total_uncompressed"],
        out[1]["comment_len"],
        out[1]["is_valid_zip"],
    ) == (2, len(cd), len(local), 123, len(decoy_comment), True)
    for bad in (2, 3, 4, 5, 6, 7):
        assert not out[bad]["is_valid_zip"], bad
        assert out[bad]["total_uncompressed"] == 0, bad


def test_t_closeness_matches_python_recompute(spark):
    """Every fixed-point TVD term vs an integer recompute over the raw
    parquet rows (pandas), including the absent-band completion."""
    import math
    from collections import Counter, defaultdict

    from naive_query_engine_spark.operators.quality import (
        SENS_BAND,
        T_CLOSE,
        T_CLOSE_FP,
    )
    from naive_query_engine_spark.queries import QUERIES

    pdf = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[
        ["c_mktsegment", "c_nationkey", "c_acctbal"]
    ]
    pdf["band"] = pdf["c_acctbal"].map(lambda v: math.floor(float(v) / SENS_BAND))
    g = Counter(pdf["band"])
    n = len(pdf)
    cell_counts: dict[tuple, Counter] = defaultdict(Counter)
    for seg, nat, band in zip(pdf["c_mktsegment"], pdf["c_nationkey"], pdf["band"]):
        cell_counts[(seg, nat)][band] += 1
    tvds = []
    for counts in cell_counts.values():
        n_c = sum(counts.values())
        num = sum(abs(counts.get(b, 0) * n - g[b] * n_c) for b in g)
        tvds.append((T_CLOSE_FP * num) // (2 * n_c * n))
    [r] = QUERIES["audit_t_closeness"].fn(spark, SF_SMOKE).collect()
    assert r["n_cells"] == len(tvds)
    assert r["max_tvd_fp"] == max(tvds)
    assert r["avg_tvd_fp"] == sum(tvds) // len(tvds)
    assert r["n_skewed_cells"] == sum(1 for v in tvds if v > T_CLOSE)


def test_range_search_ivf_is_cell_restricted_cosine_pairs(spark):
    """The τ-range search must return EXACTLY the exact-twin pairs
    (similarity_cosine_pairs) restricted to co-located IVF cells —
    same keys, bit-identical cosines — and be nonempty at smoke SF."""
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in QUERIES["similarity_range_search_ivf"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in QUERIES["similarity_cosine_pairs"].fn(spark, SF_SMOKE).collect()
    }
    from naive_query_engine_spark.operators.kmeans import ivf_cell_cosine_pairs

    cells = {
        (r["vec_a"], r["vec_b"])
        for r in ivf_cell_cosine_pairs(spark, SF_SMOKE).collect()
    }
    want = {k: v for k, v in exact.items() if k in cells}
    assert got, "τ-range search empty at smoke SF — threshold too high to test"
    assert got == want


def test_neighborhood_function_ivf_matches_python_bfs(spark):
    """N(1)/N(2) pair counts and fixed-point mean reach vs a set-based
    recompute over the collected IVF edge frame."""
    from naive_query_engine_spark.operators.kmeans import REACH_FP

    edges = _ivf_edges(spark)
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nv = len(adj)
    n1 = sum(len(ns) for ns in adj.values())
    n2 = 0
    for u, ns in adj.items():
        reach = set(ns)
        for m in ns:
            reach |= adj[m]
        reach.discard(u)
        n2 += len(reach)
    rows = QUERIES["graph_neighborhood_function_ivf"].fn(spark, SF_SMOKE).collect()
    got = {r["hop"]: r for r in rows}
    assert got[1]["n_pairs_exact"] == n1
    assert got[2]["n_pairs_exact"] == n2
    assert got[1]["n_vertices"] == got[2]["n_vertices"] == nv
    assert got[1]["mean_reach_fp"] == (n1 * REACH_FP) // nv
    assert got[2]["mean_reach_fp"] == (n2 * REACH_FP) // nv
    assert got[1]["hll_within_tolerance"] and got[2]["hll_within_tolerance"]


def test_deletion_vector_stats_matches_pandas(spark):
    """Every modeled column vs a pandas recompute over raw lineitem."""
    from naive_query_engine_spark.operators.layout import (
        DV_BYTES_PER_ROW,
        DV_FILE_SPAN,
        DV_FP,
        DV_HEADER_BYTES,
        DV_REWRITE_FP,
    )
    from naive_query_engine_spark.queries import QUERIES

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_orderkey", "l_returnflag"]
    ]
    li["file_id"] = li["l_orderkey"] // DV_FILE_SPAN
    g = li.groupby("file_id").agg(
        n_rows=("l_orderkey", "size"),
        n_deleted=("l_returnflag", lambda s: int((s == "R").sum())),
    )
    rows = QUERIES["lakehouse_deletion_vector_stats"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == len(g)
    assert any(r["n_deleted"] > 0 for r in rows)  # the model isn't vacuous
    for r in rows:
        n, d = int(g.loc[r["file_id"], "n_rows"]), int(g.loc[r["file_id"], "n_deleted"])
        assert r["n_rows"] == n and r["n_deleted"] == d
        assert r["deleted_share_fp"] == (d * DV_FP) // n
        assert r["dv_bytes"] == (DV_HEADER_BYTES + DV_BYTES_PER_ROW * d if d else 0)
        assert r["scan_amplification_fp"] == ((n * DV_FP) // (n - d) if d < n else 0)
        assert r["rewrite_recommended"] == ((d * DV_FP) // n > DV_REWRITE_FP)


def test_diff_in_diff_matches_pandas(spark):
    """The DiD estimate and Welch z against a pandas recompute with the
    shared md5 arm assignment and midpoint split."""
    import hashlib
    import math

    from naive_query_engine_spark.queries import QUERIES

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[["user_id", "ts"]]
    us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    mid = math.floor((us.min() + us.max()) / 2.0)
    ev = ev.assign(us=us)
    per_user = ev.groupby("user_id")["us"].agg(
        d=lambda s: int((s >= mid).sum()) - int((s < mid).sum())
    )
    arms = {"A": [], "B": []}
    for uid, d in per_user["d"].items():
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16)
        arms["A" if h % 2 == 0 else "B"].append(d)

    def moments(ds):
        n, sd, sdd = len(ds), sum(ds), sum(x * x for x in ds)
        mean = sd / n
        var = (n * sdd - sd * sd) / (n * n * (n - 1))
        return n, mean, var

    na, ma, va = moments(arms["A"])
    nb, mb, vb = moments(arms["B"])
    [r] = QUERIES["events_diff_in_diff"].fn(spark, SF_SMOKE).collect()
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert abs(r["mean_diff_a"] - ma) < 1e-12
    assert abs(r["mean_diff_b"] - mb) < 1e-12
    assert abs(r["did_estimate"] - (mb - ma)) < 1e-12
    assert abs(r["z_score"] - (mb - ma) / math.sqrt(va + vb)) < 1e-9


def _xy2d(order_n: int, x: int, y: int) -> int:
    """Literature xy2d (independent of the generated SQL expressions)."""
    d = 0
    s = order_n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = order_n - 1 - x
                y = order_n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_curve_locality_compare_matches_python(spark):
    """Both curves' per-cell spread aggregates vs a full recompute: ranks
    via pandas sort, Morton via bit interleave, Hilbert via the
    literature xy2d (NOT the generated expressions — an independent
    implementation, so a generator bug cannot self-confirm)."""
    from collections import defaultdict

    from naive_query_engine_spark.operators.layout import HILBERT_SIDE
    from naive_query_engine_spark.queries import QUERIES

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[
        ["event_id", "user_id", "ts"]
    ]
    n = len(ev)
    ra = {
        eid: i
        for i, eid in enumerate(
            ev.sort_values(["user_id", "event_id"])["event_id"]
        )
    }
    rb = {
        eid: i
        for i, eid in enumerate(ev.sort_values(["ts", "event_id"])["event_id"])
    }

    def interleave(v: int) -> int:
        out = 0
        for bit in range(16):
            out |= ((v >> bit) & 1) << (2 * bit)
        return out

    cells: dict[tuple, list] = defaultdict(list)
    for eid in ev["event_id"]:
        ua = ra[eid] * 65535 // (n - 1)
        ub = rb[eid] * 65535 // (n - 1)
        zkey = interleave(ua) | (interleave(ub) << 1)
        hkey = _xy2d(HILBERT_SIDE, ua, ub)
        cells[("morton", zkey >> 24)].append((ua, ub))
        cells[("hilbert", hkey >> 24)].append((ua, ub))
    want = {}
    for curve in ("hilbert", "morton"):
        ccells = {c: v for (cu, c), v in cells.items() if cu == curve}
        ua_spreads = [
            max(u for u, _ in v) - min(u for u, _ in v) for v in ccells.values()
        ]
        ub_spreads = [
            max(b for _, b in v) - min(b for _, b in v) for v in ccells.values()
        ]
        want[curve] = (
            len(ccells),
            sum(ua_spreads),
            sum(ub_spreads),
            max(ua_spreads),
            max(ub_spreads),
        )
    rows = QUERIES["layout_curve_locality_compare"].fn(spark, SF_SMOKE).collect()
    got = {
        r["curve"]: (
            r["n_cells"],
            r["total_ua_spread"],
            r["total_ub_spread"],
            r["max_ua_spread"],
            r["max_ub_spread"],
        )
        for r in rows
    }
    assert got == want


def _gopher_fail_sets(sf_dir: str):
    """Per-rule failure doc-id sets recomputed in plain Python (the
    independent implementation of the four Gopher rules)."""
    import re

    from naive_query_engine_spark.operators.text import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOK,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOP,
        GOPHER_MIN_TOK,
        STOPWORDS,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    stop = set(STOPWORDS)
    fails: dict[str, set] = {k: set() for k, _ in
                             (("len", 0), ("word_len", 0), ("stopword", 0),
                              ("repetition", 0))}
    order = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = re.split(r"[ \t\n\r\f]+", text.strip().lower())
        n_tok = len(toks)
        n_nonspace = len(re.sub(r"[ \t\n\r\f]+", "", text))
        n_stop = sum(1 for x in toks if x in stop)
        n_distinct = len(set(toks))
        if not (GOPHER_MIN_TOK <= n_tok <= GOPHER_MAX_TOK):
            fails["len"].add(doc_id)
        if not (GOPHER_MIN_MEAN_LEN * n_tok <= n_nonspace
                <= GOPHER_MAX_MEAN_LEN * n_tok):
            fails["word_len"].add(doc_id)
        if n_stop < GOPHER_MIN_STOP:
            fails["stopword"].add(doc_id)
        if 2 * n_distinct < n_tok:
            fails["repetition"].add(doc_id)
        order.append(doc_id)
    return fails, order


def test_quality_funnel_matches_python(spark):
    """Each stage's in/rejected/out vs a sequential recompute charging
    every doc to its first failing rule."""
    from naive_query_engine_spark.operators.text import FUNNEL_FP
    from naive_query_engine_spark.queries import QUERIES

    fails, order = _gopher_fail_sets(SF_SMOKE)
    stages = ["len", "word_len", "stopword", "repetition"]
    n_in = len(order)
    remaining = set(order)
    want = []
    for i, st in enumerate(stages, 1):
        rejected = remaining & fails[st]
        want.append((i, st, len(remaining), len(rejected),
                     len(remaining) - len(rejected),
                     (len(rejected) * FUNNEL_FP) // len(remaining)))
        remaining -= rejected
    rows = QUERIES["text_quality_funnel"].fn(spark, SF_SMOKE).collect()
    got = [(r["stage"], r["rule"], r["n_in"], r["n_rejected"], r["n_out"],
            r["reject_share_fp"]) for r in rows]
    assert got == want
    assert want[0][3] > 0 or want[1][3] > 0  # the funnel isn't vacuous


def test_rule_overlap_matches_python(spark):
    """Every pair cell (fail counts, joint fails, Jaccard) vs the
    recomputed failure sets."""
    from naive_query_engine_spark.operators.text import FUNNEL_FP
    from naive_query_engine_spark.queries import QUERIES

    fails, _ = _gopher_fail_sets(SF_SMOKE)
    labels = ["len", "word_len", "stopword", "repetition"]
    want = {}
    for i, la in enumerate(labels):
        for lb in labels[i:]:
            both = len(fails[la] & fails[lb])
            union = len(fails[la]) + len(fails[lb]) - both
            want[(la, lb)] = (len(fails[la]), len(fails[lb]), both,
                              (both * FUNNEL_FP) // union if union else 0)
    rows = QUERIES["text_quality_rule_overlap"].fn(spark, SF_SMOKE).collect()
    got = {
        (r["rule_a"], r["rule_b"]): (r["n_fail_a"], r["n_fail_b"],
                                     r["n_fail_both"], r["jaccard_fp"])
        for r in rows
    }
    assert got == want
    assert len(got) == 10


def test_salting_plan_matches_pandas(spark):
    """Factors/shares vs a pandas recompute, and the sf0.1-scale sanity
    that factors actually exceed 1 (the planner isn't vacuous)."""
    from naive_query_engine_spark.operators.skew import (
        SALT_FP,
        SALT_MAX,
        SALT_TARGET_ROWS,
    )
    from naive_query_engine_spark.queries import QUERIES

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")["event_type"]
    counts = ev.value_counts().to_dict()
    n = len(ev)
    rows = QUERIES["events_salting_plan"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == len(counts)
    prev = None
    for r in rows:
        c = counts[r["event_type"]]
        f = min((c + SALT_TARGET_ROWS - 1) // SALT_TARGET_ROWS, SALT_MAX)
        assert r["n_events"] == c
        assert r["share_fp"] == (c * SALT_FP) // n
        assert r["salt_factor"] == f
        assert r["rows_per_salt"] == (c + f - 1) // f
        if prev is not None:  # total order: n desc, type asc
            assert (-prev["n_events"], prev["event_type"]) <= (
                -r["n_events"], r["event_type"])
        prev = r


def test_uncertainty_sample_matches_python(spark):
    """Top-K margin picks vs a recompute over the collected scorer
    output (total order (margin, doc_id) pinned)."""
    from naive_query_engine_spark.operators.pipeline import (
        TIER_MID,
        UNCERTAINTY_K,
    )
    from naive_query_engine_spark.queries import QUERIES

    scored = QUERIES["pipeline_model_scoring"].fn(spark, SF_SMOKE).collect()
    want = sorted(
        ((abs(r["score"] - TIER_MID), r["doc_id"], r["score"]) for r in scored)
    )[:UNCERTAINTY_K]
    got = [
        (r["margin"], r["doc_id"], r["score"])
        for r in QUERIES["dataset_uncertainty_sample"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == want


def test_position_based_attribution_matches_python(spark):
    """Per-channel credits/revenue vs a full pandas recompute of the
    U-shape model, plus credit conservation (organic + touched = every
    purchase, up to the documented DIV shortfall on middle shares)."""
    from collections import defaultdict

    from naive_query_engine_spark.operators.analytics import (
        ATTRIB_WINDOW_US,
        MT_EDGE_FP,
        MT_FP,
        MT_MAX_TOUCH,
        MT_MID_FP,
        MT_USER_WEEK_CAP,
        MT_WEEK_US,
    )
    from naive_query_engine_spark.queries import QUERIES

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[
        ["event_id", "user_id", "ts", "event_type", "value"]
    ]
    ev["us"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    touches = defaultdict(list)
    for r in ev.itertuples():
        if r.event_type in ("click", "view"):
            touches[r.user_id].append((r.us, r.event_id, r.event_type))
    for k, v in touches.items():
        v.sort()
        # per-user-week rate cap: keep the LATEST MT_USER_WEEK_CAP per week
        by_week = defaultdict(list)
        for tup in v:
            by_week[tup[0] // MT_WEEK_US].append(tup)
        touches[k] = sorted(
            tup
            for week in by_week.values()
            for tup in week[-MT_USER_WEEK_CAP:]
        )
    want = defaultdict(lambda: [0, 0, 0])  # channel -> [n, credit, revenue]
    n_purchases = 0
    for r in ev.itertuples():
        if r.event_type != "purchase":
            continue
        n_purchases += 1
        cents = int(round(r.value * 100))
        ts_list = [
            (us, eid, ch)
            for us, eid, ch in touches.get(r.user_id, [])
            if ((us, eid) < (r.us, r.event_id)) and r.us - us <= ATTRIB_WINDOW_US
        ][-MT_MAX_TOUCH:]  # per-conversion cap: U-shape over the last n
        if not ts_list:
            w = want["organic"]
            w[0] += 1
            w[1] += MT_FP
            w[2] += cents * MT_FP
            continue
        n = len(ts_list)
        for i, (_, _, ch) in enumerate(ts_list, 1):
            if n == 1:
                wt = MT_FP
            elif n == 2:
                wt = MT_FP // 2
            elif i in (1, n):
                wt = MT_EDGE_FP
            else:
                wt = MT_MID_FP // (n - 2)
            w = want[ch]
            w[0] += 1
            w[1] += wt
            w[2] += cents * wt
    rows = QUERIES["events_attribution_position_based"].fn(spark, SF_SMOKE).collect()
    got = {
        r["channel"]: [r["n_touchpoints"], r["credit_fp"],
                       r["revenue_credit_microcents"]]
        for r in rows
    }
    assert got == dict(want)
    total_credit = sum(v[1] for v in want.values())
    assert total_credit <= n_purchases * MT_FP  # DIV shortfall only shrinks
    assert total_credit > (n_purchases * MT_FP * 99) // 100


def test_vocab_coverage_curve_matches_python(spark):
    """Each curve point vs a Counter-based recompute over the raw token
    stream (count-desc, token-asc total order)."""
    import re
    from collections import Counter

    from naive_query_engine_spark.operators.text import (
        COVERAGE_FP,
        COVERAGE_KS,
    )
    from naive_query_engine_spark.queries import QUERIES

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")["text"]
    counts = Counter(
        tok
        for text in docs
        for tok in re.split(r"[ \t\n\r\f]+", text.strip().lower())
    )
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    want = []
    cum = 0
    for i, (_, c) in enumerate(ordered, 1):
        cum += c
        if i in COVERAGE_KS:
            want.append((i, cum, total, len(counts),
                         (cum * COVERAGE_FP) // total))
    rows = QUERIES["text_vocab_coverage_curve"].fn(spark, SF_SMOKE).collect()
    got = [(r["vocab_size"], r["covered_tokens"], r["total_tokens"],
            r["n_types"], r["coverage_ppm"]) for r in rows]
    assert got == want
    assert len(got) >= 2  # at least two curve points exist at smoke SF


def test_knn_components_ivf_matches_unionfind(spark):
    """Cluster-size histogram vs a union-find recompute over the
    collected IVF edge frame (singletons included), plus the
    substrate-restriction invariant: cells only SPLIT components, so
    the IVF variant has at least as many clusters as the exact one."""
    edges = _ivf_edges(spark)
    n_vecs = len(pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet"))
    parent = list(range(n_vecs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    sizes = Counter(Counter(find(v) for v in range(n_vecs)).values())
    rows = QUERIES["graph_knn_components_ivf"].fn(spark, SF_SMOKE).collect()
    got = {r["cluster_size"]: (r["n_clusters"], r["n_vectors"]) for r in rows}
    assert got == {s: (n, s * n) for s, n in sizes.items()}
    n_ivf_clusters = sum(n for n in sizes.values())
    exact_rows = QUERIES["graph_knn_components"].fn(spark, SF_SMOKE).collect()
    n_exact_clusters = sum(r["n_clusters"] for r in exact_rows)
    assert n_ivf_clusters >= n_exact_clusters
