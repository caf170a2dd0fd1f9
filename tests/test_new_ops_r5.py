"""Behavioral invariants for round-5 operators (independent local
recomputes, per the landing discipline)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_join_size_estimator_bounds(spark):
    """CM inner product over-estimates (collisions only add) and, at
    w=65536 with these table sizes, stays within a few percent; the true
    side must equal an independent pandas recompute."""
    r = QUERIES["sketch_join_size_estimate"].fn(spark, SF_SMOKE).collect()[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")["user_id"].value_counts()
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")["o_custkey"].value_counts()
    true_rows = int((ev * o).dropna().sum())
    assert r["true_rows"] == true_rows
    assert r["est_rows"] >= r["true_rows"]  # CM never undercounts
    assert r["est_over_true"] < 1.25, r["est_over_true"]


def test_jpeg_kernel_handles_malformed_payloads(spark):
    """The marker walk must reject truncated / non-JPEG / SOF-less
    payloads instead of mis-parsing them (real ingest sees all three),
    and parse a hand-built JFIF with extra segments correctly."""
    import struct

    from naive_query_engine_spark.operators.multimodal import jpeg_meta_kernel

    import pandas as pd

    def jfif(h, w, extra_app=False):
        b = b"\xff\xd8" + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        if extra_app:
            b += b"\xff\xe1\x00\x06exif"  # APP1, length 6 (4 payload bytes)
        b += b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        return b

    cases = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "payload": [
                jfif(480, 640),
                jfif(7, 9, extra_app=True),  # segment walk must skip APP1
                b"\x89PNG\r\n\x1a\n",  # not a JPEG
                b"\xff\xd8\xff\xe0\x00\x10JF",  # truncated mid-APP0
                b"\xff\xd8",  # SOI only, no SOF
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for _, r in next(jpeg_meta_kernel()([cases])).iterrows()
    }
    assert (out[1]["width"], out[1]["height"], out[1]["is_valid_jpeg"]) == (640, 480, True)
    assert (out[2]["width"], out[2]["height"], out[2]["n_components"]) == (9, 7, 3)
    assert not out[3]["is_valid_jpeg"]
    assert not out[4]["is_valid_jpeg"]
    assert not out[5]["is_valid_jpeg"]


def test_jackknife_ci_matches_pandas_recompute(spark):
    """Exact recompute: bucket sums in pandas Decimal-exact arithmetic,
    leave-one-out means floored to the same fixed point, variance as an
    exact integer — the SE must match Spark's bit-for-bit, and bracket
    the naive s/sqrt(n) SE from above (clustered users => wider CI)."""
    import math
    from decimal import Decimal

    from naive_query_engine_spark.operators.analytics import JK_FP_SCALE

    r = QUERIES["events_value_jackknife_ci"].fn(spark, SF_SMOKE).collect()[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[["user_id", "value"]]
    import hashlib

    bk = ev["user_id"].map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[0], 16)
    )
    v = ev["value"].map(lambda x: Decimal(str(round(x, 2))))
    n, s = len(v), sum(v)
    mfp = []
    for b in sorted(bk.unique()):
        sel = bk == b
        nb, sb = int(sel.sum()), sum(v[sel])
        mfp.append(math.floor(float(s - sb) / float(n - nb) * JK_FP_SCALE))
    B, sfp = len(mfp), sum(mfp)
    var_scaled = sum((B * m - sfp) ** 2 for m in mfp)
    se = math.sqrt(float(var_scaled) * (float(B) - 1) / float(B)) / (
        float(B) * float(JK_FP_SCALE)
    )
    assert r["n_buckets"] == B
    assert r["se_jackknife"] == se
    # naive iid SE for comparison: jackknife must not be narrower
    x = ev["value"].to_numpy()
    naive = x.std(ddof=1) / np.sqrt(len(x))
    assert se >= naive * 0.8, (se, naive)


def test_zipf_fit_matches_numpy_polyfit(spark):
    """Independent recompute: top-1000 word counts in pandas, the same
    1e6-quantized log10 points, numpy.polyfit — slope/intercept must
    match to float precision, and n_words equals the (tiny synthetic)
    vocabulary size."""
    from naive_query_engine_spark.operators.text import ZIPF_FP, ZIPF_TOP

    r = QUERIES["text_zipf_slope"].fn(spark, SF_SMOKE).collect()[0]
    import re

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")["text"]
    cnt: dict = {}
    for txt in docs:
        for w in re.split(r"[ \t\n\r\f]+", txt.strip().lower()):
            cnt[w] = cnt.get(w, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    assert r["n_words"] == len(top)
    x = np.array([round(np.log10(i + 1) * ZIPF_FP) for i in range(len(top))])
    y = np.array([round(np.log10(c) * ZIPF_FP) for _, c in top])
    slope, intercept = np.polyfit(x.astype(float), y.astype(float), 1)
    assert abs(r["zipf_slope"] - slope) < 1e-9, (r["zipf_slope"], slope)
    assert abs(r["log10_intercept"] - intercept / ZIPF_FP) < 1e-9


def test_retrieval_eval_metrics_consistency(spark):
    """Metric identities that hold for ANY ranking: rr_fp = floor(FP /
    first_rel_rank) when a hit exists (0 otherwise), dcg <= idcg so
    ndcg in [0, 1], precision = n_rel/k, and the label is non-vacuous
    (at least one query has a relevant hit on the smoke corpus)."""
    import math

    from naive_query_engine_spark.operators.retrieval import EVAL_FP

    rows = QUERIES["retrieval_eval_mrr_ndcg"].fn(spark, SF_SMOKE).collect()
    assert rows
    assert any(r["n_rel_topk"] > 0 for r in rows)  # non-vacuous label
    for r in rows:
        if r["first_rel_rank"] is None:
            assert r["rr_fp"] == 0 and r["dcg_fp"] == 0 and r["ndcg_at_k"] == 0.0
        else:
            assert r["rr_fp"] == math.floor(EVAL_FP / float(r["first_rel_rank"]))
            assert r["dcg_fp"] > 0
        assert 0 <= r["dcg_fp"] <= r["idcg_fp"]
        assert 0.0 <= r["ndcg_at_k"] <= 1.0
        assert r["precision_at_k"] == r["n_rel_topk"] / r["n_retrieved"]


def test_compaction_plan_invariants(spark):
    """Every partition lands in exactly one group; group totals cover the
    corpus bytes exactly; each group's start offset falls in its bin
    (the linear-packing contract)."""
    from naive_query_engine_spark.operators.layout import COMPACT_TARGET_BYTES

    rows = QUERIES["layout_compaction_plan"].fn(spark, SF_SMOKE).collect()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    total_bytes = int(docs["text"].str.len().sum())
    total_docs = len(docs)
    assert sum(r["total_bytes"] for r in rows) == total_bytes
    assert sum(r["total_docs"] for r in rows) == total_docs
    assert sum(r["n_partitions"] for r in rows) == docs.groupby(["source", "lang"]).ngroups
    # groups are contiguous 0..G-1
    gids = sorted(r["compaction_group"] for r in rows)
    assert gids == list(range(len(gids)))


def test_bloom_prefilter_never_false_negative(spark):
    """Bloom filters have NO false negatives: every true match must pass,
    so n_pass >= n_true; and the filter must actually be selective."""
    r = QUERIES["join_bloom_prefilter"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_pass_bloom"] >= r["n_true_match"]
    assert r["n_false_positive"] == r["n_pass_bloom"] - r["n_true_match"]
    assert r["bloom_selectivity"] < 0.5  # discards most of the fact table
    # independent truth recompute
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    keys = set(c.loc[c["c_acctbal"] > 9000, "c_custkey"])
    assert r["n_true_match"] == int(o["o_custkey"].isin(keys).sum())


def test_gopher_rules_match_python_recompute(spark):
    """Every per-source rule-failure count must equal an independent
    pure-Python recompute (re.split tokenization, set() for distinct),
    and no rule may be vacuous corpus-wide (a rule that never fires is
    not a filter — the same standard that rejected the vacuous
    same-source retrieval label)."""
    import re

    from naive_query_engine_spark.operators.text import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOK,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOP,
        GOPHER_MIN_TOK,
        STOPWORDS,
    )

    rows = {
        r["source"]: r
        for r in QUERIES["text_gopher_quality_rules"].fn(spark, SF_SMOKE).collect()
    }
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    stop = set(STOPWORDS)
    exp: dict[str, dict[str, int]] = {}
    for _, d in docs.iterrows():
        toks = re.split(r"[ \t\n\r\f]+", d["text"].strip().lower())
        n_tok = len(toks)
        n_nonspace = len(re.sub(r"[ \t\n\r\f]+", "", d["text"]))
        r_len = GOPHER_MIN_TOK <= n_tok <= GOPHER_MAX_TOK
        r_word_len = (
            GOPHER_MIN_MEAN_LEN * n_tok <= n_nonspace <= GOPHER_MAX_MEAN_LEN * n_tok
        )
        r_stop = sum(1 for w in toks if w in stop) >= GOPHER_MIN_STOP
        r_rep = 2 * len(set(toks)) >= n_tok
        e = exp.setdefault(
            d["source"],
            {"n_docs": 0, "fail_len": 0, "fail_word_len": 0,
             "fail_stopword": 0, "fail_repetition": 0, "pass_all": 0},
        )
        e["n_docs"] += 1
        e["fail_len"] += not r_len
        e["fail_word_len"] += not r_word_len
        e["fail_stopword"] += not r_stop
        e["fail_repetition"] += not r_rep
        e["pass_all"] += r_len and r_word_len and r_stop and r_rep
    assert set(rows) == set(exp)
    for src, e in exp.items():
        for k, v in e.items():
            assert rows[src][k] == v, (src, k, rows[src][k], v)
    # non-vacuity: every rule fires somewhere, and some docs still pass
    for k in ("fail_len", "fail_word_len", "fail_stopword", "fail_repetition"):
        assert sum(e[k] for e in exp.values()) > 0, k
    assert sum(e["pass_all"] for e in exp.values()) > 0


def test_zone_map_stats_match_pandas_recompute(spark):
    """Zone assignment, zone min/max, and every skip count must equal an
    independent pandas recompute; and the report must show the layout
    CONTRAST that is its whole point (key predicate prunes on ingest
    only, date predicate on date_sorted only; the price predicate is the
    documented negative control on both)."""
    from naive_query_engine_spark.operators.layout import (
        ZONE_N,
        ZONE_PRED_DATE_HI,
        ZONE_PRED_DATE_LO,
        ZONE_PRED_KEY_HI,
        ZONE_PRED_KEY_LO,
        ZONE_PRED_PRICE_MIN,
    )

    got = {
        (r["layout"], r["predicate"]): r
        for r in QUERIES["layout_zone_map_stats"].fn(spark, SF_SMOKE).collect()
    }
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    lo = pd.Timestamp(ZONE_PRED_DATE_LO)
    hi = pd.Timestamp(ZONE_PRED_DATE_HI)
    for layout, cols in (
        ("ingest", ["o_orderkey"]),
        ("date_sorted", ["o_orderdate", "o_orderkey"]),
    ):
        d = o.sort_values(cols, kind="mergesort").reset_index(drop=True)
        d["z"] = (d.index.values * ZONE_N) // len(d)
        g = d.groupby("z").agg(
            k_lo=("o_orderkey", "min"), k_hi=("o_orderkey", "max"),
            d_lo=("o_orderdate", "min"), d_hi=("o_orderdate", "max"),
            p_hi=("o_totalprice", "max"), cnt=("o_orderkey", "size"),
        )
        flags = {
            "date_q3_1997": (g["d_hi"] < lo) | (g["d_lo"] >= hi),
            "price_ge_450k": g["p_hi"] < ZONE_PRED_PRICE_MIN,
            "orderkey_100_400": (g["k_hi"] < ZONE_PRED_KEY_LO)
            | (g["k_lo"] > ZONE_PRED_KEY_HI),
        }
        for pname, s in flags.items():
            r = got[(layout, pname)]
            assert r["n_zones"] == len(g)
            assert r["n_zones_skipped"] == int(s.sum()), (layout, pname)
            assert r["n_rows_skipped"] == int(g.loc[s, "cnt"].sum()), (layout, pname)
    # the layout contrast: each sort key prunes its own predicate only
    assert got[("ingest", "orderkey_100_400")]["zone_skip_rate"] > 0.7
    assert got[("ingest", "date_q3_1997")]["n_zones_skipped"] == 0
    assert got[("date_sorted", "date_q3_1997")]["zone_skip_rate"] > 0.7
    assert got[("date_sorted", "orderkey_100_400")]["n_zones_skipped"] == 0
