"""Property-based tests (hypothesis): engine semantics vs a Python model.

The reference has no property tests (SURVEY §5); these pin the relational
semantics on arbitrary small inputs rather than fixture-specific values.
Example counts are kept low — each example is a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(st.integers(-100, 100), st.integers(-5, 5)), min_size=0, max_size=30
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=rows_strategy, threshold=st.integers(-100, 100))
@SET
def test_filter_matches_python(spark, rows, threshold):
    df = spark.createDataFrame(rows or [(0, 0)], "v long, k long")
    data = rows or [(0, 0)]
    got = sorted(r.v for r in df.filter(df.v > threshold).collect())
    want = sorted(v for v, _ in data if v > threshold)
    assert got == want


@given(rows=rows_strategy, off=st.integers(0, 10), lim=st.integers(0, 10))
@SET
def test_offset_limit_slice_semantics(spark, rows, off, lim):
    """offset applies before limit (reference: sql/planner.rs:49-52) —
    under a total order, the result is exactly list[off:off+lim]."""
    data = rows or [(0, 0)]
    df = spark.createDataFrame(data, "v long, k long")
    got = [r.v for r in df.orderBy("v", "k").offset(off).limit(lim).collect()]
    want = [v for v, _ in sorted(data)][off : off + lim]
    assert got == want


@given(rows=rows_strategy)
@SET
def test_groupby_sum_matches_python(spark, rows):
    data = rows or [(0, 0)]
    df = spark.createDataFrame(data, "v long, k long")
    from pyspark.sql import functions as F

    got = {r.k: (r.s, r.c) for r in df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()}
    want: dict[int, tuple[int, int]] = {}
    for v, k in data:
        s, c = want.get(k, (0, 0))
        want[k] = (s + v, c + 1)
    assert got == want


@given(
    left=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 99)), max_size=20),
    right=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 99)), max_size=20),
)
@SET
def test_inner_join_matches_python(spark, left, right):
    ldf = spark.createDataFrame(left or [(99, 0)], "k long, lv long")
    rdf = spark.createDataFrame(right or [(99, 0)], "k long, rv long")
    ldata, rdata = left or [(99, 0)], right or [(99, 0)]
    got = sorted(
        (r.k, r.lv, r.rv)
        for r in ldf.join(rdf, "k").select("k", "lv", "rv").collect()
    )
    want = sorted((lk, lv, rv) for lk, lv in ldata for rk, rv in rdata if lk == rk)
    assert got == want


@given(
    vecs=st.lists(
        st.lists(st.integers(-50, 50), min_size=3, max_size=3),
        min_size=2,
        max_size=16,
    ).filter(lambda vs: all(any(c != 0 for c in v) for v in vs)),
)
@SET
def test_cosine_block_pairs_matches_python(spark, vecs):
    """Distributed block-pair matmul == naive all-pairs model, including
    the multi-block path (block_size=4 forces several block pairs)."""
    import math

    from naive_query_engine_spark.operators.similarity import (
        COSINE_THRESHOLD,
        cosine_block_pairs,
    )

    rows = [(i, [int(c) for c in v], sum(c * c for c in v)) for i, v in enumerate(vecs)]
    qt = spark.createDataFrame(rows, "vec_id long, q array<long>, nrm2 long")
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_block_pairs(qt, block_size=4).collect()
    }
    want = {}
    for a, va, na2 in rows:
        for b, vb, nb2 in rows:
            if a < b:
                dot = sum(x * y for x, y in zip(va, vb))
                cos = dot / (math.sqrt(na2) * math.sqrt(nb2))
                if cos >= COSINE_THRESHOLD:
                    want[(a, b)] = cos
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=3, max_size=8
        ).map(" ".join),
        min_size=0,
        max_size=8,
    ),
    max_df=st.integers(1, 8),
)
@SET
def test_ngram_jaccard_matches_python(spark, texts, max_df):
    """Inverted-index Jaccard with the stop-shingle cap == direct python
    set model over the capped shingle universe."""
    from naive_query_engine_spark.operators.dedup import ngram_jaccard_pairs
    from naive_query_engine_spark.operators.shingles_sql import JACCARD_THRESHOLD

    data = [(i, t) for i, t in enumerate(texts)] or [(0, "aa bb cc")]
    d = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(d, max_df=max_df).collect()
    }
    shingles = {
        i: {
            " ".join(t.split()[j : j + 3])
            for j in range(len(t.split()) - 2)
        }
        for i, t in data
        if len(t.split()) >= 3
    }
    df_count: dict[str, int] = {}
    for gs in shingles.values():
        for g in gs:
            df_count[g] = df_count.get(g, 0) + 1
    capped = {
        i: {g for g in gs if df_count[g] <= max_df} for i, gs in shingles.items()
    }
    want = {}
    for a in capped:
        for b in capped:
            if a < b and capped[a] and capped[b]:
                inter = len(capped[a] & capped[b])
                union = len(capped[a] | capped[b])
                if union and inter / union >= JACCARD_THRESHOLD:
                    want[(a, b)] = inter / union
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
