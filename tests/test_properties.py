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
