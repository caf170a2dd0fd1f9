"""Documented divergences from the reference's type/name semantics.

1. **UInt64 narrowing** — the reference exercises unsigned 64-bit keys in
   arithmetic, join, and aggregate paths (``ScalarValue::UInt64``,
   ``src/logical_plan/expression.rs:174-187``; unsigned key extraction in
   ``src/physical_plan/hash_join.rs:143-144``).  Spark has no unsigned
   integral type; this engine narrows to ``LongType`` (SURVEY §1.2).
   These tests pin the boundary behavior: every value up to
   ``i64::MAX == 2^63 - 1`` round-trips, joins, and aggregates exactly;
   a true u64 value ``>= 2^63`` is REJECTED at ingestion (overflow error)
   rather than silently wrapped to a negative long.

2. **Ambiguous unqualified columns** — the reference resolves an
   unqualified name by silently taking the *first* schema match
   (``src/logical_plan/schema.rs:116-131``), so ``SELECT id`` over a join
   with two ``id`` columns picks one arbitrarily.  Spark raises
   ``AMBIGUOUS_REFERENCE``.  We keep Spark's behavior deliberately — a
   silent first-match is a correctness trap — and pin the divergence here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from naive_query_engine_spark.sources import memory_table

I64_MAX = (1 << 63) - 1  # 9223372036854775807
U64_ONLY = 1 << 63  # smallest u64 value with no i64 representation


def test_i64_max_roundtrips_joins_and_aggregates(spark):
    left = memory_table(
        spark,
        [(I64_MAX, "a"), (I64_MAX - 1, "b"), (0, "z")],
        "k long, tag string",
    )
    right = memory_table(
        spark, [(I64_MAX, 10), (I64_MAX - 1, 20)], "k long, v long"
    )
    joined = left.join(right, "k")
    rows = {r.k: (r.tag, r.v) for r in joined.collect()}
    assert rows == {I64_MAX: ("a", 10), I64_MAX - 1: ("b", 20)}
    # grouped aggregation on the boundary key stays exact
    agg = joined.groupBy("k").agg(F.sum("v").alias("s")).collect()
    assert {r.k: r.s for r in agg} == {I64_MAX: 10, I64_MAX - 1: 20}
    # max() returns the boundary value unclipped
    assert left.agg(F.max("k")).collect()[0][0] == I64_MAX


def test_u64_beyond_i64_is_rejected_not_wrapped(spark):
    # The reference would store 2^63 as UInt64(9223372036854775808); the
    # LongType narrowing must fail loudly, never alias it to -2^63.  The
    # invariant: EITHER ingestion raises, OR (if some future conversion
    # path accepts it) the value must round-trip unchanged — what must
    # never happen is a silent two's-complement wrap to a negative long.
    try:
        rows = memory_table(spark, [(U64_ONLY,)], "k long").collect()
    except Exception:
        return  # rejected at ingestion: the documented behavior
    assert rows[0].k == U64_ONLY, (
        f"2^63 silently wrapped to {rows[0].k} instead of being rejected"
    )


def test_i64_arithmetic_overflow_does_not_wrap_silently_in_ansi_off(spark):
    # Document the non-ANSI default: sum() over longs can overflow to
    # negative (Spark semantics) — callers needing u64-range sums must
    # aggregate in DECIMAL(38,0), which is exact far beyond u64.
    df = memory_table(spark, [(I64_MAX,), (1,)], "k long")
    dec_sum = df.agg(F.sum(F.col("k").cast("decimal(38,0)")).alias("s")).collect()[0][0]
    assert int(dec_sum) == I64_MAX + 1  # exact where u64 would be needed


def test_unqualified_ambiguous_column_raises(spark):
    a = memory_table(spark, [(1, "x")], "id long, va string")
    b = memory_table(spark, [(1, "y")], "id long, vb string")
    joined = a.join(b, a.id == b.id)
    with pytest.raises(AnalysisException, match="AMBIGUOUS_REFERENCE"):
        joined.select("id").collect()
    # the qualified paths both work (what the reference's first-match
    # resolution silently guesses between)
    assert joined.select(a.id).collect()[0][0] == 1
    assert joined.select(b.id).collect()[0][0] == 1
