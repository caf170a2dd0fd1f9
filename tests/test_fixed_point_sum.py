"""fp100/fpsum: the exact long fixed-point money SUM (r14, guide §1.2).

Pins the two claims the TPC-H bench rewrites rest on:

1. ``fp100(c)`` equals the unscaled value of ``CAST(c AS DECIMAL(p,2))``
   for every 2-dp money value, including the doubles that print as
   x.xx0000000001 / x.xx9999999999.
2. ``fpsum(fp, scale)`` is bit-identical (as a double) to
   ``CAST(SUM(<decimal expr>) AS DOUBLE)`` — including negative per-row
   values (q09's profit), values that exercise the hi/lo split in both
   directions, and multi-group aggregation.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from naive_query_engine_spark.queries import QUERIES, dec, fp100, fpsum, one

SF = "/root/testdata/sf0.001"


def bits(x: float) -> bytes:
    return struct.pack(">d", x)


def test_fp100_matches_decimal_unscaled(spark):
    # adversarial 2-dp doubles: the decimal value is NOT exactly
    # representable in binary, so c*100 is off by ~1e-13 either way
    vals = [0.01, 0.07, 123.45, 0.29, 1e5 - 0.01, 949.5, 2097.99, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        fp100(F.col("v")).alias("fp"),
        (dec(F.col("v")) * 100).cast("long").alias("ref"),
    ).collect()
    for r in rows:
        assert r.fp == r.ref


@pytest.mark.parametrize("scale", [2, 4, 5, 6])
def test_fpsum_bit_identical_to_decimal_sum(spark, scale):
    # per-row money pairs, including values large enough to exercise the
    # hi/lo split (fp > 1e6) and a negative-profit-style mix
    data = [
        (1.00, 0.00, "a"),
        (94999.99, 0.10, "a"),
        (0.07, 0.08, "a"),
        (12345.67, 0.05, "b"),
        (-500.25, 0.02, "b"),  # negative fp exercises the floor split
        (2097.99, 0.01, "b"),
    ]
    df = spark.createDataFrame(data, "price double, disc double, g string")
    # decimal reference and fixed-point twin at the requested scale — the
    # same shapes the bench queries use (q01/q06 scale 2-4, q09 scale 5,
    # q01's charge scale 6)
    price_d = dec(F.col("price"))
    fp = fp100(F.col("price"))
    if scale == 4:
        price_d = price_d * (one() - dec(F.col("disc"), 4, 2))
        fp = fp * (F.lit(100) - fp100(F.col("disc")))
    elif scale == 5:
        price_d = price_d * (one() - dec(F.col("disc"), 4, 2)) * F.lit("0.1").cast(
            "decimal(3,1)"
        )
        fp = fp * (F.lit(100) - fp100(F.col("disc")))  # scale 4 digits / 10^5
    elif scale == 6:
        price_d = (
            price_d
            * (one() - dec(F.col("disc"), 4, 2))
            * (one() + dec(F.col("disc"), 4, 2))
        )
        fp = fp * (F.lit(100) - fp100(F.col("disc"))) * (
            F.lit(100) + fp100(F.col("disc"))
        )
    rows = (
        df.groupBy("g")
        .agg(
            fpsum(fp, scale).alias("got"),
            F.sum(price_d).cast("double").alias("want"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert bits(r.got) == bits(r.want), (r.g, repr(r.got), repr(r.want))


def test_fpsum_rejects_unsupported_scale():
    with pytest.raises(ValueError):
        fpsum(F.lit(1).cast("long"), 7)


def test_q01_fixed_point_matches_decimal_reference(spark):
    """The full q01 rewrite against an inline decimal-path twin."""
    from naive_query_engine_spark.queries import t

    li = t(spark, SF, "lineitem")
    price = dec(F.col("l_extendedprice"))
    disc = dec(F.col("l_discount"), 4, 2)
    tax = dec(F.col("l_tax"), 4, 2)
    qty = dec(F.col("l_quantity"))
    n = F.count(F.lit(1))
    ref = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one() - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one() - disc) * (one() + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    ).collect()
    got = QUERIES["q01_pricing_summary"].fn(spark, SF).collect()
    assert len(ref) == len(got) and len(ref) > 0
    for a, b in zip(ref, got):
        for k in a.asDict():
            va, vb = a[k], b[k]
            if isinstance(va, float):
                assert bits(va) == bits(vb), (k, repr(va), repr(vb))
            else:
                assert va == vb, (k, va, vb)
