"""Z-order layout: key correctness + measurable two-dimensional pruning."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from naive_query_engine_spark.operators.layout import morton_key, write_zordered
from naive_query_engine_spark.queries import t

from .conftest import SF_ORACLE


def test_morton_key_interleaves(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int")
    rows = {(r.a, r.b): r.zkey for r in df.select("a", "b", morton_key(
        F.col("a"), F.col("b")).alias("zkey")).collect()}
    # interleave(a=0b11, b=0b101) = b2 a1 b1 a0 b0... a bits even, b odd
    assert rows[(0, 0)] == 0
    assert rows[(1, 0)] == 1       # a bit 0 → position 0
    assert rows[(0, 1)] == 2       # b bit 0 → position 1
    assert rows[(3, 5)] == (1 | 4) | ((1 | 16) << 1)  # a=0b11→0b101, b=0b101→0b10001<<1


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """After z-ordering on (custkey, totalprice), per-file min/max ranges
    on EACH dimension must be much tighter than the global range — the
    statistics that row-group pruning consumes."""
    out = str(tmp_path / "orders_z")
    orders = t(spark, SF_ORACLE, "orders")
    write_zordered(orders, out, "o_custkey", "o_totalprice", n_files=16)

    spans_a, spans_b = [], []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        amin = amax = bmin = bmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "o_custkey":
                    amin = st.min if amin is None else min(amin, st.min)
                    amax = st.max if amax is None else max(amax, st.max)
                if name == "o_totalprice":
                    bmin = st.min if bmin is None else min(bmin, st.min)
                    bmax = st.max if bmax is None else max(bmax, st.max)
        spans_a.append(amax - amin)
        spans_b.append(bmax - bmin)

    stats = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ga"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("gb"),
    ).collect()[0]
    avg_a = sum(spans_a) / len(spans_a)
    avg_b = sum(spans_b) / len(spans_b)
    # each file covers a small rectangle: both dims well under the global span
    assert avg_a < 0.5 * stats.ga, (avg_a, stats.ga)
    assert avg_b < 0.5 * stats.gb, (avg_b, stats.gb)
    # and the data survived intact
    assert spark.read.parquet(out).count() == orders.count()


def test_global_rank_matches_single_partition_window(spark):
    """Distributed rank (range partitions + offsets) == plain ROW_NUMBER."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from naive_query_engine_spark.operators.layout import global_rank

    rows = [(i, (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    ranked, total = global_rank(df, ["v", "id"], "rn", n_parts=7)
    assert total == 500
    expected = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id")).cast("long") - 1
    )
    got = {(r["id"], r["rn"]) for r in ranked.collect()}
    want = {(r["id"], r["rn"]) for r in expected.collect()}
    assert got == want
