"""Plan-shape assertions: the scale properties every query relies on.

These tests pin the *physical plan*, not the results — a correct query
that reads all columns or shuffles a broadcastable dimension is a bug at
100 TB even though the small-SF values match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark import plans
from naive_query_engine_spark.queries import QUERIES, t

from .conftest import SF_ORACLE


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["q06_forecast_revenue"].fn(spark, SF_ORACLE)
    pushed = plans.pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    assert any("l_quantity" in p for p in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    df = QUERIES["filter_project"].fn(spark, SF_ORACLE)
    schemas = plans.read_schemas(df)
    assert schemas and all(
        set(s) <= {"c_custkey", "c_name", "c_acctbal"}
        for s in ([c.split(":")[0] for c in s0.removeprefix("struct<").rstrip(">").split(",")]
                  for s0 in schemas)
    ), schemas


def test_q01_reads_only_needed_columns(spark):
    df = QUERIES["q01_pricing_summary"].fn(spark, SF_ORACLE)
    (schema,) = plans.read_schemas(df)
    # 7 of 11 lineitem columns — keys, measures, shipdate; nothing else
    assert "l_orderkey" not in schema and "l_partkey" not in schema, schema
    for col in ("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate"):
        assert col in schema, schema


def test_star_join_broadcasts_dimensions(spark):
    df = QUERIES["q05_region_revenue"].fn(spark, SF_ORACLE)
    assert plans.has_broadcast_join(df)
    assert not plans.has_sort_merge_join(df)


def test_topk_avoids_global_sort(spark):
    df = QUERIES["sort_topk"].fn(spark, SF_ORACLE)
    assert plans.uses_take_ordered(df)


def test_agg_uses_partial_aggregation(spark):
    # partial (map-side) + final HashAggregate pairs around one exchange
    df = QUERIES["q01_pricing_summary"].fn(spark, SF_ORACLE)
    text = plans.explain_text(df, "simple")
    # partial_sum/partial_count map-side, final agg after the 2-key exchange
    assert text.count("HashAggregate") >= 2, text
    assert "partial_sum" in text, text


def test_broadcast_join_no_fact_shuffle(spark):
    """join_inner_chain: the only exchanges may be for the broadcast side
    (BroadcastExchange), never a full shuffle of lineitem."""
    df = QUERIES["join_inner_chain"].fn(spark, SF_ORACLE)
    text = plans.explain_text(df, "simple")
    # orders side at sf0.01 is small enough: Catalyst broadcasts both dims
    assert "BroadcastHashJoin" in text
    assert "ShuffleExchange" not in text.replace("BroadcastExchange", "")


def test_cross_join_is_broadcast_nested_loop(spark):
    df = QUERIES["join_cross"].fn(spark, SF_ORACLE)
    text = plans.explain_text(df, "simple")
    assert "BroadcastNestedLoopJoin" in text


def test_semi_join_plans_semi(spark):
    df = QUERIES["join_semi"].fn(spark, SF_ORACLE)
    text = plans.explain_text(df, "simple")
    assert "LeftSemi" in text


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Hive-partitioned layout + a partition-key filter → PartitionFilters
    in the scan and only the matching directory read.  At 100 TB this is
    the difference between scanning one day and scanning ten years."""
    from naive_query_engine_spark.queries import t
    from naive_query_engine_spark.sources import write_table

    out = str(tmp_path / "orders_by_status")
    write_table(t(spark, SF_ORACLE, "orders"), out, partition_by=["o_orderstatus"])
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    text = plans.explain_text(df)
    assert "PartitionFilters" in text
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    assert m and "o_orderstatus" in m.group(1), text[:1500]
    # and the non-matching partitions contribute zero rows
    total = spark.read.parquet(out).count()
    f_only = df.count()
    assert 0 < f_only < total


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP: a filter on a NON-KEY dim attribute (no static constant to
    fold through the join) still prunes the partitioned fact scan at
    RUNTIME — Spark broadcasts the filtered dim, collects its join keys,
    and injects ``dynamicpruningexpression`` into the scan's
    PartitionFilters.  At 100 TB this is the star-join scan reducer:
    'orders in final status' touches one partition directory even though
    the predicate never mentions the partition column."""
    out = str(tmp_path / "orders_by_status")
    t(spark, SF_ORACLE, "orders").write.partitionBy("o_orderstatus").parquet(out)
    fact = spark.read.parquet(out)
    # label→status lives in DATA, not in an expression: Catalyst cannot
    # constant-fold it, so only runtime pruning can skip partitions
    dim = spark.createDataFrame(
        [("F", "final"), ("O", "open"), ("P", "pending")],
        "o_orderstatus string, label string",
    )
    j = fact.join(dim.filter(F.col("label") == "final"), "o_orderstatus").select(
        "o_orderkey"
    )
    text = plans.explain_text(j, "formatted")
    assert "dynamicpruningexpression" in text, text[:1500]
    # and the pruned read returns exactly the matching partition
    assert j.count() == fact.filter(F.col("o_orderstatus") == "F").count()


def test_plan_node_tree_and_summary(spark):
    from naive_query_engine_spark import plans
    from naive_query_engine_spark.queries import QUERIES

    from .conftest import SF_ORACLE

    df = QUERIES["q03_shipping_priority"].fn(spark, SF_ORACLE)
    tree = plans.plan_node_tree(df)
    # a real nested tree: root with children, and some scan leaf below
    assert tree["name"] and tree["children"]
    names = []
    stack = [tree]
    while stack:
        n = stack.pop()
        names.append(n["name"])
        stack.extend(n["children"])
    assert any("Scan" in n or "FileSourceScan" in n for n in names), names

    s = plans.plan_summary(df)
    assert s["joins"], s  # q03 has joins
    assert s["take_ordered"] is True  # top-10 must be TakeOrdered
    assert s["scans"][0]["pushed_filters"], s  # dimension filters pushed
    # shuffle count must agree with num_shuffles and never go negative
    # (BroadcastExchange is NOT matched by \bExchange\b — no double-subtract)
    assert s["shuffles"] == plans.num_shuffles(df) >= 0, s


def test_no_following_unbounded_aggregate_frames():
    """Spark evaluates UNBOUNDED FOLLOWING aggregate frames by rescanning
    the remaining frame per row (UnboundedFollowingWindowFunctionFrame,
    O(rows²) per partition — measured 99 s at 100× on
    events_absence_timeout before the reversed-sort rewrite, see
    BASELINE.md).  Any future-looking running aggregate must be spelled
    as its reversed-sort PRECEDING twin.  Full-partition frames
    (unboundedPreceding, unboundedFollowing) are exempt: Spark computes
    those once per partition."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / "naive_query_engine_spark"
    offenders = []
    for py in pkg.rglob("*.py"):
        src = py.read_text()
        # rangeBetween(currentRow, unboundedFollowing) hits the same
        # quadratic UnboundedFollowingWindowFunctionFrame path (ADVICE r6
        # #4) — scan both frame spellings.
        for m in re.finditer(r"(rowsBetween|rangeBetween)\(([^)]*)\)", src):
            kind, args = m.group(1), m.group(2)
            if "unboundedFollowing" in args and "unboundedPreceding" not in args:
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{py.name}:{line} {kind}({args})")
    assert not offenders, (
        "FOLLOWING-unbounded aggregate frame(s) found — rewrite as the "
        f"reversed-sort PRECEDING twin: {offenders}"
    )
