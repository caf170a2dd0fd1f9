"""Physical-plan introspection: make scale properties assertable.

The reference's optimizer is an empty rule list (SURVEY §4.1) and its scans
ignore projection (csv.rs:94-96).  Here Catalyst does the optimizing; this
module turns the properties we rely on at 100 TB into testable predicates:

- ``pushed_filters(df)``     — predicates that reached the parquet scan
- ``read_schema(df)``        — columns actually read (pruning proof)
- ``has_broadcast_join(df)`` — dimension joins broadcast, not shuffled
- ``num_shuffles(df)``       — exchange count (every one is a cluster-wide
  data movement; the plan-shape budget for a query)
- ``codegen_spans(df)``      — whole-stage-codegen coverage
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what ``df.explain(mode)`` prints)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scan (empty → nothing pushed)."""
    text = explain_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning proof."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", explain_text(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_text(df) or "BroadcastNestedLoopJoin" in explain_text(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_text(df)


def num_shuffles(df: DataFrame) -> int:
    """Count of Exchange operators (AQE may collapse some at runtime)."""
    return len(re.findall(r"\bExchange\b", explain_text(df, "simple")))


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (wider = fewer JVM call breaks)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_text(df, "simple"))))


def uses_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT should plan TakeOrderedAndProject (per-partition
    top-k + merge), never a global sort."""
    return "TakeOrderedAndProject" in explain_text(df, "simple")


def plan_node_tree(df: DataFrame, which: str = "executed") -> dict:
    """The physical plan as a nested ``{"name", "children"}`` dict — the
    idiomatic analog of the reference's constructible ``PhysicalPlan``
    object tree (``src/physical_plan/plan.rs:14-21``): the reference lets
    tests assemble and inspect plan nodes directly; here Catalyst owns
    plan construction, so the inspectable artifact is a read-only
    traversal of what it built.

    ``which``: "executed" (post-planning, pre-AQE-finalization),
    "optimized", or "analyzed"."""
    qe = df._jdf.queryExecution()
    jplan = {
        "executed": qe.executedPlan,
        "optimized": qe.optimizedPlan,
        "analyzed": qe.analyzed,
    }[which]()

    def walk(node) -> dict:
        # AdaptiveSparkPlanExec keeps its plan in a field, not children()
        if node.nodeName() == "AdaptiveSparkPlan":
            return {"name": node.nodeName(), "children": [walk(node.inputPlan())]}
        children = [walk(node.children().apply(i)) for i in range(node.children().size())]
        return {"name": node.nodeName(), "children": children}

    return walk(jplan)


def plan_summary(df: DataFrame) -> dict:
    """One structured dict with every scale-relevant plan property —
    what a plan review at 100 TB looks for, machine-checkable:

    - ``joins``: physical join node names in plan order
    - ``shuffles`` / ``broadcasts``: exchange counts
    - ``scans``: per-scan pushed filters + read schema (pushdown/pruning)
    - ``codegen_spans``: whole-stage-codegen region count
    - ``take_ordered``: top-k planned as TakeOrderedAndProject
    """
    text = explain_text(df, "simple")
    return {
        "joins": re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b",
            text,
        ),
        # \bExchange\b already excludes BroadcastExchange (no word
        # boundary splits it) — do NOT subtract the broadcast count
        "shuffles": len(re.findall(r"\bExchange\b", text)),
        "broadcasts": len(re.findall(r"\bBroadcastExchange\b", text)),
        "scans": [
            {"pushed_filters": pushed_filters(df), "read_schemas": read_schemas(df)}
        ],
        "codegen_spans": codegen_spans(df),
        "take_ordered": uses_take_ordered(df),
    }
