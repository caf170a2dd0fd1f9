"""Function registry: the reference's scalar/aggregate surface + UDF hooks.

Reference surface (SURVEY §2.7):
- SQL function-call path recognizes only ``abs`` (expression.rs:96-114);
  aggregate names count/sum/avg/min/max (expression.rs:116-153).
- Unary math abs/sin/cos/tan exist physically — with ``tan`` dispatching to
  cos (unary.rs:96, bug fixed here); string funcs trim/ltrim/rtrim/length/
  lower/upper/repeat/replace/reverse/substr are declared but ``todo!()``
  (unary.rs:97-106) — all real here, all JVM-side/codegen'd.

Extension surface: the reference's only hook is a compiled-in Rust trait.
Here: ``register_python_udf`` (row-at-a-time — the SLOW path, for
semantics Spark can't express vectorized) and ``register_pandas_udf``
(Arrow-batched — the fast path).  Both become callable from ``run_sql``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: name → Column-function. The reference's unary enum (logical_plan/
#: expression.rs:391-422) plus the SQL-path scalar registry, all working.
SCALAR_FUNCTIONS: dict[str, Callable[..., Column]] = {
    "abs": F.abs,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,  # reference bug (tan→cos) fixed
    "sqrt": F.sqrt,
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "length": F.length,
    "lower": F.lower,
    "upper": F.upper,
    "repeat": F.repeat,
    "replace": F.replace,
    "reverse": F.reverse,
    "substr": F.substring,
}

#: name → aggregate Column-function (reference: expression.rs:116-153)
AGGREGATE_FUNCTIONS: dict[str, Callable[..., Column]] = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


def call(name: str, *args) -> Column:
    """Resolve a function by name (scalar first, then aggregate) — the
    engine-facing equivalent of the reference's name→expr dispatch."""
    fn = SCALAR_FUNCTIONS.get(name) or AGGREGATE_FUNCTIONS.get(name)
    if fn is None:
        raise KeyError(f"unknown function: {name!r}")
    return fn(*args)


def register_python_udf(spark: SparkSession, name: str, fn: Callable, return_type: str) -> None:
    """Row-at-a-time Python UDF — the slow path (per-row serialization).
    Use only for semantics that can't be vectorized."""
    spark.udf.register(name, fn, return_type)


def register_pandas_udf(spark: SparkSession, name: str, fn: Callable, return_type: str) -> None:
    """Arrow-batched pandas UDF — the fast Python path (~10-100× the
    row-at-a-time UDF; still slower than built-ins, which never leave
    the JVM)."""
    spark.udf.register(name, pandas_udf(fn, return_type))


def register_split_words_udtf(spark: SparkSession, name: str = "split_words") -> None:
    """Python UDTF (table function): one input row → many output rows.
    The reference has no table-function concept; in Spark these compose in
    SQL via LATERAL joins.  Defined inside the function so registration
    works regardless of the caller's import path (pickled by value)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, idx int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield (w, i)

    spark.udtf.register(name, SplitWords)
