"""NaiveFrame: the reference's DataFrame-builder API, verbatim.

The reference's second entry point is a fluent builder over LogicalPlan
(src/logical_plan/dataframe.rs:27-130): ``project / filter / aggregate /
limit / offset / join`` + terminal ``logical_plan()``.  A PySpark
DataFrame already IS that builder, but the method names differ; this thin
veneer exposes the reference's exact surface so code written against the
reference ports line-for-line:

    df = db.frame("t1").filter(col("id") < 9) \\
           .project([col("id"), col("name")]).offset(2).limit(3)
    df.collect()

Every method returns a new NaiveFrame (immutably, like the reference);
``.df`` unwraps to the underlying Spark DataFrame at any point.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


class NaiveFrame:
    """Fluent builder with the reference's method surface
    (dataframe.rs:27-130); executes via Catalyst like everything else."""

    def __init__(self, df: DataFrame) -> None:
        self.df = df

    # -- builder methods (reference: logical_plan/dataframe.rs)

    def project(self, exprs: Sequence[Column | str]) -> NaiveFrame:
        """dataframe.rs:27-41 — evaluate expression list into a new schema."""
        return NaiveFrame(self.df.select(*exprs))

    def filter(self, expr: Column) -> NaiveFrame:
        """dataframe.rs:43-50 — boolean predicate gates rows."""
        return NaiveFrame(self.df.filter(expr))

    def aggregate(
        self,
        group_exprs: Sequence[Column | str],
        aggr_exprs: Sequence[Column],
    ) -> NaiveFrame:
        """dataframe.rs:52-76 — group + aggregate.  Group-key columns are
        KEPT in the output (the reference's physical layer drops them,
        aggregate/mod.rs:115-121 — documented divergence, correct
        semantics)."""
        if group_exprs:
            return NaiveFrame(self.df.groupBy(*group_exprs).agg(*aggr_exprs))
        return NaiveFrame(self.df.agg(*aggr_exprs))

    def limit(self, n: int) -> NaiveFrame:
        """dataframe.rs:78-85."""
        return NaiveFrame(self.df.limit(n))

    def offset(self, n: int) -> NaiveFrame:
        """dataframe.rs:87-94 — applies before a subsequent limit(), same
        order as the reference (sql/planner.rs:49-52)."""
        return NaiveFrame(self.df.offset(n))

    def join(
        self,
        right: NaiveFrame,
        join_type: str,
        on: tuple[Sequence[str], Sequence[str]],
    ) -> NaiveFrame:
        """dataframe.rs:96-130 — equi-join on (left_keys, right_keys);
        empty keys → cross join (same contract as the reference).  ALL key
        pairs participate (the reference uses only on[0] —
        hash_join.rs:134; fixed here), and join_type is honored (the
        reference executes everything as inner — hash_join.rs:48-49)."""
        left_keys, right_keys = on
        if not left_keys:
            return NaiveFrame(self.df.crossJoin(right.df))
        cond = None
        for lk, rk in zip(left_keys, right_keys):
            c = self.df[lk] == right.df[rk]
            cond = c if cond is None else (cond & c)
        how = {"inner": "inner", "left": "left", "right": "right", "cross": "cross"}[
            join_type
        ]
        return NaiveFrame(self.df.join(right.df, cond, how))

    # -- terminals (reference: logical_plan() → physical plan → execute())

    def logical_plan(self) -> str:
        """The reference returns its LogicalPlan here; ours is Catalyst's —
        rendered as text (plan inspection lives in `plans/`)."""
        return self.df._jdf.queryExecution().logical().toString()

    def collect(self):
        return self.df.collect()

    def show(self, n: int = 20) -> None:
        self.df.show(n)

    @property
    def schema(self):
        return self.df.schema
