"""Named-query registry: every operator capability as (Spark fn, DuckDB oracle).

Each entry in :data:`QUERIES` is one row of SURVEY.md §2's operator inventory,
re-expressed as an idiomatic PySpark DataFrame pipeline plus an equivalent
ANSI-SQL oracle string that DuckDB runs on the same parquet tables.  The
driver harness (``__spark_entry__.py``) and the local pytest oracle harness
(``tests/test_oracle.py``) both iterate this registry.

Hash-stability rules (the driver compares order-insensitive value hashes):
- Float SUM/AVG across engines is non-associative → aggregate in DECIMAL
  (exact) and cast the final value to DOUBLE in BOTH engines.  Input doubles
  here are 2-decimal monetary values, so DECIMAL(12,2)/DECIMAL(4,2) casts are
  lossless-deterministic.
- Every computed column is aliased identically on both sides.
- Integer-returning scalar funcs are cast to BIGINT on both sides (Spark's
  length() is INT, DuckDB's is BIGINT).
- LIMIT queries always carry a total ORDER BY (unique tie-break column).
- libm funcs (sin/cos/tan) are rounded to 9 decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# registry plumbing

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...]
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Register a named query. ``fn(spark, sf_dir) -> DataFrame``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # a duplicate @query silently SHADOWS the original in the dict
            # (caught live in r7: a second orders_rfm_segmentation displaced
            # the registered one and only the rotation-completeness test
            # noticed) — fail loudly at import instead
            raise ValueError(f"query {name!r} is already registered")
        QUERIES[name] = QuerySpec(name, fn, oracle, tuple(tags), doc or (fn.__doc__ or ""))
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test-corpus table (lazy parquet scan → full pushdown/pruning).

    The corpus stores naive (no-timezone) microsecond timestamps, which
    Spark >= 3.4 reads as TIMESTAMP_NTZ — the exact analog of DuckDB's
    naive TIMESTAMP, so both engines see identical wall-clock values with
    no session-timezone dependence.  (Earlier corpus generations used
    TIMESTAMP(NANOS); ``read_corpus_table`` still normalizes that case.)
    """
    from .sources import read_corpus_table

    return read_corpus_table(spark, sf_dir, name)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-split.

    The test corpus parquet is a single row-group (one split), which would
    serialize per-row expansions (shingle/char-window explodes) onto one
    core — so those operators spread the scan first.  But ``repartition(n)``
    is always a full exchange: at production scale the input arrives
    already split and the shuffle would move the whole corpus for nothing.
    Guard on the actual partition count so well-split input skips the
    exchange entirely (VERDICT r3).

    Call this on scan-rooted or already-materialized frames only: reading
    ``df.rdd`` finalizes the physical plan, and under AQE a plan with
    upstream exchanges would execute those stages eagerly.
    """
    n = min_parts or max(df.sparkSession.sparkContext.defaultParallelism, 8)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def cut_lineage(df: DataFrame) -> DataFrame:
    """Lineage cut for iterative operators (pagerank / components /
    triangles / the BPE trainer / the cosine blocked frame).

    Default: ``localCheckpoint`` — EAGER (merely constructing the operator's
    DataFrame executes Spark jobs, including in plan-inspection paths) and
    NOT resilient to executor loss: the cut frame lives in executor
    block-manager memory/disk only, so losing an executor loses partitions
    with no lineage to recompute them.  Acceptable in local mode; a
    long-running production job on a real cluster should set
    ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` (with
    ``sc.setCheckpointDir(<cluster storage>)``) to switch every cut to a
    reliable ``checkpoint()`` — same plan shape, executor-loss safe
    (``tests/test_reliable_checkpoint.py`` exercises the branch).

    Also note (ADVICE r3): checkpointed stages' exchanges are invisible to
    the static plan, so declared plan budgets count post-cut work only.

    ``SPARK_GRAFT_LAZY_CUTS=1`` makes every cut a no-op for PLAN
    INSPECTION (ADVICE r3: explain/dump_plans on the iterative operators
    should not execute full Spark jobs): construction runs zero jobs and
    the full pre-cut lineage — iteration exchanges included — becomes
    visible to explain.  Inspection-only: executing a lazy-built frame
    recomputes every iteration inside one job, and for frames that
    reference a cut twice (the BPE trainer's counts) plan ANALYSIS itself
    doubles per iteration — never run results, or the plan-budget tests,
    under this flag.
    """
    import os

    if os.environ.get("SPARK_GRAFT_LAZY_CUTS"):
        return df
    if os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT"):
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise RuntimeError(
                "SPARK_GRAFT_RELIABLE_CHECKPOINT is set but no checkpoint dir "
                "is configured — call spark.sparkContext.setCheckpointDir(...) "
                "with a cluster-storage path first"
            )
        return df.checkpoint()
    return df.localCheckpoint()


def floordiv_col(x: Column, d: Column) -> Column:
    """Exact floor division of integer columns via non-negative modulus:
    ``(x - ((x % d) + d) % d) / d``.  The subtraction makes the dividend
    exactly divisible by ``d``, so the (double) division is exact and
    floor-correct for negative ``x`` in BOTH engines regardless of their
    integer-division semantics — the portable twin of the SQL-side
    ``layout._floordiv_sql``.  Used by the k-means centroid update and
    both Z-order rank scalings."""
    return ((x - ((x % d) + d) % d) / d).cast("long")


def epoch_micros(col: str | Column) -> Column:
    """Microseconds since the epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.

    ``F.unix_micros`` accepts only TIMESTAMP (with local timezone), but the
    corpus columns are TIMESTAMP_NTZ; ``timestampdiff`` from an NTZ epoch
    literal handles both (LTZ input is first cast to NTZ — identity under
    the engine's UTC session timezone) and is timezone-independent, matching
    DuckDB's ``epoch_us`` on naive timestamps exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, c.cast("timestamp_ntz"))


def epoch_seconds(col: str | Column) -> Column:
    """Whole seconds since the epoch (floor, like ``unix_timestamp``) for
    TIMESTAMP or TIMESTAMP_NTZ input."""
    return F.floor(epoch_micros(col) / F.lit(1_000_000)).cast("long")


# ---------------------------------------------------------------------------
# hash-stability helpers (see module docstring)


def dec(c: Column, prec: int = 12, scale: int = 2) -> Column:
    return c.cast(f"decimal({prec},{scale})")


def dsum(c: Column, alias: str, prec: int = 12, scale: int = 2) -> Column:
    """Exact SUM: decimal-accumulate, emit DOUBLE (identical in DuckDB)."""
    return F.sum(dec(c, prec, scale)).cast("double").alias(alias)


def davg(c: Column, alias: str, prec: int = 12, scale: int = 2) -> Column:
    """Exact-sum AVG: decimal sum → double, / count — deterministic division."""
    return (F.sum(dec(c, prec, scale)).cast("double") / F.count(c)).alias(alias)


def one() -> Column:
    """Literal 1.00 for (1 ± rate) decimal arith (lazy: needs a live session)."""
    return F.lit(1).cast("decimal(3,2)")


# -- exact LONG fixed-point money arithmetic (r14, guide §1.2 per-task work) --
#
# The decimal multiply/sum chain is the dominant per-row cost of the TPC-H
# bench aggregates (measured sf0.1: SUM over the 2-factor decimal product
# 0.69 s vs 0.25 s for the same values in int64 fixed point; the 3-factor
# charge product 0.96 s vs 0.35 s).  Every money column carries at most 2
# decimal digits by construction, so its cents value is an exact int64 and
# the whole product/sum tree can run in long arithmetic, converting to
# DECIMAL only on the aggregated (group-count-bounded) rows — where the
# conversion is exact and the final decimal->double cast is the same
# correctly-rounded operation both engines already share.  Bit-identical
# outputs verified value-by-value against the decimal path at all three SFs
# (tests/test_fixed_point_sum.py) and against the DuckDB oracle.

#: hi/lo split base for :func:`fpsum`.  A single int64 SUM of per-row
#: fixed-point values up to ~1e11 would overflow past ~1e8 rows PER GROUP
#: (real at 100 TB); summing the 10^6-quotient and -remainder separately
#: bounds each sum by ~1e5/row and ~1e6/row, pushing overflow past ~1e13
#: rows per group, and costs nothing measurable per row (0.350 vs 0.353 s).
_FP_SPLIT = 1_000_000


def fp100(c: Column) -> Column:
    """``c`` (a 2-dp money double) as its exact cents LONG — the unscaled
    value of ``CAST(c AS DECIMAL(p,2))``.  Exact: the true value is k/100
    for integer k, the stored double is within 2^-30 of it, so ``c*100``
    lands within ~1e-9 of k and ROUND recovers k itself."""
    return F.round(c * 100).cast("long")


def fpsum(fp: Column, scale: int) -> Column:
    """Exact SUM over a LONG fixed-point expression (``true value =
    fp / 10**scale``), emitted as the identical DOUBLE that
    ``CAST(SUM(<decimal expr>) AS DOUBLE)`` produces.

    Per-row: split ``fp`` at 10^6 (floor-quotient hi, remainder lo — exact
    for |fp| < 2^53, and every per-row fp here is <= ~1.2e11).  Aggregate:
    two plain long SUMs (map-side partial aggregation, no decimal).
    Post-aggregate (group-count-bounded rows only): recombine in
    decimal(38,0) — exact — and divide by 10^scale, exact for scale <= 6
    because Spark's decimal-division result scale is >= 6, then cast to
    double (correctly rounded, same as the decimal path's final cast)."""
    if scale > 6:
        raise ValueError("fpsum is exact only for scale <= 6")
    hi = F.floor(fp / F.lit(_FP_SPLIT)).cast("long")
    lo = fp - hi * F.lit(_FP_SPLIT)
    total = F.sum(hi).cast("decimal(38,0)") * F.lit(_FP_SPLIT).cast(
        "decimal(7,0)"
    ) + F.sum(lo).cast("decimal(38,0)")
    return (total / F.lit(10**scale).cast(f"decimal({scale + 1},0)")).cast("double")


# ===========================================================================
# §2.1/2.2 — scan, projection, expressions, filter, limit/offset
# ===========================================================================


@query(
    "scan_project_expr",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal + 100 AS acctbal_plus
    FROM customer WHERE c_custkey < 50
    ORDER BY c_custkey LIMIT 3 OFFSET 2
    """,
    tags=("scan", "projection", "filter", "limit", "offset"),
)
def scan_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference main.rs:12: ``select id, name, age+100 from t1 where id<9
    limit 3 offset 2`` — scan + arith projection + filter + offset-then-limit
    (offset applies first: sql/planner.rs:49-52). ORDER BY added for a
    deterministic slice (the reference relies on single-partition file order)."""
    c = t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") < 50)
        .select("c_custkey", "c_name", (F.col("c_acctbal") + 100).alias("acctbal_plus"))
        .orderBy("c_custkey")
        .offset(2)
        .limit(3)
    )


@query(
    "filter_project",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey > 1
    """,
    tags=("scan", "projection", "filter"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference planner.rs:650-683 e2e: filtered projection (``select id,
    name, age from t1 where id > 1``). Predicate + column pruning reach the
    parquet scan via Catalyst (the reference's CsvTable ignores projection,
    csv.rs:94-96)."""
    c = t(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") > 1).select("c_custkey", "c_name", "c_acctbal")


@query(
    "expr_arith_logic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity + l_tax       AS add_col,
           l_quantity - l_tax       AS sub_col,
           l_quantity * l_discount  AS mul_col,
           l_quantity / 2           AS div_col,
           CAST(l_orderkey % 7 AS BIGINT) AS mod_col,
           (l_quantity > 25 AND l_discount <= 0.05) AS and_col,
           (l_returnflag = 'A' OR l_linestatus <> 'F') AS or_col,
           NOT (l_quantity >= 30) AS not_col
    FROM lineitem
    """,
    tags=("expression", "arith", "logic"),
)
def expr_arith_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference binary exprs: arith ``+ - * / %`` and Kleene AND/OR
    (src/physical_plan/expression/binary.rs:90-156) plus NOT (stubbed in the
    reference, planner/mod.rs:218 — implemented here).  Double arith is
    elementwise (no accumulation) → bit-identical across engines."""
    li = t(spark, sf_dir, "lineitem")
    q, tax, disc = F.col("l_quantity"), F.col("l_tax"), F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (q + tax).alias("add_col"),
        (q - tax).alias("sub_col"),
        (q * disc).alias("mul_col"),
        (q / 2).alias("div_col"),
        (F.col("l_orderkey") % 7).cast("long").alias("mod_col"),
        ((q > 25) & (disc <= 0.05)).alias("and_col"),
        ((F.col("l_returnflag") == "A") | (F.col("l_linestatus") != "F")).alias("or_col"),
        (~(q >= 30)).alias("not_col"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT c_custkey,
           ABS(c_acctbal)            AS abs_bal,
           ROUND(SIN(c_acctbal), 9)  AS sin_bal,
           ROUND(COS(c_acctbal), 9)  AS cos_bal,
           ROUND(TAN(c_acctbal), 9)  AS tan_bal,
           ROUND(SQRT(ABS(c_acctbal)), 9) AS sqrt_bal
    FROM customer
    """,
    tags=("expression", "math"),
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference unary math funcs abs/sin/cos/tan
    (src/physical_plan/expression/unary.rs:46-109).  NOTE the reference's
    ``tan`` dispatches to cos (unary.rs:96, a bug) — implemented correctly
    here.  Rounded to 9 decimals: libm implementations may differ in the
    last ulp between JVM and DuckDB."""
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.round(F.sin(bal), 9).alias("sin_bal"),
        F.round(F.cos(bal), 9).alias("cos_bal"),
        F.round(F.tan(bal), 9).alias("tan_bal"),
        F.round(F.sqrt(F.abs(bal)), 9).alias("sqrt_bal"),
    )


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                   AS upper_name,
           LOWER(c_name)                                   AS lower_name,
           CAST(LENGTH(c_name) AS BIGINT)                  AS name_len,
           TRIM(CONCAT('  ', c_name, '  '))                AS trimmed,
           LTRIM(CONCAT('  ', c_name))                     AS ltrimmed,
           RTRIM(CONCAT(c_name, '  '))                     AS rtrimmed,
           SUBSTR(c_name, 1, 8)                            AS name_prefix,
           REPLACE(c_name, '#', '-')                       AS replaced,
           REVERSE(c_name)                                 AS reversed,
           REPEAT(c_mktsegment, 2)                         AS repeated,
           CONCAT(c_name, '/', c_mktsegment)               AS concatenated,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0')       AS padded
    FROM customer
    """,
    tags=("expression", "string"),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference string funcs trim/ltrim/rtrim/length/lower/upper/repeat/
    replace/reverse/substr — ALL ``todo!()`` in the reference
    (unary.rs:97-106); implemented for real here, JVM-side (codegen'd)."""
    c = t(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.lower(name).alias("lower_name"),
        F.length(name).cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), name, F.lit("  "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), name)).alias("ltrimmed"),
        F.rtrim(F.concat(name, F.lit("  "))).alias("rtrimmed"),
        F.substring(name, 1, 8).alias("name_prefix"),
        F.replace(name, F.lit("#"), F.lit("-")).alias("replaced"),
        F.reverse(name).alias("reversed"),
        F.repeat(F.col("c_mktsegment"), 2).alias("repeated"),
        F.concat(name, F.lit("/"), F.col("c_mktsegment")).alias("concatenated"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
    )


@query(
    "cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_orderkey AS VARCHAR)         AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)  AS order_date,
           CAST(o_custkey AS DOUBLE)           AS custkey_dbl,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str
    FROM orders
    """,
    tags=("expression", "cast"),
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST across the reference's convert_data_type list (sql/planner.rs:
    506-524) — the reference's physical cast is 100% ``todo!()`` and panics
    (expression/cast.rs:45-87); here it's Catalyst-native.  double→int goes
    through FLOOR because Spark truncates while DuckDB rounds."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice")).alias("price_floor"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.col("o_custkey").cast("double").alias("custkey_dbl"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_str"),
    )


@query(
    "case_in_between_like",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size BETWEEN 1 AND 20 THEN 'small'
                WHEN p_size IN (21,22,23,24,25,26,27,28,29,30) THEN 'mid'
                ELSE 'large' END AS size_class,
           (p_name LIKE '%a%')  AS has_a,
           (p_type LIKE 'S%')   AS starts_s
    FROM part
    """,
    tags=("expression", "case", "in", "between", "like"),
)
def case_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/IN/BETWEEN/LIKE — all unhandled ``todo!()`` in the reference's
    expression planner (sql/planner.rs:455); Catalyst-native here."""
    p = t(spark, sf_dir, "part")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        F.when(size.between(1, 20), "small")
        .when(size.isin(list(range(21, 31))), "mid")
        .otherwise("large")
        .alias("size_class"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.col("p_type").like("S%").alias("starts_s"),
    )


# ===========================================================================
# §2.3 — joins
# ===========================================================================


@query(
    "join_inner_chain",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderstatus, c_name
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join", "inner"),
)
def join_inner_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference main.rs:16-24: chained inner equi-joins over 3 tables
    (employee→rank→department ≙ lineitem→orders→customer).  Catalyst picks
    broadcast-hash for the dimension side (vs the reference's hard-coded
    single-key build-left HashJoin, planner/mod.rs:71-89)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("l_orderkey", "l_linenumber", "o_orderstatus", "c_name")
    )


@query(
    "join_multi_key",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice AS price_b
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    """,
    tags=("join", "multikey"),
)
def join_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key equi-join.  The reference collects all ON pairs but its
    physical joins use only ``on[0]`` (hash_join.rs:134,171) — this query
    would be WRONG there; here all keys participate in the shuffle hash."""
    a = t(spark, sf_dir, "lineitem").alias("a")
    b = t(spark, sf_dir, "lineitem").alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.col("a.l_quantity").alias("l_quantity"),
        F.col("b.l_extendedprice").alias("price_b"),
    )


@query(
    "join_cross",
    oracle="SELECT n_name, r_name FROM nation CROSS JOIN region",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference CrossJoin (src/physical_plan/cross_join.rs:25-192; SQL path:
    join-without-ON, main.rs:27).  Spark broadcasts the small side."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select("n_name", "r_name")


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    tags=("join", "left"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join — declared in the reference (JoinType::Left,
    logical_plan/plan.rs:133-139) but silently executed as INNER
    (hash_join.rs:48-49).  Implemented correctly here."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join", "right"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join — same declared-but-inner story as LEFT
    (sql/planner.rs:218-236 maps it; physical ignores it)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "join_full_outer",
    oracle="""
    WITH a AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
    b AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big_orders
          FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
    SELECT COALESCE(a.c_custkey, b.o_custkey) AS custkey,
           a.c_acctbal, b.n_big_orders
    FROM a FULL JOIN b ON a.c_custkey = b.o_custkey
    """,
    tags=("join", "full"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with genuine unmatched rows on BOTH sides:
    high-balance customers (some with no big orders → right NULLs) vs
    per-customer big-order counts (some from low-balance customers →
    left NULLs).  The reference's planner maps Full
    (sql/planner.rs:218-236) but the physical layer has no outer path at
    all — here it is Spark's native full-outer shuffle join, which AQE
    plans like any other scaling join (no broadcast possible for full
    outer)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    ob = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_big_orders"))
    )
    return c.join(ob, c.c_custkey == ob.o_custkey, "full").select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        "c_acctbal",
        "n_big_orders",
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000)
    """,
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (absent from the reference; SURVEY §2.3 'not present').
    Semi-join avoids materializing the probe side's payload — at 100 TB this
    is the difference between a join and an existence check."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (absent from the reference)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ===========================================================================
# §2.4 — aggregation
# ===========================================================================


@query(
    "agg_ungrouped",
    oracle="""
    SELECT COUNT(l_orderkey) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    """,
    tags=("aggregate",),
)
def agg_ungrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ungrouped aggregation (``select count(id), sum(id) from t1``,
    main.rs:36; physical: aggregate/mod.rs:123-139).  Spark runs
    partial-then-final aggregation (map-side combine) — no full shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_orderkey").alias("cnt"),
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_price"),
    )


@query(
    "agg_grouped_computed_key",
    oracle="""
    SELECT CAST(c_custkey % 3 AS BIGINT) AS key_mod,
           COUNT(c_custkey) AS cnt,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer GROUP BY c_custkey % 3
    """,
    tags=("aggregate", "groupby"),
)
def agg_grouped_computed_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference grouped agg on a computed key (``group by id % 3`` with
    count/sum/avg/min/max, main.rs:40; physical: aggregate/mod.rs:140-221).
    Divergences fixed vs the reference: group-key column is KEPT in the
    output (the reference drops it, aggregate/mod.rs:115-121) and multi-key
    grouping works (reference evaluates only the first key,
    aggregate/mod.rs:141-146)."""
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return (
        c.groupBy((F.col("c_custkey") % 3).cast("long").alias("key_mod"))
        .agg(
            F.count("c_custkey").alias("cnt"),
            dsum(bal, "sum_bal"),
            davg(bal, "avg_bal"),
            F.min(bal).alias("min_bal"),
            F.max(bal).alias("max_bal"),
        )
    )


@query(
    "agg_multi_key_having",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    """,
    tags=("aggregate", "groupby", "having"),
)
def agg_multi_key_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key GROUP BY + HAVING.  The reference never parses HAVING
    (sql/planner.rs:58-84) and can't group on >1 key; both native here."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("cnt") > 100)
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS distinct_cust,
           COUNT(DISTINCT o_orderpriority) AS distinct_prio
    FROM orders
    """,
    tags=("aggregate", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (absent from the reference, SURVEY §2.4)."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("distinct_cust"),
        F.countDistinct("o_orderpriority").alias("distinct_prio"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (absent from the reference)."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ===========================================================================
# §2.5 — sort / limit / top-k
# ===========================================================================


@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit", "topk"),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY (parsed then silently DROPPED by the reference,
    sql/planner.rs:159-162) + LIMIT → Spark plans a TakeOrderedAndProject:
    per-partition top-k then k-way merge — no global sort shuffle."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ===========================================================================
# §2.6 — set operations (absent from reference; sql/planner.rs:58-84 todo!())
# ===========================================================================


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "union"),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier nation keys — set ops are
    absent from the reference entirely (SURVEY §2.6)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "intersect"),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer and supplier nation keys (SURVEY §2.6)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "except"),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with no supplier (SURVEY §2.6)."""
    n = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.exceptAll(s).distinct()


# ===========================================================================
# §2.8 — window functions (absent from reference)
# ===========================================================================


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    """,
    tags=("window", "rank"),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions (SURVEY §2.8: entirely absent from the
    reference).  row_number carries a unique tie-break for determinism."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    by_price_key = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(by_price).cast("long").alias("rnk"),
        F.dense_rank().over(by_price).cast("long").alias("drnk"),
        F.row_number().over(by_price_key).cast("long").alias("rn"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
    """,
    tags=("window", "running"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + LAG over an event stream (absent from reference).
    Decimal accumulation keeps the running sum exact and engine-agnostic."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec(F.col("value")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
             PARTITION BY user_id
             ORDER BY (CAST(ts AS DATE) - DATE '1970-01-01')
             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_3d
    FROM events
    """,
    tags=("window", "range", "events"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, the trailing 3-DAY sum of
    event value (RANGE 2 PRECEDING over epoch-day ordering) — unlike a
    ROWS frame, all events of a peer day enter the frame together and the
    result is independent of intra-day row order, which is exactly why
    time-range frames are the hash-stable choice for rolling metrics.
    Decimal accumulation keeps the window sum exact in both engines."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    day_num = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    w = (
        Window.partitionBy("user_id")
        .orderBy(day_num)
        .rangeBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.to_date("ts").cast("string").alias("day"),
        F.sum(dec(F.col("value"))).over(w).cast("double").alias("trailing_3d"),
    )


# ===========================================================================
# TPC-H-ish headline queries (bench workload)
# ===========================================================================


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) *
                    (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
                AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)       AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "aggregate", "bench"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship query: scan + filter +
    multi-key grouped aggregation with derived measures.  One shuffle over
    a 6-value key space; partial aggregation collapses almost everything
    map-side, so it scales linearly with input bytes."""
    li = t(spark, sf_dir, "lineitem")
    # r14: exact long fixed point replaces the per-row decimal chain (the
    # scan-dominant cost — see fp100/fpsum); outputs bit-identical
    price_c = fp100(F.col("l_extendedprice"))
    disc_c = fp100(F.col("l_discount"))
    tax_c = fp100(F.col("l_tax"))
    qty_c = fp100(F.col("l_quantity"))
    disc_price_fp = price_c * (F.lit(100) - disc_c)  # scale 4
    charge_fp = disc_price_fp * (F.lit(100) + tax_c)  # scale 6
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fpsum(qty_c, 2).alias("sum_qty"),
            fpsum(price_c, 2).alias("sum_base_price"),
            fpsum(disc_price_fp, 4).alias("sum_disc_price"),
            fpsum(charge_fp, 6).alias("sum_charge"),
            (fpsum(qty_c, 2) / n).alias("avg_qty"),
            (fpsum(price_c, 2) / n).alias("avg_price"),
            (fpsum(disc_c, 2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "aggregate", "bench"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 — selective dimension filter, fact join, grouped revenue,
    top-k.  No broadcast hints: customer/orders scale with SF, so the join
    strategy is left to Catalyst/AQE — at small SF it measures the filtered
    sides under the threshold and broadcasts; at 100× it falls back to a
    shuffle join instead of OOMing on a forced multi-GB broadcast."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # r14: exact long fixed point (scale 4) — see fp100/fpsum
    revenue_fp = fp100(F.col("l_extendedprice")) * (
        F.lit(100) - fp100(F.col("l_discount"))
    )
    return (
        li.join(o.join(c, o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(fpsum(revenue_fp, 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q05_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    tags=("tpch", "join", "aggregate", "bench"),
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-way star join → revenue per nation.  Only the
    bounded dims (nation, region) carry broadcast hints; customer/orders/
    supplier scale with SF, so their join strategy is AQE's call — size-based
    broadcast at small SF, shuffle join at scale."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    # r14: exact long fixed point (scale 4) — see fp100/fpsum
    revenue_fp = fp100(F.col("l_extendedprice")) * (
        F.lit(100) - fp100(F.col("l_discount"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(fpsum(revenue_fp, 4).alias("revenue"))
    )


@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "filter", "aggregate", "bench"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — pure filter+aggregate; every predicate pushes to the
    parquet scan (row-group pruning on l_shipdate at scale)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # r14: exact long fixed point (scale 4) — see fp100/fpsum
            fpsum(
                fp100(F.col("l_extendedprice")) * fp100(F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi", "aggregate"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS → left-semi join, then a tiny aggregation.
    The semi join never materializes lineitem payload columns."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "aggregate", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returns per customer, top 20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = dec(F.col("l_extendedprice")) * (one() - dec(F.col("l_discount"), 4, 2))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    tags=("tpch", "join", "aggregate", "case"),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: conditional counting (CASE inside SUM)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'S%'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
    tags=("tpch", "join", "aggregate", "case"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share — ratio of two exact decimal
    sums (single double division at the end)."""
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = dec(F.col("l_extendedprice")) * (one() - dec(F.col("l_discount"), 4, 2))
    promo = F.when(F.col("p_type").like("S%"), rev).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("promo_share")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey
    """,
    tags=("tpch", "join", "aggregate", "subquery"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: IN-subquery over a grouped HAVING → semi join
    against the pre-aggregated order keys."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec(F.col("l_quantity"))).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.sum(dec(F.col("l_quantity"))).cast("double").alias("total_qty"))
    )


# ===========================================================================
# SQL-path queries (reference's primary entry: run_sql, db.rs:24-37)
# ===========================================================================


def _sql_query(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the corpus as temp views and run via spark.sql — exercising
    the same parse→plan→optimize→execute path as the reference's run_sql."""
    from .sources import register_sf_dir

    register_sf_dir(spark, sf_dir)
    return spark.sql(sql)


_IMPLICIT_JOIN_SQL_SPARK = """
    SELECT n_name, r_name
    FROM nation, region
    WHERE n_regionkey = r_regionkey AND n_nationkey < 10
"""


@query(
    "sql_implicit_join",
    oracle="""
    SELECT n_name, r_name
    FROM nation, region
    WHERE n_regionkey = r_regionkey AND n_nationkey < 10
    """,
    tags=("sql", "join", "implicit"),
)
def sql_implicit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit join from WHERE (``FROM a, b WHERE a.x = b.y``) — the
    reference infers inner joins from cross-plan equality predicates at
    planning time (sql/planner.rs:305-380); Catalyst does the same rewrite."""
    return _sql_query(spark, sf_dir, _IMPLICIT_JOIN_SQL_SPARK)


@query(
    "sql_subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    tags=("sql", "subquery"),
)
def sql_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in WHERE (unsupported by the reference: non-SELECT
    bodies hit todo!(), sql/planner.rs:45-56).  NOTE the subquery result is
    only used as a comparison bound — float avg is fine here because both
    engines compare against their own avg of the SAME single-column values;
    determinism verified by the oracle harness."""
    return _sql_query(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """,
    )


@query(
    "sql_union_all",
    oracle="""
    SELECT 'cust' AS src, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'supp' AS src, s_nationkey FROM supplier
    """,
    tags=("sql", "setop"),
)
def sql_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no dedup shuffle, unlike UNION)."""
    return _sql_query(
        spark,
        sf_dir,
        """
        SELECT 'cust' AS src, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supp' AS src, s_nationkey FROM supplier
        """,
    )


_LATERAL_SQL = """
    SELECT n.n_name, l.c_name, l.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2
    ) l
"""


@query(
    "sql_lateral_join",
    oracle=_LATERAL_SQL,
    tags=("sql", "join", "lateral"),
)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery — per-nation top-2 customers by
    balance, the classic top-N-per-group as a lateral join (far beyond the
    reference's planner, which todo!()s on any non-trivial FROM).
    Catalyst rewrites the correlation to a join + per-group limit; total
    order under LIMIT (acctbal DESC, then name) keeps both engines'
    row sets identical."""
    return _sql_query(spark, sf_dir, _LATERAL_SQL)


_UDTF_LATERAL_ORACLE = """
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '[ \t\n\r\f]+')) AS word,
             CAST(generate_subscripts(regexp_split_to_array(text, '[ \t\n\r\f]+'), 1) - 1
                  AS INTEGER) AS idx
      FROM documents
    )
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(idx) AS BIGINT) AS min_idx,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM words GROUP BY word
"""


@query(
    "sql_udtf_lateral",
    oracle=_UDTF_LATERAL_ORACLE,
    tags=("sql", "udtf", "lateral", "python-udf"),
)
def sql_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in SQL — the table-function third of the UDF/UDAF/UDTF
    extension triad (the reference's only hook is a compiled-in Rust
    trait): ``split_words`` turns each document row into (word, position)
    rows via ``LATERAL``, then plain SQL aggregates per word.  UDTFs are
    row-at-a-time Python — the SLOW extension path, registered here to
    prove the surface end-to-end against an oracle; anything
    word-splitting-shaped in the hot path should use the built-in
    split/explode (see ``text_token_stats``), which never leaves the JVM.
    Python ``str.split()`` and the oracle's explicit whitespace class
    agree on this corpus's ASCII text (the repo-wide `[ \t\n\r\f]`
    hardening)."""
    from .functions import register_split_words_udtf

    register_split_words_udtf(spark)
    from .sources import register_sf_dir

    register_sf_dir(spark, sf_dir)
    return spark.sql(
        """
        SELECT word,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(idx) AS BIGINT) AS min_idx,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM documents, LATERAL split_words(text)
        GROUP BY word
        """
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent from the reference).  Spark computes
    all levels in one pass (Expand + single shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (absent from the reference)."""
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "agg_stats_exact",
    oracle="""
    WITH s AS (
      SELECT c_nationkey,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2)))
                  AS DOUBLE) AS sxx
      FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, n,
           (sxx - sx * sx / n) / (n - 1)        AS variance,
           SQRT((sxx - sx * sx / n) / (n - 1))  AS stddev
    FROM s WHERE n > 1
    """,
    tags=("aggregate", "stats"),
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev via exact decimal moment sums + a fixed double
    expression — deterministic across engines (built-in stddev uses a
    streaming float recurrence whose result is partition-order-dependent,
    so it can never hash-match; this formulation can)."""
    c = t(spark, sf_dir, "customer")
    bal2 = dec(F.col("c_acctbal")) * dec(F.col("c_acctbal"))
    s = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("c_acctbal"))).cast("double").alias("sx"),
        F.sum(bal2).cast("double").alias("sxx"),
    )
    variance = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return s.filter(F.col("n") > 1).select(
        "c_nationkey",
        "n",
        variance.alias("variance"),
        F.sqrt(variance).alias("stddev"),
    )


# -- extension registrations (text / dedup / similarity / events) are pulled
#    in at import time so that importing `queries` yields the full registry.
from .operators import register_all as _register_operator_queries  # noqa: E402

_register_operator_queries()


@query(
    "agg_percentiles_exact",
    oracle="""
    SELECT event_type,
           CAST(quantile_cont(value, 0.5)  AS DOUBLE) AS p50,
           CAST(quantile_cont(value, 0.9)  AS DOUBLE) AS p90,
           CAST(quantile_cont(value, 0.99) AS DOUBLE) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≙
    DuckDB ``quantile_cont`` — both the standard linear-interpolation
    definition over identical input doubles).  The approximate-sketch
    variant (percentile_approx/t-digest) is engine-specific by design and
    exercised in tests, not oracle-gated."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(NULLIF(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS "1-URGENT",
           CAST(NULLIF(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS BIGINT) AS "2-HIGH",
           CAST(NULLIF(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS BIGINT) AS "3-MEDIUM",
           CAST(NULLIF(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0) AS BIGINT) AS "4-NOT SPECIFIED",
           CAST(NULLIF(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS BIGINT) AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list — explicit values keep
    the schema static and skip the extra distinct-values job Spark needs
    otherwise.  Absent combinations are NULL (mirrored via NULLIF in the
    oracle's conditional-count formulation)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").pivot("o_orderpriority", _PRIORITIES).count()


@query(
    "events_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
    tags=("expression", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (no JSON support at all
    in the reference).  get_json_object streams JVM-side; for repeated
    multi-field extraction at scale prefer one from_json with a schema."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)      AS y,
           CAST(month(o_orderdate) AS BIGINT)     AS m,
           CAST(day(o_orderdate) AS BIGINT)       AS d,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS plus30,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders
    """,
    tags=("expression", "datetime"),
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions (absent from the reference: Timestamp cast is
    todo!(), sql/planner.rs:517)."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("d"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.date_add(d.cast("date"), 30).cast("string").alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT)              AS dim,
           CAST(embedding[1] AS DOUBLE)                AS first_val,
           CAST(list_min(embedding) AS DOUBLE)         AS min_val,
           CAST(list_max(embedding) AS DOUBLE)         AS max_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
    tags=("expression", "array"),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column functions (the reference has no nested types at all,
    SURVEY §1.1).  Scalar outputs only — no float arithmetic, so values are
    bit-exact across engines."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.array_min(emb).cast("double").alias("min_val"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           o_orderkey,
           COALESCE(o_totalprice, -1.0) AS price_or_default,
           (o_orderkey IS NULL)         AS no_order,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_nullif,
           CASE WHEN o_totalprice IS NOT NULL THEN 'has' ELSE 'none' END AS has_order
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 300000
    """,
    tags=("expression", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling functions over a deliberately sparse left join
    (COALESCE / IS NULL / NULLIF / CASE).  The reference supports only
    literal NULL (sql/planner.rs:400)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "o_orderkey",
        F.coalesce(F.col("o_totalprice"), F.lit(-1.0)).alias("price_or_default"),
        F.col("o_orderkey").isNull().alias("no_order"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullif"),
        F.when(F.col("o_totalprice").isNotNull(), "has").otherwise("none").alias("has_order"),
    )


@query(
    "q02_top_customer_per_nation",
    oracle="""
    SELECT n_name, c_name, c_acctbal
    FROM (
      SELECT n_name, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn = 1
    """,
    tags=("tpch", "window", "groupwise-max"),
)
def q02_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's shape (groupwise-min/max join-back) as a ranking window —
    one shuffle, no self-join re-aggregation."""
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "c_name", "c_acctbal")
    )


@query(
    "q07_nation_trade",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "join", "aggregate"),
)
def q07_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: cross-nation trade volume by year.  The nation
    dimension joins twice under different roles — both hinted broadcast
    (25 rows, genuinely bounded); orders/customer/supplier are unhinted."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    # r14: exact long fixed point (scale 4) — see fp100/fpsum
    rev_fp = fp100(F.col("l_extendedprice")) * (F.lit(100) - fp100(F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .filter(F.col("cnk") != F.col("snk"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(fpsum(rev_fp, 4).alias("revenue"))
    )


@query(
    "q09_profit_by_nation_year",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) -
                    CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) *
                    CAST(0.1 AS DECIMAL(3,1)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    """,
    tags=("tpch", "join", "aggregate"),
)
def q09_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit decomposition (revenue minus a supply-cost
    proxy of 10% retail price × quantity — the corpus has no partsupp
    table).  All decimal, exact."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    # r14: exact long fixed point — see fp100/fpsum.  The decimal expr is
    # scale 5 (term1 ep*(1-disc) scale 4, term2 rp*qty*0.1 scale 5), so
    # term1 scales up by 10 and the sum divides by 10^5.
    profit_fp = fp100(F.col("l_extendedprice")) * (
        F.lit(100) - fp100(F.col("l_discount"))
    ) * 10 - fp100(F.col("p_retailprice")) * fp100(F.col("l_quantity"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(fpsum(profit_fp, 5).alias("profit"))
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch", "aggregate", "double-agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation (orders per customer → customers
    per order-count), zero-order customers included via left join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tags=("tpch", "aggregate", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue in a quarter — the
    ties-at-max pattern via scalar subquery.  Revenue compared as DECIMAL
    (exact), only the output casts to double."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec(F.col("l_extendedprice")) * (one() - dec(F.col("l_discount"), 4, 2))).alias(
            "total_rev"
        )
    )
    max_rev = rev.agg(F.max("total_rev").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev == F.col("m"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS pk,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS cnt
    FROM lineitem JOIN pavg ON l_partkey = pk
    WHERE l_quantity < lim
    """,
    tags=("tpch", "aggregate", "correlated"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: rows below 20% of their part's average quantity — the
    correlated-average decorrelated into an aggregate + join.  The 0.2*avg
    bound is a fixed double expression over exact sums → identical
    comparisons in both engines."""
    li = t(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (F.sum(dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))).alias(
            "lim"
        )
    )
    return (
        li.join(pavg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(
            (F.sum(dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "q19_disjunctive_filter",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("tpch", "filter", "disjunction"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides.  Catalyst extracts the
    common l_quantity/p_size bounds for partial pushdown below the join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((brand == "Brand#1") & size.between(1, 15) & q.between(1, 20))
        | ((brand == "Brand#2") & size.between(10, 30) & q.between(10, 30))
        | ((brand == "Brand#3") & size.between(20, 50) & q.between(20, 40))
    )
    rev = dec(F.col("l_extendedprice")) * (one() - dec(F.col("l_discount"), 4, 2))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("tpch", "anti", "subquery", "aggregate"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: above-average-balance customers with no orders — scalar
    subquery (exact-sum average) + anti join + aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("a"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q08_market_share",
    oracle="""
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2)) *
             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
           CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
    tags=("tpch", "join", "aggregate", "ratio"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: one supplier-nation's fraction of the
    revenue delivered into a region, per year — ratio of two exact decimal
    sums."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    vol = dec(F.col("l_extendedprice")) * (one() - dec(F.col("l_discount"), 4, 2))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .filter(F.col("r_name") == "ASIA")
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return base.groupBy("o_year").agg(
        (F.sum(national).cast("double") / F.sum("volume").cast("double")).alias("mkt_share")
    )


@query(
    "q11_important_balance",
    oracle="""
    WITH tot AS (
      SELECT SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS g FROM supplier
    )
    SELECT s_nationkey,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS nation_bal
    FROM supplier, tot
    GROUP BY s_nationkey, tot.g
    HAVING SUM(CAST(s_acctbal AS DECIMAL(12,2))) > CAST(0.1 AS DECIMAL(3,1)) * tot.g
    """,
    tags=("tpch", "aggregate", "having", "subquery"),
)
def q11_important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: groups whose share exceeds a fraction of the global
    total (scalar-subquery threshold inside HAVING).  Compared in DECIMAL —
    exact on both sides of the inequality."""
    s = t(spark, sf_dir, "supplier")
    bal = dec(F.col("s_acctbal"))
    tot = s.agg(F.sum(bal).alias("g"))
    return (
        s.groupBy("s_nationkey")
        .agg(F.sum(bal).alias("nb"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nb") > F.lit("0.1").cast("decimal(3,1)") * F.col("g"))
        .select("s_nationkey", F.col("nb").cast("double").alias("nation_bal"))
    )


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "aggregate", "distinct"),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct-supplier counts per part classification
    with NOT-equal + IN-list dimension filters."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin([1, 5, 9, 13, 17, 21, 25, 29])
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q21_sole_supplier_orders",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(*) AS n_lines,
             MIN(l_suppkey) AS the_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_order JOIN supplier ON the_supp = s_suppkey
    WHERE n_supp = 1 AND n_lines > 1
    GROUP BY s_name
    """,
    tags=("tpch", "aggregate", "join"),
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape (per-order supplier-cardinality analysis → the
    sole supplier of multi-line orders) without the commit/receipt-date
    columns the corpus lacks."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.count(F.lit(1)).alias("n_lines"),
        F.min("l_suppkey").alias("the_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") == 1) & (F.col("n_lines") > 1))
        .join(s, F.col("the_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-flag, per-status,
    and grand totals in one pass."""
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND UNBOUNDED FOLLOWING) AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                                     AND UNBOUNDED FOLLOWING) AS second_price,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "value-functions"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value + ntile over a total per-customer order (the
    unbounded frame makes last/nth well-defined; the unique tie-break makes
    every value deterministic)."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(order).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.ntile(4).over(order).cast("long").alias("quartile"),
    )


@query(
    "window_distribution_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume_dist,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "distribution-functions"),
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / dense_rank — the distribution window
    family (SURVEY §2.8 breadth; the reference has no windows at all).
    Both are single divisions of identical integers ((rank−1)/(n−1),
    rank/n), so the doubles agree bit-for-bit; the unique o_orderkey
    tie-break pins every rank."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.dense_rank().over(w).cast("long").alias("dense_rnk"),
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    WHERE c_custkey < 30
    GROUP BY c_nationkey
    """,
    tags=("aggregate", "string-agg"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect → sort → join gives a
    deterministic concatenation regardless of partition arrival order —
    the only way a distributed listagg can hash-match anything."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 30)
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names")
    )


@query(
    "agg_boolean",
    oracle="""
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 1000)                         AS all_over_1k,
           BOOL_OR(o_totalprice > 400000)                        AS any_over_400k,
           CAST(COUNT(*) FILTER (o_totalprice > 200000) AS BIGINT) AS n_over_200k,
           CAST(COUNT(*) AS BIGINT)                              AS n_total
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "boolean"),
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and conditional aggregates — every/any (universal and
    existential quantifiers over a group) and count_if (filtered count) —
    all partial-aggregable, so they combine map-side like sum/count and
    never see the 3VL pitfalls of hand-rolled CASE chains."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_totalprice") > 200000).cast("long").alias("n_over_200k"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )


@query(
    "misc_scalar_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1)          AS first_word,
           split_part(p_name, ' ', 1)                     AS name_head,
           GREATEST(p_size, 10)                           AS size_floor10,
           LEAST(p_size, 40)                              AS size_cap40,
           CAST(SIGN(p_retailprice - 1000) AS DOUBLE)     AS above_1k,
           ROUND(POWER(p_size, 2), 6)                     AS size_sq,
           ROUND(EXP(p_size / 100.0), 9)                  AS exp_val,
           ROUND(LN(p_retailprice), 9)                    AS ln_price,
           ROUND(LOG10(p_retailprice), 9)                 AS log10_price,
           CAST(CEIL(p_retailprice) AS BIGINT)            AS price_ceil,
           ROUND(p_retailprice, 1)                        AS price_round1
    FROM part
    """,
    tags=("expression", "scalar", "misc"),
)
def misc_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining scalar-function families: regex capture groups, string
    splitting, greatest/least, sign, power/exp/ln/log10 (rounded — libm),
    ceil, round.  Integer-domain power() is exact; transcendentals round
    to 9."""
    p = t(spark, sf_dir, "part")
    price, size = F.col("p_retailprice"), F.col("p_size")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_type"), r"([A-Z]+)", 1).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("name_head"),
        F.greatest(size, F.lit(10)).alias("size_floor10"),
        F.least(size, F.lit(40)).alias("size_cap40"),
        F.signum(price - 1000).cast("double").alias("above_1k"),
        F.round(F.pow(size, 2), 6).alias("size_sq"),
        F.round(F.exp(size / 100.0), 9).alias("exp_val"),
        F.round(F.log(price), 9).alias("ln_price"),
        F.round(F.log10(price), 9).alias("log10_price"),
        F.ceil(price).cast("long").alias("price_ceil"),
        F.round(price, 1).alias("price_round1"),
    )


@query(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, a.k.a. melt) — the inverse of agg_pivot; Spark's
    unpivot is a zero-shuffle Expand."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


@query(
    "agg_corr_exact",
    oracle="""
    WITH b AS (
      SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qx,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS px
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(qx) AS HUGEINT) AS sx,
             CAST(SUM(px) AS HUGEINT) AS sy,
             CAST(SUM(CAST(qx AS HUGEINT) * qx) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(px AS HUGEINT) * px) AS HUGEINT) AS syy,
             CAST(SUM(CAST(qx AS HUGEINT) * px) AS HUGEINT) AS sxy
      FROM b
    )
    SELECT CAST(n * sxy - sx * sy AS DOUBLE) /
           (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) *
            SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price,
           CAST(n AS BIGINT) AS n_rows
    FROM m
    """,
    tags=("aggregate", "stats", "corr"),
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact integer moments — engine-agnostic,
    unlike the streaming-recurrence corr() builtin (partition-order-
    dependent float accumulation).  An earlier draft cast each moment sum
    to double and evaluated ``n*sxx - sx*sx`` in floating point; DuckDB's
    vectorized executor contracts that multiply-subtract into an FMA
    while the JVM does not — a last-ulp mismatch, first visible at sf0.1.
    Values are therefore CENTS integers end-to-end (correlation is
    scale-invariant): every moment and every covariance/variance term is
    an exact integer (DECIMAL(38,0) here, HUGEINT in the oracle — the
    same integers), and the only float ops left (3 casts, 2 sqrts,
    1 multiply, 1 divide) are each correctly rounded on identical inputs,
    so the result is bit-identical by IEEE semantics, not by luck.
    Magnitude check at 100× the bench corpus: n·syy ≈ 6e7 × 6e21 =
    3.6e29 ≪ 1e38."""
    li = t(spark, sf_dir, "lineitem")
    qx = (dec(F.col("l_quantity")) * 100).cast("long")
    px = (dec(F.col("l_extendedprice")) * 100).cast("long")
    m = li.agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.sum(qx).cast("decimal(19,0)").alias("sx"),
        F.sum(px).cast("decimal(19,0)").alias("sy"),
        F.sum((qx * qx).cast("decimal(38,0)")).alias("sxx"),
        F.sum((px * px).cast("decimal(38,0)")).alias("syy"),
        F.sum((qx * px).cast("decimal(38,0)")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy).cast("double") / (
        F.sqrt((n * F.col("sxx") - sx * sx).cast("double"))
        * F.sqrt((n * F.col("syy") - sy * sy).cast("double"))
    )
    return m.select(corr.alias("corr_qty_price"), n.cast("long").alias("n_rows"))


@query(
    "sql_correlated_scalar_subquery",
    oracle="""
    SELECT n_name,
           (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
    FROM nation
    """,
    tags=("sql", "subquery", "correlated"),
)
def sql_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list — Catalyst decorrelates
    it into an aggregate + left join (the rewrite the reference's planner
    has no notion of)."""
    return _sql_query(
        spark,
        sf_dir,
        """
        SELECT n_name,
               (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
        FROM nation
        """,
    )


@query(
    "set_ops_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_custkey < 100
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "intersect-all"),
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set op (INTERSECT ALL keeps duplicate multiplicity —
    min of the two sides' counts per value)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(F.col("c_nationkey").alias("k"))
    )
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s)


@query(
    "array_explode_positions",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
           (unnest(embedding) >= 0) AS is_positive
    FROM embeddings
    WHERE vec_id < 50
    """,
    tags=("expression", "array", "explode"),
)
def array_explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array column → (position, element) rows — the
    normalize-nested-data primitive (comparison only; no float math)."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        (F.col("v") >= 0).alias("is_positive"),
    )


@query(
    "q20_excess_stock_analog",
    oracle="""
    WITH ps AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate <  TIMESTAMP '1997-01-01'
                      THEN CAST(l_quantity AS DECIMAL(12,2))
                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS y96_qty
      FROM lineitem GROUP BY 1, 2
    ),
    excess AS (
      SELECT ps.l_suppkey
      FROM ps
      JOIN part ON p_partkey = ps.l_partkey
      WHERE p_name LIKE 'r%' AND ps.total_qty > 2 * ps.y96_qty
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
    """,
    tags=("tpch", "semi", "subquery", "aggregate"),
)
def q20_excess_stock_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog on the available corpus: the reference corpus has
    no partsupp table (SURVEY §8 backlog #1), so the per-(supplier, part)
    stock relation is derived from lineitem itself — all-time shipped
    quantity standing in for availqty.  The SHAPE is Q20's: a correlated
    per-pair aggregate threshold (total > 2 × the 1996 movement, compared
    in DECIMAL — exact), a part-name filter, and a double semi-join up to
    the supplier list.  No broadcast hints: part and the lineitem-derived
    pair aggregate both scale with SF."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("r%"))
    s = t(spark, sf_dir, "supplier")
    qty = dec(F.col("l_quantity"))
    in96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    ps = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(qty).alias("total_qty"),
        F.sum(F.when(in96, qty).otherwise(F.lit(0).cast("decimal(12,2)"))).alias("y96_qty"),
    )
    excess = (
        ps.join(p, ps.l_partkey == p.p_partkey, "left_semi")
        .filter(F.col("total_qty") > 2 * F.col("y96_qty"))
        .select("l_suppkey")
    )
    return s.join(
        excess, s.s_suppkey == excess.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ===========================================================================
# Spark 4 SQL surface beyond the reference: recursive CTE, VARIANT
# ===========================================================================

#: one SQL text for BOTH engines (Spark 4 and DuckDB both speak
#: WITH RECURSIVE + WINDOW clauses): walk each customer's order chain in
#: date order, accumulating an exact decimal running total.  Every node
#: has at most ONE successor (the next order), so the recursion is
#: linear — the frontier only shrinks, never explodes; depth is bounded
#: by max orders per customer (25 in this corpus, well under Spark's
#: 100-level recursion limit).
_RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE ord AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             ROW_NUMBER() OVER w AS rn,
             LEAD(o_orderkey) OVER w AS next_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    chain AS (
      SELECT o_custkey, o_orderkey, CAST(1 AS BIGINT) AS depth,
             price AS cum_price, next_key
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.o_custkey, o.o_orderkey, c.depth + CAST(1 AS BIGINT),
             CAST(c.cum_price + o.price AS DECIMAL(12,2)), o.next_key
      FROM chain c JOIN ord o ON o.o_orderkey = c.next_key
    )
    SELECT o_custkey, o_orderkey, depth,
           CAST(cum_price AS DOUBLE) AS cum_price
    FROM chain
"""


@query(
    "sql_recursive_chain",
    oracle=_RECURSIVE_CHAIN_SQL,
    tags=("sql", "recursive", "cte"),
)
def sql_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE — far beyond the reference's
    planner, sql/planner.rs): per-customer order chains walked step by
    step with an exact running total.  The same SQL text runs on both
    engines.

    The recursion is LINEAR by construction (each order has at most one
    successor via LEAD), so the iterative union's frontier is monotone
    shrinking — the safe recursive shape at scale; transitive closures
    over fan-out graphs belong to the label-propagation operator
    (dedup_connected_components) instead."""
    return _sql_query(spark, sf_dir, _RECURSIVE_CHAIN_SQL)


@query(
    "events_variant_props",
    oracle="""
    WITH typed AS (
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      FROM events
    )
    SELECT CAST(k_val // 10 AS BIGINT) AS k_decile,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k_val) AS BIGINT) AS sum_k,
           CAST(MIN(event_id) AS BIGINT) AS min_event
    FROM typed GROUP BY 1
    """,
    tags=("expression", "json", "variant"),
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access (Spark 4): parse the JSON
    props column ONCE into a VARIANT value, then typed-path extract —
    the shredded-JSON pattern that replaces per-field get_json_object
    re-parsing (events_json_extract) for wide multi-field access at
    scale.  Grouped rollup keeps the output small and integer-exact."""
    ev = t(spark, sf_dir, "events")
    k_val = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    typed = ev.select("event_id", k_val.alias("k_val"))
    return typed.groupBy(
        F.floor(F.col("k_val") / 10).cast("long").alias("k_decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("k_val").cast("long").alias("sum_k"),
        F.min("event_id").cast("long").alias("min_event"),
    )
