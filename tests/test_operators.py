"""Operator unit tests on the reference's own fixtures (FIXTURES.md).

Mirrors the reference's inline test strategy (SURVEY §5): t1 =
data/test_data.csv (8 rows, id 3 absent), employee/rank/department join
fixtures, and the null-bearing MemTable column.  Expectations match the
reference's asserted outputs where it asserts (selection.rs:114-179,
unary.rs:111-171, main.rs README outputs) — and CORRECT semantics where
the reference is buggy (each divergence noted)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from naive_query_engine_spark import NaiveDB
from naive_query_engine_spark.functions import AGGREGATE_FUNCTIONS, SCALAR_FUNCTIONS, call

T1_ROWS = [
    (1, "veeupup", 23, 60.0),
    (2, "alex", 20, 90.1),
    (4, "lynne", 18, 99.99),
    (5, "alice", 19, 81.1),
    (6, "bob", 20, 82.2),
    (7, "jack", 21, 83.3),
    (8, "cock", 22, 84.4),
    (9, "primer", 23, 85.5),
]

EMPLOYEES = [
    (1, "alice", 1, 1),
    (2, "bob", 1, 2),
    (3, "carol", 2, 2),
    (4, "dave", 3, 3),
    (5, "erin", 2, 1),
]
RANKS = [(1, "master"), (2, "diamond"), (3, "grandmaster")]
DEPTS = [(1, "IT"), (2, "Marketing"), (3, "Human Resource")]


@pytest.fixture(scope="module")
def db(spark):
    db = NaiveDB(spark)
    db.create_memory_table("t1", T1_ROWS, "id long, name string, age long, score double")
    db.create_memory_table(
        "employee", EMPLOYEES, "id long, name string, department_id long, rank long"
    )
    db.create_memory_table("rank", RANKS, "id long, rank_name string")
    db.create_memory_table("department", DEPTS, "id long, department_name string")
    db.create_memory_table(
        "memtab", [(1, 2, 3, None), (4, 5, 6, None), (7, 8, 9, 9)],
        "a int, b int, c int, d int",
    )
    return db


def test_selection_expr(db):
    """Reference selection.rs:114-179: filter ``id + 1 > 5``."""
    out = db.run_sql("SELECT id FROM t1 WHERE id + 1 > 5 ORDER BY id").collect()
    assert [r.id for r in out] == [5, 6, 7, 8, 9]


def test_limit_offset_order(db):
    """Reference main.rs:12 + README output: offset applies before limit."""
    out = db.run_sql(
        "SELECT id, name, age + 100 AS age_plus FROM t1 WHERE id < 9 "
        "ORDER BY id LIMIT 3 OFFSET 2"
    ).collect()
    assert [(r.id, r.name, r.age_plus) for r in out] == [
        (4, "lynne", 118), (5, "alice", 119), (6, "bob", 120),
    ]


def test_unary_math_exact(db):
    """Reference unary.rs:111-171 asserts exact abs/sin values; tan is the
    fixed version (the reference computes cos for tan — unary.rs:96)."""
    rows = db.table("t1").select(
        "id", F.abs(F.col("score")).alias("a"), F.sin(F.col("score")).alias("s"),
        F.tan(F.col("score")).alias("tt"),
    ).orderBy("id").collect()
    for r, (_, _, _, score) in zip(rows, T1_ROWS):
        assert r.a == abs(score)
        assert r.s == pytest.approx(math.sin(score), abs=1e-12)
        assert r.tt == pytest.approx(math.tan(score), abs=1e-9)


def test_join_chain_reference_main(db):
    """Reference main.rs:16-24: employee→rank→department chained joins."""
    out = db.run_sql(
        "SELECT employee.id, employee.name, rank_name, department_name "
        "FROM employee "
        "JOIN rank ON employee.rank = rank.id "
        "JOIN department ON employee.department_id = department.id "
        "ORDER BY employee.id"
    ).collect()
    assert len(out) == 5
    assert (out[0].name, out[0].rank_name, out[0].department_name) == ("alice", "master", "IT")
    assert (out[3].name, out[3].rank_name, out[3].department_name) == (
        "dave", "grandmaster", "Human Resource",
    )


def test_cross_join(db):
    """Reference main.rs:27: join without ON → cartesian product."""
    assert db.table("employee").crossJoin(db.table("rank")).count() == 15


def test_agg_ungrouped_reference(db):
    """Reference main.rs:36: ``select count(id), sum(id) from t1``."""
    r = db.run_sql("SELECT count(id) AS c, sum(id) AS s FROM t1").collect()[0]
    assert (r.c, r.s) == (8, 42)


def test_agg_group_by_computed_key(db):
    """Reference main.rs:40: group by id % 3 — keys KEPT in output (the
    reference drops key columns, aggregate/mod.rs:115-121; divergence)."""
    rows = db.run_sql(
        "SELECT id % 3 AS k, count(id) AS c, min(score) AS mn, max(score) AS mx "
        "FROM t1 GROUP BY id % 3 ORDER BY k"
    ).collect()
    got = {r.k: (r.c, r.mn, r.mx) for r in rows}
    assert got[0] == (2, 82.2, 85.5)       # ids 6, 9
    assert got[1] == (3, 60.0, 99.99)      # ids 1, 4, 7
    assert got[2] == (3, 81.1, 90.1)       # ids 2, 5, 8
    assert set(got) == {0, 1, 2}


def test_null_predicate_drops_rows(db):
    """SQL three-valued logic: NULL predicate → row dropped.  The reference
    instead APPENDS a null row (selection.rs:46,93 — bug not replicated)."""
    out = db.run_sql("SELECT a, d FROM memtab WHERE d > 5").collect()
    assert [(r.a, r.d) for r in out] == [(7, 9)]


def test_count_ignores_nulls(db):
    r = db.run_sql("SELECT count(d) AS cd, count(*) AS call FROM memtab").collect()[0]
    assert (r.cd, r.call) == (1, 3)


def test_cast_executes(db):
    """CAST works (the reference's physical cast is 100% todo!() and
    panics — cast.rs:45-87)."""
    r = db.run_sql(
        "SELECT CAST(id AS STRING) AS s, CAST(score AS BIGINT) AS i, "
        "CAST(id AS DOUBLE) AS d FROM t1 WHERE id = 4"
    ).collect()[0]
    assert (r.s, r.i, r.d) == ("4", 99, 4.0)


def test_function_registry_dispatch(db):
    c = db.table("t1").select(
        call("upper", F.col("name")).alias("u"),
        call("substr", F.col("name"), 1, 3).alias("s3"),
        call("length", F.col("name")).alias("ln"),
    ).filter(F.col("u") == "LYNNE").collect()[0]
    assert (c.u, c.s3, c.ln) == ("LYNNE", "lyn", 5)
    assert set(AGGREGATE_FUNCTIONS) == {"count", "sum", "avg", "min", "max"}
    assert "tan" in SCALAR_FUNCTIONS
    with pytest.raises(KeyError):
        call("nonexistent_fn", F.col("name"))


def test_python_and_pandas_udf_via_sql(db, spark):
    from naive_query_engine_spark.functions import register_pandas_udf, register_python_udf

    register_python_udf(spark, "py_double_it", lambda x: x * 2, "long")
    register_pandas_udf(spark, "pd_double_it", lambda s: s * 2, "long")
    r = db.run_sql(
        "SELECT py_double_it(id) AS p, pd_double_it(id) AS q FROM t1 WHERE id = 9"
    ).collect()[0]
    assert (r.p, r.q) == (18, 18)


def test_wildcard_and_alias(db):
    """Wildcard expansion (expression.rs:45) + Alias (todo!() in reference
    planner/mod.rs:189)."""
    df = db.run_sql("SELECT * FROM department")
    assert df.columns == ["id", "department_name"]
    r = db.run_sql("SELECT id AS dept_id FROM department WHERE id = 1").collect()[0]
    assert r.dept_id == 1


def test_udtf_lateral_join(db, spark):
    """Python UDTF via SQL LATERAL: explode names into (word, idx) rows."""
    from naive_query_engine_spark.functions import register_split_words_udtf

    register_split_words_udtf(spark)
    out = db.run_sql(
        "SELECT t1.id, s.word, s.idx FROM t1, LATERAL split_words(t1.name) AS s "
        "WHERE t1.id = 1"
    ).collect()
    assert [(r.word, r.idx) for r in out] == [("veeupup", 0)]
    direct = spark.sql("SELECT * FROM split_words('a b c')").collect()
    assert [(r.word, r.idx) for r in direct] == [("a", 0), ("b", 1), ("c", 2)]


def test_naiveframe_builder_api(db):
    """The reference's fluent builder surface, line-for-line
    (dataframe.rs:142-183 test shape)."""
    nf = db.frame if hasattr(db, "frame") else None
    f = db.frame("t1")
    out = (
        f.filter(F.col("id") < 9)
        .project([F.col("id"), F.col("name"), (F.col("age") + 100).alias("age_plus")])
        .offset(2)
        .limit(3)
    )
    # deterministic order via the underlying df (builder preserves laziness)
    rows = out.df.orderBy("id").collect()
    assert len(rows) == 3 and rows[0].age_plus in (118, 119, 120)

    agg = db.frame("t1").aggregate(
        [(F.col("id") % 3).alias("k")], [F.count(F.lit(1)).alias("c")]
    )
    assert sum(r.c for r in agg.collect()) == 8

    joined = db.frame("employee").join(db.frame("rank"), "inner", (["rank"], ["id"]))
    assert joined.df.count() == 5
    crossed = db.frame("employee").join(db.frame("rank"), "cross", ([], []))
    assert crossed.df.count() == 15
    assert "Filter" in db.frame("t1").filter(F.col("id") > 1).logical_plan()
