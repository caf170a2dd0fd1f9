"""Engine semantics under errors and randomness.

Spark 4 runs in ANSI mode: arithmetic errors RAISE instead of silently
returning NULL (the reference would panic or produce garbage).  The
``try_*`` variants are the explicit opt-in to NULL-on-error — the right
contract for dirty data at scale, where one bad row must not kill a
10-hour job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from naive_query_engine_spark import NaiveDB


@pytest.fixture(scope="module")
def db(spark):
    db = NaiveDB(spark)
    db.create_memory_table("nums", [(1, 0), (10, 2), (9, 3)], "a long, b long")
    db.create_memory_table("strs", [("42",), ("not-a-number",)], "s string")
    return db


def test_ansi_division_by_zero_raises(db):
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|divide by zero"):
        db.run_sql("SELECT a / b AS q FROM nums").collect()


def test_try_divide_yields_null(db):
    rows = db.run_sql("SELECT try_divide(a, b) AS q FROM nums ORDER BY a").collect()
    assert [r.q for r in rows] == [None, 3.0, 5.0]


def test_ansi_bad_cast_raises_try_cast_nulls(db):
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|invalid input"):
        db.run_sql("SELECT CAST(s AS INT) AS v FROM strs").collect()
    rows = db.run_sql("SELECT try_cast(s AS INT) AS v FROM strs ORDER BY s").collect()
    assert [r.v for r in rows] == [42, None]


def test_overflow_raises_try_add_nulls(db):
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        db.run_sql("SELECT 9223372036854775807 + a AS v FROM nums").collect()
    r = db.run_sql("SELECT try_add(9223372036854775807, 1) AS v").collect()[0]
    assert r.v is None


def test_seeded_sample_stability_contract(spark):
    """Spark 4 salts sample() per DataFrame INSTANCE: re-executing the same
    object is stable, but an identically-constructed sample (same seed!)
    draws differently.  Pin both sides of that contract — it is precisely
    why reproducible dataset splits must use content hashing
    (operators.quality.dataset_train_test_split), never sample()."""
    from naive_query_engine_spark.queries import t

    from .conftest import SF_ORACLE

    c = t(spark, SF_ORACLE, "customer")
    s = c.sample(0.2, seed=42).select("c_custkey")
    a = sorted(r.c_custkey for r in s.collect())
    b = sorted(r.c_custkey for r in s.collect())
    assert a == b and 0 < len(a) < c.count()  # same instance → stable
    s2 = c.sample(0.2, seed=42).select("c_custkey")
    d = sorted(r.c_custkey for r in s2.collect())
    # fresh instance: statistically ~same size, not guaranteed same rows
    assert 0 < len(d) < c.count()


def test_stratified_sample_by_key(spark):
    from naive_query_engine_spark.queries import t

    from .conftest import SF_ORACLE

    o = t(spark, SF_ORACLE, "orders")
    frac = {"F": 0.5, "O": 0.1, "P": 1.0}
    s = o.sampleBy("o_orderstatus", frac, seed=7)
    got = {r.o_orderstatus: r.n for r in
           s.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = {r.o_orderstatus: r.n for r in
           o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    # P fully kept; others roughly proportional (loose bounds — it's sampling)
    assert got["P"] == tot["P"]
    assert 0.3 * tot["F"] < got["F"] < 0.7 * tot["F"]
    assert got["O"] < 0.3 * tot["O"]
