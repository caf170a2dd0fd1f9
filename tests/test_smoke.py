"""Smoke tests: driver entry contract + NaiveDB API surface."""

from __future__ import annotations

import importlib.util
import os

from .conftest import SF_SMOKE


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


def test_naivedb_sql_roundtrip(spark):
    from naive_query_engine_spark import NaiveDB

    db = NaiveDB(spark)
    db.register_sf_dir(SF_SMOKE)
    out = db.run_sql(
        "SELECT c_custkey, c_name, c_acctbal + 100 AS bal "
        "FROM customer WHERE c_custkey < 9 ORDER BY c_custkey LIMIT 3 OFFSET 2"
    ).collect()
    assert [r.c_custkey for r in out] == [2, 3, 4]  # keys are 0-based in the corpus


def test_naivedb_dataframe_builder(spark):
    from pyspark.sql import functions as F

    from naive_query_engine_spark import NaiveDB

    db = NaiveDB(spark)
    db.register_sf_dir(SF_SMOKE)
    df = (
        db.table("customer")
        .filter(F.col("c_custkey") < 10)
        .join(db.table("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = sum(r.n for r in df.collect())
    assert total == 10


def test_memory_and_empty_tables(spark):
    from naive_query_engine_spark import NaiveDB

    db = NaiveDB(spark)
    db.create_memory_table("mem", [(1, "a"), (2, "b")], "id long, name string")
    assert db.run_sql("SELECT count(*) AS n FROM mem").collect()[0].n == 2
    db.create_empty_table("emp", "state long, id long, first_name string")
    assert db.run_sql("SELECT * FROM emp").count() == 0
