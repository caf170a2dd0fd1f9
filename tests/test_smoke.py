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


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV source e2e: write → register via NaiveDB (schema inference) →
    SQL query.  The reference's CsvTable infers from 3 rows (csv.rs:37);
    Spark samples the whole file."""
    import csv as csvmod

    from naive_query_engine_spark import NaiveDB

    p = tmp_path / "people.csv"
    with open(p, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["id", "name", "age", "score"])
        for row in [(1, "veeupup", 23, 60.0), (2, "alex", 20, 90.1), (4, "lynne", 18, 99.99)]:
            w.writerow(row)
    db = NaiveDB(spark)
    df = db.create_csv_table("people", str(p))
    assert dict(df.dtypes) == {"id": "int", "name": "string", "age": "int", "score": "double"}
    out = db.run_sql("SELECT name, age + 100 AS a FROM people WHERE id > 1 ORDER BY id").collect()
    assert [(r.name, r.a) for r in out] == [("alex", 120), ("lynne", 118)]


def test_json_source_roundtrip(spark, tmp_path):
    import json

    from naive_query_engine_spark import NaiveDB

    p = tmp_path / "rows.jsonl"
    with open(p, "w") as f:
        for r in [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]:
            f.write(json.dumps(r) + "\n")
    db = NaiveDB(spark)
    db.create_json_table("j", str(p))
    assert db.run_sql("SELECT sum(k) AS s FROM j").collect()[0].s == 3


def test_write_table_sink(spark, tmp_path):
    from naive_query_engine_spark.queries import t
    from naive_query_engine_spark.sources import write_table

    df = t(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "nations_out")
    write_table(df, out, partition_by=["n_regionkey"])
    back = spark.read.parquet(out)
    assert back.count() == 25
    assert set(back.columns) == {"n_nationkey", "n_name", "n_regionkey"}


def test_compact_table(spark, tmp_path):
    from naive_query_engine_spark.queries import t
    from naive_query_engine_spark.sources import compact_table

    out = str(tmp_path / "frag")
    t(spark, SF_SMOKE, "orders").repartition(16).write.parquet(out)
    import glob

    assert len(glob.glob(out + "/*.parquet")) == 16
    before = spark.read.parquet(out).count()
    compact_table(spark, out, 2)
    assert len(glob.glob(out + "/*.parquet")) == 2
    assert spark.read.parquet(out).count() == before


def test_dynamic_partition_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    from naive_query_engine_spark.queries import t
    from naive_query_engine_spark.sources import overwrite_partitions, write_table

    out = str(tmp_path / "by_status")
    orders = t(spark, SF_SMOKE, "orders")
    write_table(orders, out, partition_by=["o_orderstatus"])
    total = spark.read.parquet(out).count()
    n_f = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F").count()

    # reload ONLY the F partition with a modified copy; O/P must survive
    new_f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .limit(10)
    )
    overwrite_partitions(new_f, out, ["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.filter(F.col("o_orderstatus") == "F").count() == 10
    assert back.count() == total - n_f + 10


def test_merge_upsert(spark, tmp_path):
    from pyspark.sql import functions as F

    from naive_query_engine_spark.queries import t
    from naive_query_engine_spark.sources import merge_upsert

    out = str(tmp_path / "cust")
    t(spark, SF_SMOKE, "customer").write.parquet(out)
    before = spark.read.parquet(out)
    n = before.count()
    updates = (
        before.filter(F.col("c_custkey") < 5)
        .withColumn("c_acctbal", F.lit(9999.0))
        .unionByName(
            spark.createDataFrame(
                [(100000, "Customer#new", 0, 1.0, "BUILDING")], before.schema
            )
        )
    )
    merge_upsert(spark, out, updates, ["c_custkey"])
    after = spark.read.parquet(out)
    assert after.count() == n + 1  # 5 replaced in place, 1 inserted
    assert after.filter(F.col("c_custkey") < 5).agg(
        F.min("c_acctbal"), F.max("c_acctbal")
    ).collect()[0] == (9999.0, 9999.0)


def test_kafka_payload_parse_path(spark):
    from naive_query_engine_spark import streaming as st

    raw = spark.createDataFrame(
        [('{"event_id": 7, "ts": "2024-01-01T00:00:07", "user_id": 3, '
          '"event_type": "click", "value": 1.5, "props": "{}"}',)],
        "value string",
    )
    row = st.parse_event_payload(raw).collect()[0]
    assert (row.event_id, row.user_id, row.event_type, row.value) == (7, 3, "click", 1.5)


def test_print_result_and_drop_table(spark, capsys):
    from naive_query_engine_spark import NaiveDB, print_result

    db = NaiveDB(spark)
    db.create_memory_table("pr_t", [(1, "x")], "id long, v string")
    print_result(db.run_sql("SELECT * FROM pr_t"))
    out = capsys.readouterr().out
    assert "id" in out and "x" in out
    db.drop_table("pr_t")
    assert "pr_t" not in db.table_names()
    import pytest as _pytest

    with _pytest.raises(Exception):
        db.run_sql("SELECT * FROM pr_t").collect()
