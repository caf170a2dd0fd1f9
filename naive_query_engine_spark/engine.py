"""NaiveDB-compatible engine shell over SparkSession.

The reference's primary entry point is ``NaiveDB::run_sql`` (src/db.rs:24-37):
parse → logical plan → (empty) optimizer → physical plan → pull-execute.
Here stages 2-5 are Catalyst; this class is the API shell — catalog
registration + ``run_sql`` + the DataFrame-builder handle — exactly the
part of the reference that is NOT the execution engine.

>>> db = NaiveDB()
>>> db.create_csv_table("t1", "data/test_data.csv")
>>> db.run_sql("select id, name, age + 100 from t1 where id < 9").show()

The secondary surface, the DataFrame builder (src/logical_plan/dataframe.rs),
maps 1:1 onto the PySpark DataFrame returned by :meth:`table`.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from . import sources
from .session import get_spark


class NaiveDB:
    """Catalog + SQL runner (reference: src/db.rs:13-37, src/catalog.rs:20-80)."""

    def __init__(self, spark: SparkSession | None = None) -> None:
        self.spark = spark or get_spark()
        self._tables: dict[str, DataFrame] = {}

    # -- catalog registration (reference: Catalog::add_*_table, catalog.rs:24-60)

    def create_csv_table(
        self,
        name: str,
        path: str,
        header: bool = True,
        delimiter: str = ",",
        infer_schema: bool = True,
        schema: StructType | str | None = None,
    ) -> DataFrame:
        df = sources.read_csv(self.spark, path, header, delimiter, infer_schema, schema)
        return self._register(name, df)

    def create_parquet_table(self, name: str, path: str) -> DataFrame:
        df = sources.read_parquet(self.spark, path)
        return self._register(name, df)

    def create_json_table(self, name: str, path: str, schema=None) -> DataFrame:
        df = sources.read_json(self.spark, path, schema)
        return self._register(name, df)

    def create_memory_table(self, name: str, data: Iterable, schema=None) -> DataFrame:
        df = sources.memory_table(self.spark, data, schema)
        return self._register(name, df)

    def create_empty_table(self, name: str, schema) -> DataFrame:
        df = sources.empty_table(self.spark, schema)
        return self._register(name, df)

    def register_view(self, name: str, df: DataFrame) -> DataFrame:
        return self._register(name, df)

    def register_sf_dir(self, sf_dir: str) -> None:
        """Register the whole TESTDATA corpus (region..embeddings) at once."""
        for t in sources.TPCH_TABLES:
            self._register(t, sources.read_corpus_table(self.spark, sf_dir, t))

    def _register(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name)
        self._tables[name] = df
        return df

    # -- lookup (reference: Catalog::get_table/get_table_df, catalog.rs:62-80)

    def table(self, name: str) -> DataFrame:
        """DataFrame-builder handle; chain .select/.filter/.join/... directly."""
        if name in self._tables:
            return self._tables[name]
        return self.spark.table(name)

    def frame(self, name: str):
        """Reference-API builder handle (project/filter/aggregate/limit/
        offset/join — src/logical_plan/dataframe.rs surface); see
        :class:`naive_query_engine_spark.dataframe.NaiveFrame`."""
        from .dataframe import NaiveFrame

        return NaiveFrame(self.table(name))

    def table_names(self) -> list[str]:
        return sorted(self._tables)

    # -- SQL path (reference: NaiveDB::run_sql, db.rs:24-37)

    def run_sql(self, sql: str) -> DataFrame:
        """Parse/plan/optimize via Catalyst; lazy — call .collect()/.show()."""
        return self.spark.sql(sql)

    def drop_table(self, name: str) -> None:
        """Remove a registered view (superset of the reference's catalog,
        which has no removal)."""
        self.spark.catalog.dropTempView(name)
        self._tables.pop(name, None)

    def explain_sql(self, sql: str, mode: str = "formatted") -> str:
        """Physical-plan text for plan assertions (pushdown, broadcast, codegen)."""
        return self.spark.sql(sql)._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )


def print_result(df: DataFrame, n: int = 100) -> None:
    """Pretty-print query results — the reference's ``print_result``
    (src/utils.rs:11-13, arrow::util::pretty) as a module-level function,
    so ``from naive_query_engine_spark import print_result`` ports 1:1."""
    df.show(n, truncate=False)
