"""Custom table source via the Python DataSource API (Spark 4).

The reference's extension point is the ``TableSource`` trait
(src/datasource/mod.rs:20-28): implement ``schema()`` + ``scan()`` and the
engine can read anything.  Spark's modern equivalent is
``pyspark.sql.datasource.DataSource``: declare a schema, emit
``InputPartition``s, and each partition's ``read()`` generator runs ON AN
EXECUTOR — the source is distributed from the first row, and Catalyst
prunes/pushes like any other relation.

``SyntheticEventsDataSource`` generates a deterministic event stream from
pure arithmetic on (partition, row) — a reproducible load generator for
tests/benchmarks with zero I/O (options: ``rows``, ``partitions``).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


class _Partition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil-div
        return [
            _Partition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _Partition):
        # deterministic per row id — identical output for any partitioning
        for i in range(partition.start, partition.end):
            yield (
                i,
                (i * 2654435761) % 97,  # Knuth-hash user spread
                _EVENT_TYPES[(i * 7) % len(_EVENT_TYPES)],
                round(((i * 31) % 10000) / 100.0, 2),
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
