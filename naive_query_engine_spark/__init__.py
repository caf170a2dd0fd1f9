"""naive_query_engine_spark — PySpark-native analytics engine.

A brand-new, Spark-first engine with the query/data-processing capabilities
of the reference Rust engine Veeupup/naive-query-engine (see SURVEY.md),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Entry points:
- :class:`NaiveDB` — catalog + ``run_sql`` (reference src/db.rs surface)
- :func:`get_spark` — tuned SparkSession factory
- ``queries.QUERIES`` — the named-query registry the driver harness runs
"""

from .dataframe import NaiveFrame
from .engine import NaiveDB, print_result
from .session import get_spark

__all__ = ["NaiveDB", "NaiveFrame", "get_spark", "print_result"]
__version__ = "0.1.0"
