"""Dataset-quality operators: column profiling and deterministic splits.

- **profiling** — per-column null/distinct/min/max in ONE pass over the
  table (a single aggregation with N×4 expressions; never N separate
  scans).
- **train/test split** — content-hash bucketing (md5 of the key), NOT
  rand(): deterministic under retries, stable across runs and engines, and
  leak-proof (the same key always lands in the same split even when the
  dataset is re-ingested).  The md5-digit bucket is portable to the DuckDB
  oracle — engine hash() builtins are not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query, t

SPLIT_BUCKETS = 16
TRAIN_BUCKETS = 13  # 13/16 ≈ 81% train


def hash_bucket(key: Column, buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket 0..15 from the first md5 hex digit of the key."""
    assert buckets == 16, "portable variant uses one hex digit"
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 1), 16, 10).cast("int")


@query(
    "dataset_train_test_split",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN strpos('0123456789abcdef',
                              SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                       < {TRAIN_BUCKETS}
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM tagged GROUP BY split
    """,
    tags=("pipeline", "split", "quality"),
)
def dataset_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash train/test split summary (~81/19).  Per-row assignment
    is ``hash_bucket(doc_id) < TRAIN_BUCKETS`` — reproducible everywhere."""
    d = t(spark, sf_dir, "documents")
    split = F.when(hash_bucket(F.col("doc_id")) < TRAIN_BUCKETS, "train").otherwise("test")
    return (
        d.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@query(
    "profile_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)      AS distinct_custkey,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)  AS distinct_status,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_date,
           CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_date
    FROM orders
    """,
    tags=("pipeline", "quality", "profiling"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile of the orders table: row count, null
    counts, distinct cardinalities, value ranges.  A single aggregation —
    the N-columns-one-scan shape that matters when the table is 100 TB."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("int")).cast("long").alias("null_custkey"),
        F.countDistinct("o_custkey").cast("long").alias("distinct_custkey"),
        F.countDistinct("o_orderstatus").cast("long").alias("distinct_status"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min(F.col("o_orderdate").cast("date")).cast("string").alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).cast("string").alias("max_date"),
    )


@query(
    "profile_documents_by_source",
    oracle=r"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(LENGTH(regexp_split_to_array(LOWER(TRIM(text)), '\s+')))
             AS BIGINT) AS total_tokens,
           CAST(SUM(LENGTH(regexp_split_to_array(LOWER(TRIM(text)), '\s+')))
             AS DOUBLE) / COUNT(*) AS avg_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM documents
    GROUP BY source
    """,
    tags=("pipeline", "quality", "profiling", "text"),
)
def profile_documents_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile — the first report a data-curation run
    produces: document counts, char/token volume, language spread, id
    ranges per ingest source.  One aggregation pass; the token count is
    an exact integer sum and avg_tokens a single double division (no
    float summation)."""
    from .text import token_count

    d = t(spark, sf_dir, "documents")
    return (
        d.select("source", "doc_id", "n_chars", "lang", token_count(F.col("text")).alias("tk"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("tk").alias("total_tokens"),
            (F.sum("tk").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )
