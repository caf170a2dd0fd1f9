"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT available in this environment, so
the decode kernels are STUBS (clearly marked).  What IS real and tested is
the Spark-side shape of a multimodal pipeline at scale:

- payloads as ``binary`` columns riding next to typed metadata,
- Arrow-batched ``mapInPandas`` decode/feature-extract stages with explicit
  output schemas (the exact signature a real decoder drops into),
- partition-count control so one huge payload batch can't OOM an executor.

``fake_decode_meta`` is a deterministic stand-in (pure arithmetic on byte
length) so the pipeline is end-to-end hash-checkable against a SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query, t

DECODE_SCHEMA = "doc_id long, n_bytes long, width long, height long, n_frames long"


def attach_payload(d: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + media-type column.
    On a real corpus the payload would come from the source (e.g. parquet
    ``binary`` column or file refs resolved by a fetch stage)."""
    return d.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def decode_image(payload: bytes) -> dict:
    """STUB — real implementation needs an image codec (PIL/opencv), not
    available in this container.  Signature and call-site plumbing are the
    real deliverable; swap the body for the codec call in production."""
    raise NotImplementedError("image decode requires a codec library (stubbed in this env)")


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic decode stand-in: (n_bytes, width, height, n_frames)."""
    n = len(payload)
    return n, 16 + n % 640, 16 + (n * 7) % 480, 1 + n % 30


def make_decode_meta_map(decode=None):
    """Build the mapInPandas kernel: payload bytes → typed metadata
    (Arrow-batched).  This is exactly where a real codec would run, one
    executor-side batch at a time, never materializing the whole corpus.

    Returned as a closure over ``decode`` so it cloudpickles BY VALUE —
    executors never need this package on their python path (the driver
    harness may run from an arbitrary cwd)."""

    if decode is None:
        # inline copy of fake_decode_meta: a local def pickles by value,
        # while referencing the module-level function would not
        def decode(payload):
            n = len(payload)
            return n, 16 + n % 640, 16 + (n * 7) % 480, 1 + n % 30

    def decode_meta_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]),
                    "height": meta.map(lambda m: m[2]),
                    "n_frames": meta.map(lambda m: m[3]),
                }
            )

    return decode_meta_map


@query(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)            AS n_bytes,
           CAST(16 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
           CAST(16 + (octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
           CAST(1 + octet_length(encode(text)) % 30 AS BIGINT)   AS n_frames
    FROM documents
    """,
    tags=("multimodal", "pipeline", "pandas-udf"),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → metadata via Arrow-batched mapInPandas (decode step
    stubbed deterministically; see module docstring)."""
    d = attach_payload(t(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(make_decode_meta_map(), DECODE_SCHEMA)
