"""Streaming incremental-dedup probe at 10× (VERDICT r4 #8).

``tests/test_streaming.py`` proves micro-batch == batch equivalence at
smoke scale; this probe repeats the production loop on the synthesized
10× corpus to show the O(|batch|) claim holds when the INDEX is 10×:

1. synthesize documents ×N (key-shifted copies, N files),
2. build the persistent bucketed shingle index once (timed — the
   pay-once write-side shuffle),
3. stream the deterministic "new batch" slice (doc_id % 10 == 7) as
   micro-batches of one file each, each probing the static index
   (timed per batch — the steady-state ingest cost),
4. assert the union over micro-batches equals the batch
   ``dedup_incremental`` result on the same corpus, tuple-for-tuple.

Prints one JSON line for BASELINE.md.

Run: python tools/stream_probe.py [N]   (default 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from naive_query_engine_spark import get_spark  # noqa: E402
from naive_query_engine_spark.queries import QUERIES, t  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
INDEX_TABLE = "b_stream_probe_idx"


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="nqes-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from naive_query_engine_spark.operators.dedup import (
        NEW_BATCH_MOD,
        NEW_BATCH_REM,
        incremental_pairs,
        shingle_rows,
        write_shingle_index,
    )

    work = tempfile.mkdtemp(prefix=f"nqes-stream{n_copies}-")
    try:
        base = t(spark, BASE_SF, "documents")
        span = base.agg(F.max("doc_id")).collect()[0][0] + 1
        copies = None
        for i in range(n_copies):
            c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * span))
            copies = c if copies is None else copies.unionAll(c)
        copies.repartition(n_copies).write.mode("overwrite").parquet(
            f"{work}/documents.parquet"
        )
        d = spark.read.parquet(f"{work}/documents.parquet")
        n_docs = d.count()

        t0 = time.perf_counter()
        write_shingle_index(d, INDEX_TABLE, n_buckets=32)
        index_build_sec = round(time.perf_counter() - t0, 2)
        index = spark.table(INDEX_TABLE)
        index_postings = index.count()

        arrivals = f"{work}/arrivals"
        d.filter(d.doc_id % NEW_BATCH_MOD == NEW_BATCH_REM).repartition(
            8
        ).write.parquet(arrivals)

        got: set = set()
        batch_secs: list[float] = []

        def probe_batch(batch_df, _bid):
            b0 = time.perf_counter()
            sh_batch = shingle_rows(batch_df).join(
                index.select("g").distinct(), "g", "left_semi"
            )
            got.update(
                tuple(r) for r in incremental_pairs(index, sh_batch).collect()
            )
            batch_secs.append(round(time.perf_counter() - b0, 2))

        q = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(arrivals)
            .writeStream.foreachBatch(probe_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1200)

        want = {
            tuple(r) for r in QUERIES["dedup_incremental"].fn(spark, work).collect()
        }
        print(
            json.dumps(
                {
                    "scale_x": n_copies,
                    "n_docs": n_docs,
                    "index_postings": index_postings,
                    "index_build_sec": index_build_sec,
                    "n_micro_batches": len(batch_secs),
                    "batch_secs": batch_secs,
                    "stream_pairs": len(got),
                    "batch_pairs": len(want),
                    "stream_equals_batch": got == want,
                }
            )
        )
        assert got == want, "stream/batch divergence"
        assert got, "vacuous probe"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {INDEX_TABLE}")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
