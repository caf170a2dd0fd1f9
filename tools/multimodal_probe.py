"""Multimodal kernel probe with PRE-MATERIALIZED payloads (VERDICT r6 #7).

The VAD/PCM operators fuse synthetic-payload build + Arrow kernel into
one map-only pass; at probe tiers the per-sample hex BUILD dominates
wall-clock (it exists only because this container has no real audio
corpus), so the 30x/100x rows were measuring the generator, not the
kernel a production deployment runs on parquet binary columns.

This probe separates them per tier N:

  build  — replicate doc_ids Nx, synthesize payload bytes JVM-side,
           WRITE them to parquet once (timed, reported separately)
  kernel — time the mapInPandas kernel reading the materialized
           parquet binary column (min-of-2) — the number that answers
           "does the production shape scale linearly"

Output: one JSON line per tier with the build-vs-kernel split.

Run: python tools/multimodal_probe.py [N ...]   (default 10 100)
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
from naive_query_engine_spark.operators.multimodal import (  # noqa: E402
    make_pcm_payload,
    make_vad_payload,
    pcm_energy_kernel,
    vad_segments_kernel,
)
from naive_query_engine_spark.queries import t  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

PROBES = {
    # name -> (payload builder over (doc_id, n), n_samples expr base,
    #          kernel factory, kernel output schema)
    "vad": (
        make_vad_payload,
        1024,
        vad_segments_kernel,
        "doc_id long, n_frames long, n_speech_frames long, "
        "n_segments long, longest_segment long, speech_ppm long",
    ),
    "pcm": (
        make_pcm_payload,
        512,
        pcm_energy_kernel,
        "doc_id long, frame_idx long, n_samples long, energy long",
    ),
}


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark(app_name="nqes-multimodal-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base_docs = t(spark, BASE_SF, "documents").select("doc_id")
    span = base_docs.agg(F.max("doc_id")).collect()[0][0] + 1

    for n_copies in scales:
        docs = None
        for i in range(n_copies):
            c = base_docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * span))
            docs = c if docs is None else docs.unionAll(c)
        docs = docs.repartition(max(n_copies, 32))

        out = {"metric": "multimodal_kernel_probe", "scale": n_copies}
        for name, (builder, nbase, kernel, schema) in PROBES.items():
            work = tempfile.mkdtemp(prefix=f"nqes-mmprobe-{name}-{n_copies}-")
            try:
                n = (F.lit(nbase) + F.col("doc_id") % nbase).cast("long")
                t0 = time.perf_counter()
                docs.select(
                    "doc_id", builder(F.col("doc_id"), n).alias("payload")
                ).write.mode("overwrite").parquet(f"{work}/payloads.parquet")
                build_sec = round(time.perf_counter() - t0, 2)

                payloads = spark.read.parquet(f"{work}/payloads.parquet")
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    payloads.mapInPandas(kernel(), schema).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                out[name] = {
                    "build_write_sec": build_sec,
                    "kernel_sec": round(best, 2),
                    "n_docs": n_copies * 5000,
                }
            finally:
                shutil.rmtree(work, ignore_errors=True)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
