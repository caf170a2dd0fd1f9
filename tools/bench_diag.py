"""Diagnose the r6 bench-artifact risers (VERDICT r6 #1).

BENCH_r06.json read `similarity_cosine_pairs` at 2.49x and
`multimodal_audio_vad_segments` at 2.18x their baselines inside the
44-query min-of-3 session, while solo min-of-5 runs read both at/below
baseline.  Hypothesis: the bench session accumulates persisted frames
(shingle indexes, edge tables, IVF tables — MEMORY_AND_DISK) across 44
queries, and the numpy-heavy Arrow kernels are the first to pay for the
executor memory pressure.

This script runs the EXACT bench sequence (same order, same min-of-3)
twice in separate sessions:

  mode=asis     — bench.py behavior verbatim
  mode=hygiene  — spark.catalog.clearCache() + unpersist of every
                  tracked RDD after each query

and reports the two target queries min-of-5 at their in-sequence
positions, plus the established-subtotal of each run so host drift
between the two sessions can be normalized out.

Usage:  python tools/bench_diag.py [asis|hygiene|both]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from naive_query_engine_spark import get_spark  # noqa: E402
from naive_query_engine_spark.queries import QUERIES  # noqa: E402

from bench import BASELINES, BENCH_QUERIES, ESTABLISHED, N_RUNS  # noqa: E402

TARGETS = {"similarity_cosine_pairs", "multimodal_audio_vad_segments"}
TARGET_RUNS = 5


def clear_session_state(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    for rdd_id in list(spark.sparkContext._jsc.getPersistentRDDs().keySet()):
        try:
            jsc.unpersistRDD(rdd_id, True)
        except Exception:
            pass


def run_mode(mode: str, sf_dir: str) -> dict:
    spark = get_spark(app_name=f"nqes-bench-diag-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["agg_ungrouped"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        n = TARGET_RUNS if name in TARGETS else N_RUNS
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        if mode == "hygiene":
            clear_session_state(spark)

    est = [q for q in BENCH_QUERIES if q in ESTABLISHED]
    ratio = sum(timings[q] for q in est) / sum(BASELINES[q] for q in est)
    out = {
        "mode": mode,
        "established_subtotal_ratio": round(ratio, 3),
        "targets": {
            t: {
                "measured": timings[t],
                "baseline": BASELINES[t],
                "raw_ratio": round(timings[t] / BASELINES[t], 3),
                "normalized_ratio": round(timings[t] / BASELINES[t] / ratio, 3),
            }
            for t in sorted(TARGETS)
        },
        "total": round(sum(timings.values()), 3),
        "timings": timings,
    }
    spark.stop()
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    modes = ["asis", "hygiene"] if which == "both" else [which]
    for m in modes:
        print(json.dumps(run_mode(m, sf_dir)))


if __name__ == "__main__":
    main()
