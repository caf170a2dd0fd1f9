"""Incremental-maintenance probe for the persisted IVF index (r8).

The claim a living index must support at 100 TB: ingesting a small
arrival batch costs O(touched cells), not O(corpus) — an upsert must be
far cheaper than the from-scratch build.  This probe synthesizes sf0.1xN
perturbed embeddings (the kprop corpus: key-shifted + direction-perturbed
copies, no exact-duplicate cliques), builds the persisted index on all
but a small arrival slice at the grow-K production setting
(k_cells = 8*N, constant expected cell size), then times
`upsert_ivf_vector_index` of the slice.

Run: python tools/ivf_upsert_probe.py [N ...]   (default 10)
Prints one JSON line per scale: build_sec, upsert_sec, the ratio, batch
size, touched cells.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from naive_query_engine_spark import get_spark  # noqa: E402
from naive_query_engine_spark.operators.kmeans import (  # noqa: E402
    KMEANS_K,
    build_ivf_vector_index,
    upsert_ivf_vector_index,
)
from naive_query_engine_spark.queries import t  # noqa: E402

from ivf_kprop_probe import synthesize  # noqa: E402  (perturbed copies)

#: arrivals = vec_id % ARRIVAL_MOD == 0 (~0.5% of the corpus by default;
#: env SPARK_GRAFT_ARRIVAL_MOD overrides — larger mod = smaller batch =
#: smaller touched-cell footprint, which is what upsert cost tracks)
ARRIVAL_MOD = int(os.environ.get("SPARK_GRAFT_ARRIVAL_MOD", "200"))


def main() -> int:
    scales = [int(a) for a in sys.argv[1:]] or [10]
    spark = get_spark(app_name="nqes-ivf-upsert-probe")
    spark.sparkContext.setLogLevel("ERROR")
    table = "b_probe_ivf_maint"
    for n in scales:
        work = tempfile.mkdtemp(prefix=f"nqes-upsert{n}-")
        try:
            synthesize(spark, n, work)
            e = t(spark, work, "embeddings")
            base = e.filter(f"vec_id % {ARRIVAL_MOD} <> 0").select(
                "vec_id", "embedding"
            )
            batch = e.filter(f"vec_id % {ARRIVAL_MOD} = 0").select(
                "vec_id", "embedding"
            )
            k = KMEANS_K * n
            for sfx in ("", "_assign", "_centroids", "_conf"):
                spark.sql(f"DROP TABLE IF EXISTS {table}{sfx}")
            t0 = time.perf_counter()
            build_ivf_vector_index(spark, base, table, n_buckets=8, k_cells=k)
            build_sec = time.perf_counter() - t0
            t0 = time.perf_counter()
            r = upsert_ivf_vector_index(spark, table, batch)
            upsert_sec = time.perf_counter() - t0
            # compaction arm (VERDICT r8 #4): M more micro-batch upserts
            # accrete one file set each on the touched assign partitions;
            # time the threshold-crossing compaction and report the file
            # drop alongside the maintenance costs it amortizes against
            from naive_query_engine_spark.operators.kmeans import (
                _assign_partition_file_counts,
                compact_ivf_assign,
            )

            for m in range(1, 4):
                upsert_ivf_vector_index(
                    spark,
                    table,
                    e.filter(f"vec_id % {ARRIVAL_MOD} = {m}").select(
                        "vec_id", "embedding"
                    ),
                    compact_threshold=None,
                )
            files_before = sum(
                _assign_partition_file_counts(spark, table).values()
            )
            t0 = time.perf_counter()
            c = compact_ivf_assign(spark, table, max_files_per_cell=1)
            compact_sec = time.perf_counter() - t0
            files_after = sum(
                _assign_partition_file_counts(spark, table).values()
            )
            print(
                json.dumps(
                    {
                        "scale_x": n,
                        "k_cells": k,
                        "n_base": base.count(),
                        "n_batch": r["n_arrivals"],
                        "touched_cells": len(r["touched_cells"]),
                        "build_sec": round(build_sec, 2),
                        "upsert_sec": round(upsert_sec, 2),
                        "upsert_over_build": round(upsert_sec / build_sec, 3),
                        "compacted_cells": len(c["compacted_cells"]),
                        "files_before_compact": files_before,
                        "files_after_compact": files_after,
                        "compact_sec": round(compact_sec, 2),
                        "compact_over_build": round(compact_sec / build_sec, 3),
                    }
                ),
                flush=True,
            )
        finally:
            for sfx in ("", "_assign", "_centroids", "_conf"):
                spark.sql(f"DROP TABLE IF EXISTS {table}{sfx}")
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
