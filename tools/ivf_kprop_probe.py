"""K-proportional-to-n probe for ivf_mutual_knn_edges (BASELINE r7 row).

Synthesizes embeddings at sf0.1 x N (key-shifted copies, N files) and
times the per-IVF-cell mutual-kNN edge build with k_cells = KMEANS_K*N
(constant expected cell size -> the linear production path) plus the
modularity overlay on that substrate.  min-of-2 warm per tier.
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
from naive_query_engine_spark.operators.kmeans import (  # noqa: E402
    KMEANS_K,
    ivf_mutual_knn_edges,
)
from naive_query_engine_spark.operators.clustering import (  # noqa: E402
    _modularity_overlay,
)
from naive_query_engine_spark.queries import t  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"


def synthesize(spark, n_copies: int, out_dir: str) -> None:
    base = t(spark, BASE_SF, "embeddings")
    span = base.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = None
    for i in range(n_copies):
        c = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * span))
        copies = c if copies is None else copies.unionAll(c)
    copies.repartition(n_copies).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark(app_name="nqes-ivf-kprop-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in scales:
        work = tempfile.mkdtemp(prefix=f"nqes-kprop{n}-")
        try:
            synthesize(spark, n, work)
            k = KMEANS_K * n
            res = {"scale_x": n, "k_cells": k}
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                ivf_mutual_knn_edges(spark, work, k_cells=k).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            res["edges_build_sec"] = round(best, 2)
            lab = t(spark, work, "embeddings").select("vec_id", "label")
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _modularity_overlay(
                    lab, ivf_mutual_knn_edges(spark, work, k_cells=k)
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            res["modularity_ivf_sec"] = round(best, 2)
            print(json.dumps(res), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
