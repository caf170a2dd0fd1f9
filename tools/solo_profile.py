"""Solo-profile named queries: min-of-N noop-sink timing in one session.

Usage: python tools/solo_profile.py <query> [<query> ...] [--runs N]

Fresh-session solo cost per query (guide §1.4): each named query runs
N times against the noop sink in declaration order; prints per-query
all-runs and the min.  Unlike bench.py this is a diagnostic — order and
session state are the caller's problem.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from naive_query_engine_spark import get_spark  # noqa: E402
from naive_query_engine_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    spark = get_spark(app_name="nqes-solo-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # one warmup action so the first target doesn't pay session init
    QUERIES["agg_ungrouped"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args:
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"solo:{name}:run{i}")
            t0 = time.time()
            QUERIES[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
        print(
            f"{name}: min={min(times):.2f} runs="
            + ",".join(f"{x:.2f}" for x in times),
            flush=True,
        )


if __name__ == "__main__":
    main()
