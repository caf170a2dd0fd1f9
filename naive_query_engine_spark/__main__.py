"""Interactive/CLI SQL entry point.

    python -m naive_query_engine_spark "SELECT count(*) FROM lineitem"
    python -m naive_query_engine_spark --sf-dir /root/testdata/sf0.01 \\
        "SELECT l_returnflag, count(*) n FROM lineitem GROUP BY 1"

Registers the test corpus (or any --sf-dir) and runs the query through the
same NaiveDB.run_sql path the library exposes — the reference's
``main.rs`` experience for a Spark engine.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="naive_query_engine_spark")
    ap.add_argument("sql", help="SQL to run (corpus tables pre-registered)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--explain", action="store_true", help="print the physical plan too")
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    args = ap.parse_args(argv)

    from . import NaiveDB

    db = NaiveDB()
    db.spark.sparkContext.setLogLevel("ERROR")
    db.register_sf_dir(args.sf_dir)
    df = db.run_sql(args.sql)
    if args.explain:
        print(db.explain_sql(args.sql))
    df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
