"""Full driver simulation: run EVERY registered query the way the round
driver does and compare with the DuckDB oracle.

The driver imports ``__spark_entry__.py`` by path, builds its own bare
SparkSession (none of our tuned conf), runs each ``queries()`` entry at
sf0.01 and compares with ``oracle_sql()`` (columns sorted by name, rows
sorted, values hashed).  This script reproduces that from a NEUTRAL cwd so
conf-dependent or pickling-dependent failures surface before the round
gate does.

Usage (cwd does not matter; /tmp is the honest choice):

    cd /tmp && python /root/repo/tools/driver_sim.py [--sf /root/testdata/sf0.01] [names...]

Prints one PASS/FAIL line per query and a final tally; exit code 1 on any
failure.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

ENTRY = "/root/repo/__spark_entry__.py"
sys.path.insert(0, os.path.dirname(ENTRY))
from naive_query_engine_spark.sources import TPCH_TABLES as TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: v.hex()
                if isinstance(v, (bytes, bytearray))
                else ("<NULL>" if v is None else str(v))
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="subset of query names (default: all)")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location("spark_entry", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    names = args.names or sorted(queries)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, args.sf).toPandas()
            if name not in oracles:
                status = f"PASS (rows-only, {len(spark_pdf)} rows)"
                n_pass += 1
            else:
                oracle_pdf = con.execute(oracles[name]).fetchdf()
                if len(spark_pdf) != len(oracle_pdf):
                    raise AssertionError(
                        f"rows {len(spark_pdf)} vs {len(oracle_pdf)}"
                    )
                if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
                    raise AssertionError(
                        f"cols {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
                    )
                a, b = normalize(spark_pdf), normalize(oracle_pdf)
                # the driver compares schemas too: dtype KINDS must agree
                for c in a.columns:
                    ka, kb = a[c].dtype.kind, b[c].dtype.kind
                    if ka != kb and not {ka, kb} <= {"i", "u"}:
                        raise AssertionError(
                            f"{c}: dtype kind {a[c].dtype} (spark) vs {b[c].dtype} (oracle)"
                        )
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True, obj=name
                )
                status = f"PASS ({len(spark_pdf)} rows)"
                n_pass += 1
        except Exception as exc:  # noqa: BLE001 — report and continue
            status = f"FAIL: {type(exc).__name__}: {str(exc)[:200]}"
            n_fail += 1
        print(f"{name:40s} {status}  [{time.time() - t0:.1f}s]", flush=True)

    print(f"\n{n_pass} PASS / {n_fail} FAIL of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
