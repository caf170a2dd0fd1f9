"""Salted LSH bucket self-join: identical pairs, split hot buckets.

Sign-bit buckets on natural embeddings are skewed — correlated dimensions
pile most vectors into a few sign patterns, so the bucket self-join gets
one giant task per hot bucket.  ``lsh_bucket_candidates`` salts the probe
side and replicates the build side; these tests pin

1. result equality with the unsalted join on a corpus where 80% of the
   vectors share ONE bucket (the skew case the salt exists for);
2. the plan actually joining on the salt column (the skew-splitting isn't
   optimized away).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators.similarity import lsh_bucket_candidates


def _hot_bucket_frame(spark):
    # 80 vectors in bucket "111", 20 spread over others
    rows = [(i, "111") for i in range(80)]
    rows += [(100 + i, f"{i:03b}") for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, bucket string")


def test_salted_pairs_equal_unsalted(spark):
    buck = _hot_bucket_frame(spark)
    salted = {
        (r.vec_a, r.vec_b) for r in lsh_bucket_candidates(buck, n_salts=4).collect()
    }
    unsalted = {
        (r.va, r.vb)
        for r in buck.alias("x")
        .join(
            buck.alias("y"),
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("va"), F.col("y.vec_id").alias("vb"))
        .collect()
    }
    # hot bucket alone contributes C(80,2) = 3160 pairs; salted must agree
    assert len(unsalted) >= 80 * 79 // 2
    assert salted == unsalted


def test_salt_survives_into_the_plan(spark):
    buck = _hot_bucket_frame(spark)
    plan = lsh_bucket_candidates(buck)._jdf.queryExecution().analyzed().toString()
    assert "_salt" in plan, plan[:2000]
