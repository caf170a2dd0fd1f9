"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in our session defaults); the
explicit salting here is for the cases AQE can't fix — e.g. a single hot
key in a shuffle join whose build side must replicate, or a groupBy with
one dominant group.  Pattern:

- join:  append ``salt = rand_bucket(row) % S`` to the skewed (big) side;
  EXPLODE the other side S× (one copy per salt value); join on
  (key, salt).  Each hot-key partition shrinks by ~S.
- aggregation: two-phase — aggregate on (key, salt) first (spreads the hot
  key over S reducers), then re-aggregate on key.

Salting must never change results: ``tests/test_skew.py`` asserts
salted == plain for both shapes.  The salt is a deterministic hash of row
content (never ``rand()``, never ``monotonically_increasing_id`` — the
latter depends on partition layout and changes under AQE re-planning), so
retried tasks produce identical rows — non-negotiable for exactly-once
semantics under task retry at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(unique_col: Column, n_salts: int) -> Column:
    """Stable bucket in [0, n_salts) from a unique column (retry-safe)."""
    return F.pmod(F.hash(unique_col), F.lit(n_salts))


def _content_salt_src(df: DataFrame) -> Column:
    """Default salt source: hash of every hashable column.  MapType is
    excluded (Spark's hash() rejects maps); if nothing is hashable the
    caller must pass an explicit salt column.

    Tradeoff (documented, deliberate): exact-duplicate rows share a salt
    bucket, so a hot key whose rows are ALL identical is not spread —
    pass ``salt_on`` with a unique column for that shape.  In exchange
    the salt is stable under task retry and AQE re-planning, which
    ``monotonically_increasing_id`` is not (SPARK-23207-class hazards)."""
    cols = [F.col(c) for c, t in df.dtypes if not t.startswith("map")]
    if not cols:
        raise ValueError("no hashable columns for default salt; pass salt_on")
    return F.hash(*cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str,
    n_salts: int = 8,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    n_salts×.  ``salt_on`` names a unique column on the big side; when
    omitted, the salt derives from a content hash (see
    ``_content_salt_src`` for the duplicate-row and MapType caveats)."""
    salt_src = F.col(salt_on) if salt_on else _content_salt_src(big)
    b = big.withColumn("_salt", deterministic_salt(salt_src, n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, (b[key] == s[small_key]) & (b["_salt"] == s["_salt"]), how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.  ``agg_exprs`` maps
    output column → one of sum/count/min/max (the re-aggregatable set;
    avg = sum/count composed by the caller).

    The default content-hash salt is deterministic under retry/AQE, but
    it does NOT spread a hot key whose rows are exact duplicates (they
    all hash to one bucket — e.g. a frame projected down to just the
    group key).  For that shape pass ``salt_on`` naming a unique or
    near-unique column; results are salt-invariant either way since
    phase 2 re-aggregates."""
    salt_src = F.col(salt_on) if salt_on else _content_salt_src(df)
    salted = df.withColumn("_salt", deterministic_salt(salt_src, n_salts))
    phase1 = salted.groupBy(key, "_salt").agg(
        *[
            (F.count(F.lit(1)) if how == "count" else getattr(F, how)(col)).alias(out)
            for out, (col, how) in agg_exprs.items()
        ]
    )
    merge = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    return phase1.groupBy(key).agg(
        *[
            getattr(F, merge[how])(out).alias(out)
            for out, (col, how) in agg_exprs.items()
        ]
    )


# ---------------------------------------------------------------------------
# registered query: the salted-join shape with a plain-SQL oracle

from pyspark.sql import SparkSession  # noqa: E402

from ..queries import query, t  # noqa: E402

SKEW_SALTS = 8


@query(
    "join_salted_skew",
    oracle="""
    WITH d AS (
      SELECT event_type, COUNT(*) AS n_events, MAX(FLOOR(value)) AS max_fv
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN FLOOR(e.value) * 2 >= d.max_fv THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_half_max
    FROM events e JOIN d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    tags=("join", "skew", "pipeline"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full salted-join pattern as a registered query: events (the big
    side — ``event_type`` has ~5 values, a textbook hot-key distribution)
    salted on the unique ``event_id``, the per-type stats dim replicated
    SKEW_SALTS×, joined on (key, salt).  The oracle is the PLAIN join —
    salting must be invisible in the result.

    At this SF AQE still broadcasts the replicated dim (it is tiny); the
    pattern is registered for the shape that matters at scale: a
    non-broadcastable build side against a hot probe key, where the
    (key, salt) composite spreads each hot key over SKEW_SALTS reducers
    that AQE's skew splitting cannot reach (it only splits the PROBE side;
    a replicated build row set is exactly what it can't synthesize).
    """
    e = t(spark, sf_dir, "events")
    dim = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.floor("value")).alias("max_fv"),
    )
    joined = salted_join(
        e, dim.withColumnRenamed("event_type", "d_type"),
        key="event_type", small_key="d_type",
        n_salts=SKEW_SALTS, salt_on="event_id",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(
            F.when(F.floor("value") * 2 >= F.col("max_fv"), 1).otherwise(0)
        ).cast("long").alias("n_above_half_max"),
    )
