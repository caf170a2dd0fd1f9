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

from ..queries import floordiv_col, query, t  # noqa: E402

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


# ---------------------------------------------------------------------------
# salting PLANNER — the measurement step that decides the factors
# join_salted_skew then applies

SALT_TARGET_ROWS = 1000  #: target rows per (key, salt) task
SALT_MAX = 32  #: replication ceiling (dim-side blowup bound)
SALT_FP = 1_000_000  #: fixed-point scale for the share column


@query(
    "events_salting_plan",
    oracle=f"""
    WITH h AS (
      SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
    ),
    tot AS (SELECT SUM(n_events) AS n FROM h),
    plan AS (
      SELECT event_type, n_events,
             CASE WHEN (n_events + {SALT_TARGET_ROWS} - 1) // {SALT_TARGET_ROWS}
                       > {SALT_MAX} THEN {SALT_MAX}
                  ELSE (n_events + {SALT_TARGET_ROWS} - 1) // {SALT_TARGET_ROWS}
             END AS salt_factor
      FROM h
    )
    SELECT p.event_type,
           CAST(p.n_events AS BIGINT) AS n_events,
           CAST((p.n_events * {SALT_FP}) // t.n AS BIGINT) AS share_fp,
           CAST(p.salt_factor AS BIGINT) AS salt_factor,
           CAST((p.n_events + p.salt_factor - 1) // p.salt_factor AS BIGINT)
             AS rows_per_salt
    FROM plan p CROSS JOIN tot t
    ORDER BY p.n_events DESC, p.event_type
    """,
    tags=("skew", "join", "pipeline", "planner"),
)
def events_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting PLANNER: one cheap key histogram (the measurement a
    skew-mitigation pass runs BEFORE deciding anything), then per key
    the replication factor ``ceil(n / {SALT_TARGET_ROWS})`` capped at
    {SALT_MAX} and the resulting rows-per-salt-task — the exact inputs
    `join_salted_skew` consumes, and what AQE's skew-join split computes
    internally from shuffle statistics.  Keys whose factor reads 1 are
    certified non-hot (salting them would only add dim-side blowup);
    the capped ones surface where the target-rows knob, not the cap,
    should move.  All integer ceil-division arithmetic — hash-stable.

    Scale shape: one grouped count (map-side partial, key-domain
    output) + a broadcast total; nothing row-bounded after the scan."""
    ev = t(spark, sf_dir, "events")
    h = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    tot = h.agg(F.sum("n_events").alias("n"))
    factor = F.least(
        floordiv_col(
            F.col("n_events") + F.lit(SALT_TARGET_ROWS - 1),
            F.lit(SALT_TARGET_ROWS),
        ),
        F.lit(SALT_MAX).cast("long"),
    )
    return (
        h.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr(f"(n_events * {SALT_FP}) DIV n").cast("long").alias("share_fp"),
            factor.cast("long").alias("salt_factor"),
        )
        .select(
            "event_type",
            "n_events",
            "share_fp",
            "salt_factor",
            floordiv_col(
                F.col("n_events") + F.col("salt_factor") - 1, F.col("salt_factor")
            )
            .cast("long")
            .alias("rows_per_salt"),
        )
        .orderBy(F.col("n_events").desc(), "event_type")
    )
