"""Temporal join operators: as-of join and bounded range (interval) join.

Neither exists in the reference (SURVEY §2.3: "not present: ... range,
as-of") and neither is a single built-in in Spark SQL — these are the
classic "compose from existing DataFrame ops" custom operators:

- **as-of join** — implemented as UNION + partitioned window
  (last non-null right-row carried forward), NOT as an inequality join:
  one shuffle on the key, linear scan per partition, no fan-out.  This is
  the standard scale formulation (an inequality join would explode).
  The DuckDB oracle uses its native ``ASOF JOIN`` — an independent
  implementation agreeing on semantics.
- **range self-join** — time-bucketed equi-join: candidates only from the
  same or adjacent bucket (bounded fan-out ≈ events-per-window², never
  n² per key), then the exact predicate.  Same output as the naive
  inequality join the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import epoch_seconds, query, t

RANGE_WINDOW_SEC = 300  # range-join window: events within 5 minutes


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` on the same key.  Right (key, ts) pairs must be
    unique — pre-dedupe if not (see ``asof_events_orders``)."""
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_t"),
            F.lit(0).alias("_side"),
            *[F.col(c) for c in payload_cols],
        )
    )
    # align schemas: left carries nulls for payload, right nulls for left cols
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    left_cols = [c for c in left.columns]
    rt2 = rt
    for c in left_cols:
        if c != key and c not in rt.columns:
            rt2 = rt2.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    unioned = lt.select(key, "_t", "_side", *payload_cols, *[c for c in left_cols if c != key]).unionByName(
        rt2.select(key, "_t", "_side", *payload_cols, *[F.col(c) for c in left_cols if c != key])
    )
    # right rows sort before left rows at equal _t → "<=" semantics
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        key,
        "_t",
        "_side",
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in payload_cols],
        *[c for c in left_cols if c != key],
    )
    return filled.filter(F.col("_side") == 1).drop("_side", "_t")


@query(
    "asof_join_events_orders",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, r.o_orderkey, strftime(r.o_orderdate, '%Y-%m-%d') AS asof_date
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    tags=("join", "asof", "temporal"),
)
def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order at
    event time.  Right side deduped to unique (key, ts) with MAX(orderkey)
    as the deterministic tie-break in BOTH engines."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = asof_join(
        ev,
        o.withColumn("asof_date", F.date_format("o_orderdate", "yyyy-MM-dd")),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "asof_date"],
    )
    return joined.select("event_id", "user_id", "o_orderkey", "asof_date")


@query(
    "range_join_event_pairs",
    oracle=f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS secs_apart
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id > a.event_id
     AND abs(date_diff('second', a.ts, b.ts)) <= {RANGE_WINDOW_SEC}
    """,
    tags=("join", "range", "temporal"),
)
def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join: pairs of same-user events within ±5
    minutes, via time-bucketed candidates (same/adjacent bucket equi-join,
    bounded fan-out) + exact predicate.  ``secs_apart`` is an exact integer
    (epoch-second difference)."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", epoch_seconds("ts").alias("sec")
    )
    bucket = F.floor(F.col("sec") / RANGE_WINDOW_SEC)
    a = ev.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        F.col("sec").alias("sec_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bkt"),
    )
    b = ev.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        F.col("sec").alias("sec_b"),
        F.floor(F.col("sec") / RANGE_WINDOW_SEC).alias("bkt"),
    )
    return (
        a.join(b, (a.user_id == F.col("user_b")) & (a.bkt == b.bkt))
        .filter(
            (F.col("event_b") > F.col("event_a"))
            & (F.col("sec_b") >= F.col("sec_a") - RANGE_WINDOW_SEC)
            & (F.col("sec_b") <= F.col("sec_a") + RANGE_WINDOW_SEC)
        )
        .select(
            "event_a",
            "event_b",
            (F.col("sec_b") - F.col("sec_a")).cast("long").alias("secs_apart"),
        )
        .distinct()
    )


ASOF_TOLERANCE_DAYS = 30


@query(
    "asof_join_tolerance",
    oracle=f"""
    WITH r AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN date_diff('day', r.o_orderdate, CAST(e.ts AS DATE))
                     <= {ASOF_TOLERANCE_DAYS}
                THEN r.o_orderkey END AS o_orderkey,
           CASE WHEN date_diff('day', r.o_orderdate, CAST(e.ts AS DATE))
                     <= {ASOF_TOLERANCE_DAYS}
                THEN strftime(r.o_orderdate, '%Y-%m-%d') END AS asof_date
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    tags=("join", "asof", "temporal"),
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas ``merge_asof(tolerance=)``
    / kdb ``wj`` semantics): each event takes the user's most recent order
    at event time, but a match staler than {ASOF_TOLERANCE_DAYS} days is nulled out — stale
    state must not be carried forward indefinitely (feature freshness in
    training pipelines).  Same union+window machinery as ``asof_join``
    (one shuffle on the key, no inequality-join fan-out); the tolerance is
    a post-carry-forward predicate, free at scale.  Oracle: DuckDB's
    native ASOF LEFT JOIN with the same staleness CASE on top — an
    independent implementation of both the as-of and the bound.
    """
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = asof_join(
        ev,
        o.withColumn("asof_date", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .withColumn("o_date", F.col("o_orderdate")),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "asof_date", "o_date"],
    )
    fresh = F.datediff(F.to_date("ts"), F.col("o_date")) <= ASOF_TOLERANCE_DAYS
    return joined.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("o_orderkey")).alias("o_orderkey"),
        F.when(fresh, F.col("asof_date")).alias("asof_date"),
    )


#: PIT feature windows: trailing-activity horizon for the windowed
#: features (the corpus spans ~30 days, so 7d is a real sub-window at
#: every SF) and the fixed-point scale for the value sum (floor(v*1e6)
#: — exact BIGINT in both engines, summation order irrelevant)
PIT_WINDOW_DAYS = 7
PIT_VALUE_FP = 1_000_000


@query(
    "features_pit_backfill",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(p.event_id AS BIGINT) AS event_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST(COUNT(e.ts) AS BIGINT) AS lifetime_events,
           CAST(COUNT(e.ts) FILTER (
             WHERE e.ts >= p.ts - INTERVAL {PIT_WINDOW_DAYS} DAY) AS BIGINT)
             AS events_7d,
           CAST(COUNT(e.ts) FILTER (
             WHERE e.ts >= p.ts - INTERVAL {PIT_WINDOW_DAYS} DAY
               AND e.event_type = 'click') AS BIGINT) AS clicks_7d,
           CAST(COALESCE(SUM(CAST(FLOOR(e.value * {PIT_VALUE_FP}) AS BIGINT))
             FILTER (WHERE e.ts >= p.ts - INTERVAL {PIT_WINDOW_DAYS} DAY), 0)
             AS BIGINT) AS value_7d_fp
    FROM p LEFT JOIN events e ON e.user_id = p.user_id AND e.ts < p.ts
    GROUP BY 1, 2
    """,
    tags=("temporal", "asof", "features", "window", "pipeline"),
)
def features_pit_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-correct feature backfill — the feature-store
    materialization every training pipeline runs: for each label row
    (here: every ``purchase`` event) compute the user's activity
    features from STRICTLY BEFORE the label timestamp (lifetime event
    count, trailing-7d event count, trailing-7d clicks, trailing-7d
    quantized value sum), never after it — the leakage rule that makes
    offline features match what online serving would have seen.

    Implemented as the as-of family's union + running-sum shape, NOT an
    inequality join: facts and TWO probe rows per label (one at the
    label ts, one at ts − 7d) union into one frame; one window per user
    (probes sort before facts at equal ts ⇒ the strict ``<`` boundary);
    each windowed feature is the difference of the two probes' running
    sums.  One shuffle on user_id, linear scan per partition, zero
    fan-out — the same plan at 100 TB (an inequality join explodes on
    |facts| × |labels| per user).  The oracle is the naive inequality
    join with FILTER clauses — an independent formulation agreeing on
    semantics, including the [ts−7d, ts) boundary at both ends.

    Reference basis: extends the as-of surface (SURVEY §2.3 "not
    present" list); exact integer features via floor(v·1e6)."""
    ev = t(spark, sf_dir, "events")
    qv = F.coalesce(
        F.floor(F.col("value").cast("double") * PIT_VALUE_FP).cast("long"),
        F.lit(0),
    )
    facts = ev.select(
        "user_id",
        F.col("ts").alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(1).cast("long").alias("cnt"),
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("c_cnt"),
        qv.alias("qv"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("kind"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    zero = [
        F.lit(0).alias("_tag"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("c_cnt"),
        F.lit(0).cast("long").alias("qv"),
    ]
    pr_at = probes.select(
        "user_id", F.col("ts").alias("_t"), *zero,
        F.col("event_id").cast("long").alias("event_id"),
        F.lit("at").alias("kind"),
    )
    pr_cut = probes.select(
        "user_id",
        (F.col("ts") - F.expr(f"INTERVAL {PIT_WINDOW_DAYS} DAYS")).alias("_t"),
        *zero,
        F.col("event_id").cast("long").alias("event_id"),
        F.lit("cut").alias("kind"),
    )
    un = facts.unionByName(pr_at).unionByName(pr_cut)
    w = (
        Window.partitionBy("user_id")
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = un.select(
        "user_id",
        "event_id",
        "kind",
        F.sum("cnt").over(w).alias("cum_cnt"),
        F.sum("c_cnt").over(w).alias("cum_c"),
        F.sum("qv").over(w).alias("cum_qv"),
    ).filter(F.col("kind").isNotNull())
    at = cum.filter(F.col("kind") == "at").select(
        "event_id",
        "user_id",
        F.col("cum_cnt").alias("at_cnt"),
        F.col("cum_c").alias("at_c"),
        F.col("cum_qv").alias("at_qv"),
    )
    cut = cum.filter(F.col("kind") == "cut").select(
        "event_id",
        F.col("cum_cnt").alias("cut_cnt"),
        F.col("cum_c").alias("cut_c"),
        F.col("cum_qv").alias("cut_qv"),
    )
    return at.join(cut, "event_id").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("at_cnt").cast("long").alias("lifetime_events"),
        (F.col("at_cnt") - F.col("cut_cnt")).cast("long").alias("events_7d"),
        (F.col("at_c") - F.col("cut_c")).cast("long").alias("clicks_7d"),
        (F.col("at_qv") - F.col("cut_qv")).cast("long").alias("value_7d_fp"),
    )
