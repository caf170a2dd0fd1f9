"""Event-analytics operators: funnels, retention cohorts, transition paths.

Standard product-analytics shapes over the events stream — each is a
conditional-aggregation / window pipeline (no UDFs), one shuffle keyed by
user, so they scale with user-cardinality like any grouped aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query, t


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, s1.t_view,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts > s1.t_view THEN e.ts END) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      GROUP BY e.user_id, s1.t_view
    ),
    s3 AS (
      SELECT e.user_id, s2.t_view, s2.t_click,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_click THEN e.ts END)
               AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      GROUP BY e.user_id, s2.t_view, s2.t_click
    )
    SELECT user_id,
           (t_view IS NOT NULL)     AS did_view,
           (t_click IS NOT NULL)    AS did_click_after_view,
           (t_purchase IS NOT NULL) AS did_purchase_after_click
    FROM s3
    """,
    tags=("analytics", "funnel", "events"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: each stage's earliest timestamp
    strictly after the previous stage, via staged conditional MINs (three
    grouped aggregations — never a per-user sort in Python)."""
    ev = t(spark, sf_dir, "events")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s2 = (
        ev.join(s1, "user_id")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    s3 = (
        ev.join(s2, "user_id")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    return s3.select(
        "user_id",
        F.col("t_view").isNotNull().alias("did_view"),
        F.col("t_click").isNotNull().alias("did_click_after_view"),
        F.col("t_purchase").isNotNull().alias("did_purchase_after_click"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(MIN(CAST(ts AS DATE)) AS VARCHAR) AS cohort_day,
             MIN(CAST(ts AS DATE)) AS c0
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT e.user_id, f.cohort_day,
             COUNT(DISTINCT CAST(e.ts AS DATE)) AS active_days,
             CAST(MAX(CASE WHEN CAST(e.ts AS DATE) = f.c0 + 7 THEN 1 ELSE 0 END) AS BOOLEAN)
               AS retained_d7
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      GROUP BY e.user_id, f.cohort_day
    )
    SELECT cohort_day, COUNT(*) AS cohort_users,
           CAST(SUM(CASE WHEN retained_d7 THEN 1 ELSE 0 END) AS BIGINT) AS retained_d7_users,
           CAST(SUM(active_days) AS BIGINT) AS total_active_days
    FROM activity GROUP BY cohort_day
    """,
    tags=("analytics", "retention", "events"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0 cohorts with day-7 retention and activity totals — the
    first-touch attribution + conditional re-aggregation shape."""
    ev = t(spark, sf_dir, "events").withColumn("d", F.col("ts").cast("date"))
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("c0"))
    activity = (
        ev.join(firsts, "user_id")
        .groupBy("user_id", "c0")
        .agg(
            F.countDistinct("d").alias("active_days"),
            F.max((F.col("d") == F.date_add(F.col("c0"), 7)).cast("int"))
            .cast("boolean")
            .alias("retained_d7"),
        )
    )
    return (
        activity.groupBy(F.col("c0").cast("string").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("cohort_users"),
            F.sum(F.col("retained_d7").cast("int")).cast("long").alias("retained_d7_users"),
            F.sum("active_days").cast("long").alias("total_active_days"),
        )
    )


@query(
    "events_transition_paths",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type || ' -> ' || next_type AS path, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1
    """,
    tags=("analytics", "paths", "events"),
)
def events_transition_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (the Markov/path-analysis building
    block): LEAD over per-user time order, then a global bigram count."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.concat(F.col("event_type"), F.lit(" -> "), F.col("next_type")).alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_daily_gapfill",
    oracle="""
    WITH span AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events GROUP BY user_id
    ),
    calendar AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT c.user_id, CAST(c.day AS VARCHAR) AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
    FROM calendar c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
    """,
    tags=("analytics", "gapfill", "timeseries"),
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated per-user calendar (sequence +
    explode) left-joined against actual daily counts, zero-filled.  The
    densification pattern every downstream rolling-window computation
    needs; the calendar generation is O(users × days), never a cross join
    against a global calendar."""
    ev = t(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    span = ev.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    calendar = span.select(
        "user_id",
        F.explode(F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))).alias("day"),
    )
    daily = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("n"))
    return (
        calendar.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events GROUP BY 1
    """,
    tags=("analytics", "histogram", "profiling"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (bucket = floor(value/width)) — the
    single-pass distribution profile; width chosen in-query, no second
    scan for min/max."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 5.0).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@query(
    "events_anomaly_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
                  AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n_events,
             sx / CAST(n_events AS DOUBLE) AS mean,
             (sxx / CAST(n_events AS DOUBLE))
               - ((sx / CAST(n_events AS DOUBLE)) * (sx / CAST(n_events AS DOUBLE)))
               AS variance
      FROM m
    )
    SELECT s.event_type, s.n_events, s.mean, s.variance,
           CAST(SUM(CASE WHEN (e.value - s.mean) * (e.value - s.mean)
                              > CAST(9 AS DOUBLE) * s.variance
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY s.event_type, s.n_events, s.mean, s.variance
    """,
    tags=("analytics", "anomaly", "stats", "events"),
)
def events_anomaly_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier counts per event type, with exact-moment statistics:
    mean/variance derive from DECIMAL sums (deterministic, unlike the
    engines' streaming-float stddev), and the outlier test compares
    squared deviation against 9·variance — no sqrt, no z-score division,
    so the boundary predicate is the same IEEE expression in both engines.

    Scale shape: one grouped aggregate for the moments (map-side partial),
    one join of the fact stream against the per-type stats frame (bounded
    by event-type cardinality — AQE broadcasts it), one final aggregate.
    The fact table is never windowed or collected."""
    ev = t(spark, sf_dir, "events")
    from ..queries import dec

    n_d = F.col("n_events").cast("double")
    mean = F.col("sx") / n_d
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec(F.col("value"))).cast("double").alias("sx"),
        F.sum(dec(F.col("value")) * dec(F.col("value"))).cast("double").alias("sxx"),
    )
    stats = m.select(
        "event_type",
        "n_events",
        mean.alias("mean"),
        ((F.col("sxx") / n_d) - (mean * mean)).alias("variance"),
    )
    dev = F.col("value") - F.col("mean")
    return (
        ev.select("event_type", "value")
        .join(stats, "event_type")
        .groupBy("event_type", "n_events", "mean", "variance")
        .agg(
            # coalesce: a group with only NULL values sums zero non-null
            # inputs -> NULL in Spark, but the oracle's CASE...ELSE 0 sums 0
            F.coalesce(
                F.sum(((dev * dev) > (F.lit(9.0) * F.col("variance"))).cast("int")),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers")
        )
    )


@query(
    "events_activity_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days
    ),
    runs AS (
      SELECT user_id, island, COUNT(*) AS run_len
      FROM isl GROUP BY user_id, island
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(SUM(run_len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(run_len) AS BIGINT) AS max_streak_days
    FROM runs GROUP BY user_id
    """,
    tags=("events", "window", "islands"),
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, maximal runs of CONSECUTIVE active
    days (the classic ``date - row_number()`` constant-per-run trick —
    engagement-streak analytics, also the shape behind session stitching
    and sensor-gap detection).  One user-partitioned window + two
    aggregations; the per-(user, day) dedupe is the only corpus-volume
    shuffle, and the window reuses its partitioning."""
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("run_len").cast("long").alias("max_streak_days"),
    )


@query(
    "events_state_durations",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(date_diff('microsecond', ts, next_ts)) AS BIGINT) AS total_us,
           CAST(MAX(date_diff('microsecond', ts, next_ts)) AS BIGINT) AS max_us
    FROM seq WHERE next_ts IS NOT NULL
    GROUP BY event_type
    """,
    tags=("events", "window", "scd2", "temporal"),
)
def events_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-interval (SCD2) reconstruction from an event log: each event
    opens a state that the user's NEXT event closes (``LEAD`` over the
    per-user timeline — the valid-from/valid-to derivation behind every
    type-2 dimension build); output aggregates closed-interval dwell time
    per state.  Open (final) intervals are excluded — they have no
    deterministic end.  Durations are exact MICROSECOND integers —
    second-level diffs disagree across engines (DuckDB counts boundary
    crossings, Spark truncates).  One user-partitioned window; the state
    aggregation reuses nothing corpus-sized."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    dur = F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("next_ts"))
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(dur).cast("long").alias("total_us"),
        F.max(dur).cast("long").alias("max_us"),
    )


@query(
    "events_cumulative_unique_users",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    d AS (SELECT d0, COUNT(*) AS new_users FROM f GROUP BY d0)
    SELECT strftime(d0, '%Y-%m-%d') AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY d0 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM d
    """,
    tags=("events", "analytics", "window", "first-touch"),
)
def events_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-unique-users curve (the growth chart behind every DAU
    dashboard) via the FIRST-TOUCH trick: a running COUNT(DISTINCT) window
    is unbounded state, but "users seen through day d" == "users whose
    FIRST event is <= d" — one per-user MIN (map-side-combinable), one
    per-day count, one running sum.  The global window runs over the
    per-day frame, which is CALENDAR-bounded (~3k rows even at 100 TB /
    decade of logs), not corpus-bounded — the single-partition stage is
    O(days), never O(events).  All integers; dates emitted as strings."""
    ev = t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    daily = first.groupBy("d0").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("d0", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


DECAY_SCALE = 1000  #: fixed-point scale for the per-event decayed weight


@query(
    "events_decayed_engagement",
    oracle=f"""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
    w AS (
      SELECT user_id,
             CAST(FLOOR({DECAY_SCALE} * value
                        / (1 + date_diff('day', CAST(ts AS DATE), mx.dmax)))
                  AS BIGINT) AS w
      FROM events CROSS JOIN mx
    )
    SELECT user_id,
           CAST(SUM(w) AS BIGINT) AS decayed_score,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM w GROUP BY user_id
    """,
    tags=("events", "analytics", "decay", "scoring"),
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score per user — recency-weighted activity
    (the ranking signal behind "active users", feed ranking, churn risk).
    Decay is HYPERBOLIC (weight = value / (1 + age_days)) rather than
    exponential: libm ``exp`` is not bit-portable across engines, while
    this is one ``*``/``/``/``FLOOR`` chain — each per-event weight is a
    fixed-point BIGINT from one identical IEEE double expression, summed
    exactly, so the score is deterministic at any partition order.  Age
    anchors to the corpus max date (a 1-row broadcast aggregate), never
    ``now()``."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.to_date("ts")).alias("dmax"))
    w = F.floor(
        F.lit(float(DECAY_SCALE))
        * F.col("value")
        / (F.lit(1) + F.datediff(F.col("dmax"), F.to_date("ts")))
    ).cast("long")
    return (
        ev.crossJoin(F.broadcast(mx))
        .select("user_id", w.alias("w"))
        .groupBy("user_id")
        .agg(
            F.sum("w").cast("long").alias("decayed_score"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


@query(
    "orders_rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
    cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), mx.dmax) AS recency,
             COUNT(*) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
      FROM orders CROSS JOIN mx GROUP BY o_custkey, mx.dmax
    ),
    q AS (
      SELECT CAST(quantile_cont(recency, 0.25) AS DOUBLE) AS r1,
             CAST(quantile_cont(recency, 0.50) AS DOUBLE) AS r2,
             CAST(quantile_cont(recency, 0.75) AS DOUBLE) AS r3,
             CAST(quantile_cont(freq, 0.25) AS DOUBLE) AS f1,
             CAST(quantile_cont(freq, 0.50) AS DOUBLE) AS f2,
             CAST(quantile_cont(freq, 0.75) AS DOUBLE) AS f3,
             CAST(quantile_cont(monetary, 0.25) AS DOUBLE) AS m1,
             CAST(quantile_cont(monetary, 0.50) AS DOUBLE) AS m2,
             CAST(quantile_cont(monetary, 0.75) AS DOUBLE) AS m3
      FROM cust
    ),
    scored AS (
      SELECT monetary,
             4 - ((recency > r1)::INT + (recency > r2)::INT + (recency > r3)::INT) AS r,
             1 + ((freq > f1)::INT + (freq > f2)::INT + (freq > f3)::INT) AS f,
             1 + ((monetary > m1)::INT + (monetary > m2)::INT + (monetary > m3)::INT) AS m
      FROM cust CROSS JOIN q
    )
    SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS rfm,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY 1
    """,
    tags=("analytics", "segmentation", "rfm", "percentile"),
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary) — the
    classic CRM cohorting op, built WITHOUT the global NTILE window every
    textbook version uses (a corpus-sized single-partition sort): quartile
    CUTPOINTS come from one exact-percentile aggregation (a 1-row frame,
    broadcast back), and each customer scores 1–4 by three comparisons
    against them — map-side, corpus-order-free.  Ties sit strictly on one
    side of each cutpoint (``>`` on exact doubles), so scores are
    deterministic without a tie-break column.  Recency anchors to the
    corpus max date; monetary is a decimal-exact sum surfaced as double."""
    orders = t(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.to_date("o_orderdate")).alias("dmax"))
    cust = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "dmax")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("dmax"), F.col("last_d")).alias("recency"),
            "freq",
            "monetary",
        )
    )
    q = cust.agg(
        *[
            F.percentile(c, p).alias(f"{c[0]}{i + 1}")
            for c in ("recency", "freq", "monetary")
            for i, p in enumerate((0.25, 0.50, 0.75))
        ]
    )
    def n_above(c: str, cuts: tuple[str, str, str]):
        return sum(
            (F.col(c) > F.col(cut)).cast("int") for cut in cuts
        )
    scored = cust.crossJoin(F.broadcast(q)).select(
        "monetary",
        (F.lit(4) - n_above("recency", ("r1", "r2", "r3"))).alias("r"),
        (F.lit(1) + n_above("freq", ("f1", "f2", "f3"))).alias("f"),
        (F.lit(1) + n_above("monetary", ("m1", "m2", "m3"))).alias("m"),
    )
    return (
        scored.select(
            F.concat(
                F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
            ).alias("rfm"),
            "monetary",
        )
        .groupBy("rfm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(18,2)")).cast("double").alias("total_monetary"),
        )
    )
