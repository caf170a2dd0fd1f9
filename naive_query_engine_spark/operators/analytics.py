"""Event-analytics operators: funnels, retention cohorts, transition paths.

Standard product-analytics shapes over the events stream — each is a
conditional-aggregation / window pipeline (no UDFs), one shuffle keyed by
user, so they scale with user-cardinality like any grouped aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import cut_lineage, query, t


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


@query(
    "events_ab_test_analysis",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN (strpos('0123456789abcdef',
                               SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      FROM assign
    )
    SELECT n_a, n_b, conv_a, conv_b,
           CASE WHEN conv_a = 0 OR conv_b = 0 THEN NULL
                ELSE (CAST(conv_b AS DOUBLE) / n_b) / (CAST(conv_a AS DOUBLE) / n_a)
           END AS lift,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL
                ELSE ((CAST(conv_b AS DOUBLE) / n_b) - (CAST(conv_a AS DOUBLE) / n_a))
                  / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                         * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
           END AS z_score
    FROM arms
    """,
    tags=("events", "analytics", "experimentation", "ab-test"),
)
def events_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm experiment readout — the experimentation primitive every
    product pipeline ends in: deterministic md5 arm assignment (the same
    content-hash family as the dataset splits — users keep their arm
    across reruns and engines, unlike any RNG bucketing), per-user
    conversion (did a 'purchase'), then counts, lift and the
    two-proportion z-score.  Everything up to the final row is exact
    integers; lift and z are fixed double expression trees over those
    four exact counts, so the readout hash-matches across engines.  One
    per-user aggregation, then a 1-row reduce — nothing corpus-sized
    past the first shuffle."""
    ev = t(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int") % 2 == 0,
        "A",
    ).otherwise("B")
    assign = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    ).select(arm.alias("arm"), "converted")
    arms = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rb - ra) / F.sqrt(
        pooled
        * (F.lit(1) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    degenerate_lift = (F.col("conv_a") == 0) | (F.col("conv_b") == 0)
    degenerate_z = (F.col("conv_a") + F.col("conv_b") == 0) | (
        F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b")
    )
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.when(degenerate_lift, F.lit(None).cast("double"))
        .otherwise(rb / ra)
        .alias("lift"),
        F.when(degenerate_z, F.lit(None).cast("double"))
        .otherwise(z)
        .alias("z_score"),
    )


BASKET_MIN_SUPPORT = 50  #: brand pairs below this co-occurrence are noise
BASKET_TOP = 20


@query(
    "orders_market_basket_lift",
    oracle=f"""
    WITH b AS (
      SELECT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
    sup1 AS (SELECT p_brand, COUNT(*) AS sup FROM b GROUP BY 1),
    pair AS (
      SELECT x.p_brand AS brand_a, y.p_brand AS brand_b, COUNT(*) AS sup_ab
      FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT brand_a, brand_b, CAST(sup_ab AS BIGINT) AS sup_ab,
             (CAST(sup_ab AS DOUBLE) * nb.n_orders) / (CAST(sa.sup AS DOUBLE) * sb.sup) AS lift
      FROM pair
      JOIN sup1 sa ON sa.p_brand = brand_a
      JOIN sup1 sb ON sb.p_brand = brand_b
      CROSS JOIN nb
      WHERE sup_ab >= {BASKET_MIN_SUPPORT}
    )
    SELECT brand_a, brand_b, sup_ab, lift,
           CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, brand_a, brand_b) AS BIGINT) AS rnk
    FROM scored QUALIFY rnk <= {BASKET_TOP}
    """,
    tags=("analytics", "association-rules", "basket", "topk"),
)
def orders_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (the Apriori first step) at BRAND
    granularity: per-order distinct brand sets, within-order pair
    co-occurrence, support + LIFT (sup_ab·N / sup_a·sup_b), min-support
    floor, top-{BASKET_TOP} by lift.  Brand-level keeps the pair universe
    bounded (≤ brands², here 300) no matter the corpus size; the
    within-order self-join fans out only basket_size² per order — the
    same bounded-fan-out discipline as every pair op in this repo.  Lift
    is one double expression over exact integer supports; ranking
    tie-breaks lexicographically, and the top-k is TakeOrdered (no global
    sort)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from ..queries import cut_lineage

    # four consumers (order count, unary supports, both self-join sides):
    # cut the lineage so the basket frame materializes once — as a plain
    # frame the static plan replays the join+distinct per consumer
    b = cut_lineage(
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    nb = b.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    sup1 = b.groupBy("p_brand").agg(F.count(F.lit(1)).alias("sup"))
    x, y = b.alias("x"), b.alias("y")
    pair = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.p_brand") < F.col("y.p_brand")),
        )
        .groupBy(
            F.col("x.p_brand").alias("brand_a"), F.col("y.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= BASKET_MIN_SUPPORT)
    )
    sa = sup1.select(F.col("p_brand").alias("brand_a"), F.col("sup").alias("sup_a"))
    sb = sup1.select(F.col("p_brand").alias("brand_b"), F.col("sup").alias("sup_b"))
    lift = (F.col("sup_ab").cast("double") * F.col("n_orders")) / (
        F.col("sup_a").cast("double") * F.col("sup_b")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("lift").desc(), "brand_a", "brand_b")
    return (
        pair.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(nb))
        .select("brand_a", "brand_b", F.col("sup_ab").cast("long").alias("sup_ab"), lift.alias("lift"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= BASKET_TOP)
    )


FC_SEASON = 7  #: seasonal-naive lag (weekly seasonality)


@query(
    "events_forecast_backtest",
    oracle=f"""
    WITH span AS (
      SELECT event_type, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events GROUP BY event_type
    ),
    calendar AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    dense AS (
      SELECT c.event_type, c.day, COALESCE(d.n, 0) AS n
      FROM calendar c LEFT JOIN daily d
        ON d.event_type = c.event_type AND d.day = c.day
    ),
    fc AS (
      SELECT a.event_type, a.n AS actual, f.n AS forecast
      FROM dense a JOIN dense f
        ON f.event_type = a.event_type AND f.day = a.day - {FC_SEASON}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(actual - forecast)) AS BIGINT) AS total_abs_err,
           CAST(SUM(ABS(actual - forecast)) AS DOUBLE) / COUNT(*) AS mae
    FROM fc GROUP BY event_type
    """,
    tags=("events", "analytics", "forecast", "backtest", "timeseries"),
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST with the seasonal-naive baseline (forecast(d) =
    actual(d − 7)) — the deterministic yardstick every forecasting system
    must beat, and the only one whose backtest can hash-match across
    engines (Holt-Winters/ETS hide libm ``pow``/``exp`` in every step).
    Daily series are DENSIFIED first (per-type calendar, zero-filled):
    skipping that silently drops zero-demand days and flatters MAE — the
    classic backtest bug.  Errors are exact integers; MAE is one double
    division per type.  The 7-day lag is an equi-join on (type, day−7)
    against the dense frame — partition-pruned at scale, no corpus-wide
    window."""
    ev = t(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    span = ev.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        "event_type",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    dense = calendar.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    a = dense.alias("a")
    f_ = dense.select(
        "event_type", F.date_add(F.col("day"), FC_SEASON).alias("day"),
        F.col("n").alias("forecast"),
    ).alias("f")
    err = F.abs(F.col("a.n") - F.col("forecast"))
    return (
        a.join(f_, ["event_type", "day"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(err).cast("long").alias("total_abs_err"),
            (F.sum(err).cast("double") / F.count(F.lit(1))).alias("mae"),
        )
    )


@query(
    "events_funnel_time_to_convert",
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
    ),
    conv AS (
      SELECT CAST(CAST(t_view AS DATE) AS VARCHAR) AS cohort_day,
             date_diff('microsecond', t_view, t_purchase) AS ttc_us
      FROM s3 WHERE t_purchase IS NOT NULL
    )
    SELECT cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(quantile_cont(ttc_us, 0.5) AS DOUBLE) AS median_us,
           CAST(quantile_cont(ttc_us, 0.9) AS DOUBLE) AS p90_us
    FROM conv GROUP BY cohort_day
    """,
    tags=("events", "analytics", "funnel", "percentile", "composition"),
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert through the full view→click→purchase funnel, per
    first-view cohort day — the latency read on ``events_funnel``'s
    boolean counts (how LONG conversion takes, not just whether).  Same
    staged conditional-MIN derivation (no per-user sort anywhere);
    durations are exact integer MICROSECONDS (second-level diffs diverge
    across engines); median/p90 are the standard interpolated percentile
    over those exact integers (Spark ``percentile`` ≙ DuckDB
    ``quantile_cont``).  The percentile aggregation is keyed by cohort
    day — bounded groups, never a global sort."""
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
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    ttc = F.timestamp_diff("MICROSECOND", F.col("t_view"), F.col("t_purchase"))
    return (
        s3.filter(F.col("t_purchase").isNotNull())
        .select(
            F.col("t_view").cast("date").cast("string").alias("cohort_day"),
            ttc.alias("ttc_us"),
        )
        .groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.percentile("ttc_us", 0.5).alias("median_us"),
            F.percentile("ttc_us", 0.9).alias("p90_us"),
        )
    )


@query(
    "events_power_users_pareto",
    oracle="""
    WITH cnt AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    q AS (SELECT CAST(quantile_cont(n, 0.9) AS DOUBLE) AS p90 FROM cnt),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n) AS BIGINT) AS total_events,
             CAST(SUM(CASE WHEN n > q.p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_power_users,
             CAST(SUM(CASE WHEN n > q.p90 THEN n ELSE 0 END) AS BIGINT) AS power_events
      FROM cnt CROSS JOIN q
    )
    SELECT n_users, n_power_users, total_events,
           CAST(power_events AS DOUBLE) / total_events AS power_share
    FROM agg
    """,
    tags=("events", "analytics", "skew", "pareto"),
)
def events_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Workload-concentration audit (the Pareto/80-20 read): what share of
    all events comes from users above the p90 activity cutpoint?  This
    number IS the skew-mitigation decision input — when a thin slice of
    keys carries most of the volume, keyed shuffles need salting or AQE
    skew-splitting (``join_salted_skew`` is the remedy this query
    justifies).  Same no-global-window discipline as RFM: the cutpoint is
    a 1-row percentile aggregate broadcast back over the user-count
    frame; counts and event sums are exact integers, the share is one
    double division."""
    ev = t(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    q = cnt.agg(F.percentile("n", 0.9).alias("p90"))
    is_power = (F.col("n") > F.col("p90")).cast("int")
    agg = cnt.crossJoin(F.broadcast(q)).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("total_events"),
        F.sum(is_power).cast("long").alias("n_power_users"),
        F.sum(F.col("n") * is_power).cast("long").alias("power_events"),
    )
    return agg.select(
        "n_users",
        "n_power_users",
        "total_events",
        (F.col("power_events").cast("double") / F.col("total_events")).alias(
            "power_share"
        ),
    )


@query(
    "events_seasonality_profile",
    oracle="""
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "analytics", "seasonality", "profile"),
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the seasonality fingerprint
    behind capacity planning and the seasonal-naive forecast's lag choice
    (``events_forecast_backtest`` assumes weekly structure; this is the
    query that shows it).  Bounded output (7×24) at any corpus size; one
    map-side-combinable aggregation.  Spark ``dayofweek`` and DuckDB
    ``dayofweek`` differ by convention — Spark is 1=Sunday..7, DuckDB is
    0=Sunday..6 — so the Spark side shifts to DuckDB's numbering."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


@query(
    "orders_cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, strftime(MIN(CAST(o_orderdate AS DATE)), '%Y-%m') AS cohort
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      SELECT f.cohort,
             (CAST(strftime(o.o_orderdate, '%Y') AS INTEGER) * 12
              + CAST(strftime(o.o_orderdate, '%m') AS INTEGER))
             - (CAST(SUBSTR(f.cohort, 1, 4) AS INTEGER) * 12
                + CAST(SUBSTR(f.cohort, 6, 2) AS INTEGER)) AS months_since,
             CAST(o.o_totalprice AS DECIMAL(12,2)) AS p
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    cell AS (
      SELECT cohort, CAST(months_since AS BIGINT) AS months_since,
             SUM(p) AS m_rev
      FROM rev GROUP BY 1, 2
    )
    SELECT cohort, months_since,
           CAST(m_rev AS DOUBLE) AS month_revenue,
           CAST(SUM(m_rev) OVER (PARTITION BY cohort ORDER BY months_since
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM cell
    """,
    tags=("analytics", "cohort", "ltv", "window"),
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort-LTV triangle: customers grouped by first-order month,
    revenue accumulated by months-since-acquisition — the curve every
    payback / retention-economics analysis reads.  Months-since is exact
    integer calendar arithmetic (year*12+month, identical both engines —
    date subtraction conventions are not portable); revenue is
    decimal-exact, the cumulative window runs over the (cohort,
    months_since) CELL frame — bounded by months², never customer- or
    order-cardinality."""
    orders = t(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_format(F.min(F.to_date("o_orderdate")), "yyyy-MM").alias("cohort")
    )
    mnum = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cnum = (
        F.substring("cohort", 1, 4).cast("int") * 12
        + F.substring("cohort", 6, 2).cast("int")
    )
    cell = (
        orders.join(firsts, "o_custkey")
        .select(
            "cohort",
            (mnum - cnum).cast("long").alias("months_since"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
        )
        .groupBy("cohort", "months_since")
        .agg(F.sum("p").alias("m_rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("months_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort",
        "months_since",
        F.col("m_rev").cast("double").alias("month_revenue"),
        F.sum("m_rev").over(w).cast("double").alias("cum_revenue"),
    )


@query(
    "events_new_vs_returning_daily",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    )
    SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE) = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS new_user_events,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE) > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_events,
           CAST(COUNT(DISTINCT CASE WHEN CAST(e.ts AS DATE) = f.d0
                                    THEN e.user_id END) AS BIGINT) AS new_users,
           CAST(COUNT(DISTINCT CASE WHEN CAST(e.ts AS DATE) > f.d0
                                    THEN e.user_id END) AS BIGINT) AS returning_users
    FROM events e JOIN f ON f.user_id = e.user_id
    GROUP BY 1
    """,
    tags=("events", "analytics", "first-touch", "acquisition"),
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split (the acquisition-vs-retention
    decomposition under every growth dashboard): an event is "new" when
    it falls on its user's first-touch day.  One per-user MIN joined back
    (AQE broadcasts the first-touch side while it fits, shuffles both
    sides keyed by user at scale), then a day-keyed conditional
    aggregation — all exact integers."""
    ev = t(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    f = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    is_new = F.col("d") == F.col("d0")
    return (
        ev.join(f, "user_id")
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(is_new.cast("int")).cast("long").alias("new_user_events"),
            F.sum((F.col("d") > F.col("d0")).cast("int"))
            .cast("long")
            .alias("returning_events"),
            F.count_distinct(F.when(is_new, F.col("user_id")))
            .cast("long")
            .alias("new_users"),
            F.count_distinct(F.when(F.col("d") > F.col("d0"), F.col("user_id")))
            .cast("long")
            .alias("returning_users"),
        )
    )


@query(
    "orders_mom_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue,
           CASE WHEN LAG(rev) OVER (ORDER BY month) IS NULL THEN NULL
                ELSE CAST(rev AS DOUBLE) / CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE) - 1
           END AS mom_growth
    FROM m
    """,
    tags=("analytics", "timeseries", "growth", "window"),
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the finance run-rate read:
    decimal-exact monthly sums, LAG over the months-bounded frame (the
    single-partition window is O(months) forever), growth as one double
    division of two exact decimals (NULL for the first month in both
    engines)."""
    orders = t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"))
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return m.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.col("rev").cast("double") / prev.cast("double") - 1)
        .alias("mom_growth"),
    )


@query(
    "orders_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(rev) AS total FROM rev),
    c AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
    ),
    cls AS (
      SELECT CASE WHEN cum * 10 <= tot.total * 7 THEN 'A'
                  WHEN cum * 10 <= tot.total * 9 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev
      FROM c CROSS JOIN tot
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) AS class_revenue,
           CAST(SUM(rev) AS DOUBLE) / (SELECT CAST(total AS DOUBLE) FROM tot)
             AS revenue_share
    FROM cls GROUP BY abc_class
    """,
    tags=("analytics", "abc", "pareto", "prefix-sum"),
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (cumulative-revenue-share) part classification — the inventory
    80/20 cut: parts ranked by revenue, class A while the running share
    is ≤70%, B to 90%, C after.  The ranking frame is PART-cardinality
    (scales with SF), so the textbook global cumulative window is a
    corpus-sized single-partition sort — instead the running sum comes
    from :func:`layout.distributed_prefix_sum` (the sweep-line idiom,
    second consumer).  Class boundaries compare ``cum*10`` against
    ``total*7/9`` in EXACT decimals — no division touches the
    classification, the only doubles are the reported shares."""
    from .layout import distributed_prefix_sum

    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("rev")
    )
    c = distributed_prefix_sum(
        rev, [F.col("rev").desc(), F.col("l_partkey")], "rev", "cum"
    )
    # total from the prefix-sum frame, which distributed_prefix_sum has
    # already lineage-cut — aggregating rev directly re-ran the lineitem
    # scan + partkey groupBy a second time (r14, guide §1.2)
    tot = c.agg(F.sum("rev").alias("total"))
    cls = (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("cum") * 10 <= F.col("total") * 7, "A")
            .when(F.col("cum") * 10 <= F.col("total") * 9, "B")
            .otherwise("C")
            .alias("abc_class"),
            "rev",
            "total",
        )
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev").cast("double").alias("class_revenue"),
        (F.sum("rev").cast("double") / F.first("total").cast("double")).alias(
            "revenue_share"
        ),
    )


HHI_FP = 1_000_000_000


@query(
    "events_type_concentration_hhi",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    n AS (SELECT day, SUM(c) AS n FROM d GROUP BY day),
    terms AS (
      SELECT d.day,
             CAST(FLOOR({HHI_FP} *
               ((d.c / CAST(n.n AS DOUBLE)) * (d.c / CAST(n.n AS DOUBLE)))
             ) AS BIGINT) AS term_fp
      FROM d JOIN n ON n.day = d.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(term_fp) AS BIGINT) AS hhi_fp,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM terms GROUP BY 1
    """,
    tags=("events", "analytics", "concentration", "monitoring"),
)
def events_type_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type concentration via the Herfindahl–Hirschman index
    (Σ share² — the log-free concentration metric; Shannon entropy needs
    libm log): a day whose traffic collapses into one event type jumps
    toward HHI=1 — the mix-shift alarm complementary to the volume-based
    drift monitors.  Per-(day,type) counts are exact; each share² is one
    IEEE expression floored to fixed-point before the per-day sum
    (order-free).  Frames are day×type bounded after the first
    aggregation."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = d.groupBy("day").agg(F.sum("c").alias("n"))
    share = F.col("c") / F.col("n").cast("double")
    term = F.floor(F.lit(HHI_FP) * (share * share)).cast("long")
    return (
        d.join(n, "day")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), term.alias("term_fp"))
        .groupBy("day")
        .agg(
            F.sum("term_fp").cast("long").alias("hhi_fp"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
    )


@query(
    "supplier_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem GROUP BY 1
    ),
    r AS (
      SELECT rev,
             CAST(ROW_NUMBER() OVER (ORDER BY rev, l_suppkey) AS BIGINT) AS rnk
      FROM rev
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rev) AS total,
             SUM(rev * rnk) AS weighted
      FROM r
    )
    SELECT n,
           CAST(total AS DOUBLE) AS total_revenue,
           (2 * CAST(weighted AS DOUBLE)) / (n * CAST(total AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1) / n AS gini
    FROM m
    """,
    tags=("analytics", "concentration", "gini", "distributed-rank"),
)
def supplier_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of supplier revenue — the inequality metric
    behind vendor-concentration risk (and the scalar twin of the ABC
    curve).  Needs every supplier's RANK by revenue: the third consumer
    of the distributed-rank machinery (``layout.global_rank`` — no
    single-partition ROW_NUMBER even though the supplier domain scales
    with SF).  G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n with ascending ranks:
    Σx and Σ(rank·x) are exact decimal sums (rank is an exact BIGINT), so
    the coefficient is one fixed double expression over three exact
    aggregates."""
    from .layout import global_rank

    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("rev")
    )
    ranked, n_total = global_rank(rev, ["rev", "l_suppkey"], "_r")
    m = ranked.select(
        "rev", (F.col("_r") + 1).alias("rnk")  # global_rank is 0-based
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").alias("total"),
        F.sum(F.col("rev") * F.col("rnk")).alias("weighted"),
    )
    n, tot = F.col("n"), F.col("total").cast("double")
    gini = (2 * F.col("weighted").cast("double")) / (n * tot) - (
        n.cast("double") + 1
    ) / n
    return m.select(
        "n", tot.alias("total_revenue"), gini.alias("gini")
    )


@query(
    "part_skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT CAST(p_retailprice AS DECIMAL(12,2)) AS price,
             p_size AS size,
             COUNT(*) AS n_parts, MIN(p_partkey) AS min_partkey
      FROM part GROUP BY 1, 2
    ),
    best AS (
      SELECT price, size AS best_size, n_parts, min_partkey,
             ROW_NUMBER() OVER (PARTITION BY price ORDER BY size DESC) AS rn
      FROM pts
    ),
    cm AS (
      SELECT price, best_size, n_parts, min_partkey,
             MAX(best_size) OVER (ORDER BY price
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS prevmax
      FROM best WHERE rn = 1
    )
    SELECT CAST(price AS DOUBLE) AS price,
           CAST(best_size AS BIGINT) AS best_size,
           CAST(n_parts AS BIGINT) AS n_parts,
           CAST(min_partkey AS BIGINT) AS min_partkey
    FROM cm WHERE prevmax IS NULL OR best_size > prevmax
    """,
    tags=("analytics", "skyline", "pareto", "prefix-max"),
)
def part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front) over parts: minimize price, maximize
    size — a part survives iff no other part is cheaper-or-equal AND
    bigger-or-equal with at least one strict (the classic dominance
    definition; Borzsony/Kossmann/Stocker's skyline operator, absent
    from both Spark and the reference's algebra).

    Distributed shape: the dominance test collapses to "size strictly
    greater than the best size among all STRICTLY cheaper price points,
    and best-of-group at its own price" — i.e. one grouped argmax per
    price (two map-side-partial aggregations) followed by an EXCLUSIVE
    running max over the price order, which is
    :func:`layout.distributed_prefix_max` (the prefix-sum idiom's MAX
    form — range partition + per-partition offsets, no single-partition
    window even though the price domain scales with SF).  Price is cast
    to DECIMAL(12,2) on both sides so the group key is an exact decimal,
    never a float equality."""
    from ..queries import dec
    from .layout import distributed_prefix_max

    p = t(spark, sf_dir, "part")
    pts = p.groupBy(
        dec(F.col("p_retailprice")).alias("price"), F.col("p_size").alias("size")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
    )
    # per-price argmax by size: (price, size) is unique after the group,
    # so the struct max is the rn=1 row of the oracle
    best = pts.groupBy("price").agg(
        F.max(F.struct("size", "n_parts", "min_partkey")).alias("s")
    ).select(
        "price",
        F.col("s.size").alias("best_size"),
        F.col("s.n_parts").alias("n_parts"),
        F.col("s.min_partkey").alias("min_partkey"),
    )
    cm = distributed_prefix_max(best, [F.col("price")], "best_size", "prevmax")
    sky = cm.filter(F.col("prevmax").isNull() | (F.col("best_size") > F.col("prevmax")))
    return sky.select(
        F.col("price").cast("double").alias("price"),
        F.col("best_size").cast("long").alias("best_size"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.col("min_partkey").cast("long").alias("min_partkey"),
    )


ATTRIB_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day conversion window


@query(
    "events_attribution_last_touch",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, ts, value,
             LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts,
             LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
      FROM events
    ),
    conv AS (
      SELECT CASE WHEN touch_ts IS NOT NULL
                   AND date_diff('microsecond', touch_ts, ts) <= {ATTRIB_WINDOW_US}
                  THEN touch_type ELSE 'organic' END AS channel,
             user_id, value
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_revenue
    FROM conv GROUP BY channel
    """,
    tags=("events", "analytics", "attribution", "window"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing last-touch attribution: each purchase is credited to the
    user's most recent click/view STRICTLY before it (``last(...,
    ignorenulls)`` over the exclusive preceding frame — the conditional
    carry-forward twin of the as-of join) when that touch falls inside a
    7-day conversion window, else 'organic'.  The window predicate is an
    exact microsecond diff (second-level diffs disagree across engines);
    revenue sums are decimal-exact.  One user-partitioned window + one
    channel-bounded aggregation — the same scaling class as sessionize."""
    ev = t(spark, sf_dir, "events")
    from ..queries import dec

    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "value",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    in_window = F.col("touch_ts").isNotNull() & (
        F.timestamp_diff("MICROSECOND", F.col("touch_ts"), F.col("ts"))
        <= F.lit(ATTRIB_WINDOW_US)
    )
    conv = seq.filter(F.col("event_type") == "purchase").select(
        F.when(in_window, F.col("touch_type")).otherwise("organic").alias("channel"),
        "user_id",
        "value",
    )
    return conv.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(dec(F.col("value"))).cast("double").alias("attributed_revenue"),
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


@query(
    "events_value_winsorized",
    oracle=f"""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, {WINSOR_LO}) AS lo,
             quantile_cont(value, {WINSOR_HI}) AS hi
      FROM events GROUP BY event_type
    ),
    parts AS (
      SELECT e.event_type,
             COUNT(*) AS n,
             SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS n_lo,
             SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS n_hi,
             SUM(CASE WHEN e.value >= c.lo AND e.value <= c.hi
                      THEN CAST(e.value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS mid_sum,
             MIN(c.lo) AS lo, MIN(c.hi) AS hi
      FROM events e JOIN cuts c ON c.event_type = e.event_type
      GROUP BY e.event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n_lo AS BIGINT) AS n_clipped_low,
           CAST(n_hi AS BIGINT) AS n_clipped_high,
           CAST(lo AS DOUBLE) AS lo_cut,
           CAST(hi AS DOUBLE) AS hi_cut,
           (CAST(mid_sum AS DOUBLE) + n_lo * CAST(lo AS DOUBLE) + n_hi * CAST(hi AS DOUBLE))
             / n AS winsorized_mean
    FROM parts
    """,
    tags=("analytics", "robust-stats", "winsorize", "percentile"),
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) mean per event type — the robust-statistics
    pre-step every metrics pipeline needs before averaging heavy-tailed
    values (a single corrupt 1e9 value otherwise owns the mean).

    Determinism discipline: summing CLIPPED doubles would be a
    non-associative float sum over interpolated cutpoints — instead the
    mean decomposes into (exact decimal sum of in-range values) +
    n_below·lo + n_above·hi, one fixed double expression at the end.
    Cutpoints are exact interpolated percentiles (the
    ``agg_percentiles_exact`` contract); the cut frame is
    type-bounded and broadcast back onto the scan — two passes, no
    corpus-sized sort."""
    from ..queries import dec

    ev = t(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", WINSOR_LO).alias("lo"),
        F.percentile("value", WINSOR_HI).alias("hi"),
    )
    z = F.lit(0).cast("decimal(12,2)")
    parts = (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias("n_lo"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias("n_hi"),
            F.sum(
                F.when(
                    (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")),
                    dec(F.col("value")),
                ).otherwise(z)
            ).alias("mid_sum"),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
        )
    )
    return parts.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_lo").cast("long").alias("n_clipped_low"),
        F.col("n_hi").cast("long").alias("n_clipped_high"),
        F.col("lo").cast("double").alias("lo_cut"),
        F.col("hi").cast("double").alias("hi_cut"),
        (
            (
                F.col("mid_sum").cast("double")
                + F.col("n_lo") * F.col("lo").cast("double")
                + F.col("n_hi") * F.col("hi").cast("double")
            )
            / F.col("n")
        ).alias("winsorized_mean"),
    )


@query(
    "events_ab_cuped",
    oracle="""
    WITH mid AS (
      SELECT CAST(FLOOR((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) / CAST(2 AS DOUBLE))
                  AS BIGINT) AS m
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             CASE WHEN (strpos('0123456789abcdef',
                               SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             SUM(CASE WHEN epoch_us(ts) < mid.m THEN 1 ELSE 0 END) AS pre,
             SUM(CASE WHEN epoch_us(ts) >= mid.m THEN 1 ELSE 0 END) AS post
      FROM events CROSS JOIN mid
      GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(pre) AS HUGEINT) AS sx, CAST(SUM(post) AS HUGEINT) AS sy,
             SUM(CAST(pre AS HUGEINT) * pre) AS sxx,
             SUM(CAST(pre AS HUGEINT) * post) AS sxy,
             SUM(CAST(post AS HUGEINT) * post) AS syy
      FROM per_user
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n_arm, SUM(pre) AS sx_arm, SUM(post) AS sy_arm
      FROM per_user GROUP BY arm
    )
    SELECT arm,
           CAST(n_arm AS BIGINT) AS n_users,
           CAST(sy_arm AS BIGINT) AS sum_post,
           CAST(sy_arm AS DOUBLE) / n_arm AS mean_post,
           (CAST(sy_arm AS DOUBLE) / n_arm)
             - ((CAST(mom.n * mom.sxy - mom.sx * mom.sy AS DOUBLE))
                / (CAST(mom.n * mom.sxx - mom.sx * mom.sx AS DOUBLE)))
               * ((CAST(sx_arm AS DOUBLE) / n_arm) - (CAST(mom.sx AS DOUBLE) / mom.n))
             AS adjusted_mean,
           (CAST(mom.n * mom.sxy - mom.sx * mom.sy AS DOUBLE))
             / (CAST(mom.n * mom.sxx - mom.sx * mom.sx AS DOUBLE)) AS theta,
           (CAST(mom.n * mom.sxy - mom.sx * mom.sy AS DOUBLE)
            * CAST(mom.n * mom.sxy - mom.sx * mom.sy AS DOUBLE))
             / (CAST(mom.n * mom.sxx - mom.sx * mom.sx AS DOUBLE)
                * CAST(mom.n * mom.syy - mom.sy * mom.sy AS DOUBLE)) AS rho_sq
    FROM arms CROSS JOIN mom
    """,
    tags=("events", "analytics", "experimentation", "cuped"),
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout (Deng et al., WSDM'13
    — the adjustment every modern experimentation platform applies):
    each user's PRE-period activity predicts their post-period metric, so
    subtracting θ·(pre − mean(pre)) removes the predictable component and
    shrinks arm variance by ρ² without biasing the difference (arms share
    θ).  Pre/post split at the corpus's own time midpoint (the drift
    family's anchor); θ = cov(pre,post)/var(pre) is one division over
    INTEGER co-moments in their cross-multiplied form (n·Σxy − Σx·Σy —
    no float means anywhere before the final expressions); ρ² is the
    reported variance-reduction factor.  Moments and cross-terms
    accumulate in DECIMAL(38,0) (HUGEINT in the oracle — ADVICE r4):
    high-activity users at large SF would silently wrap a raw-BIGINT
    n·Σyy in Spark while DuckDB errors; the agg_corr_exact discipline.
    One per-user shuffle, then 1-row/arm-bounded frames only."""
    from ..queries import epoch_micros

    ev = t(spark, sf_dir, "events")
    us = epoch_micros(F.col("ts"))
    mid = ev.agg(
        F.floor((F.min(us) + F.max(us)) / F.lit(2.0)).cast("long").alias("m")
    )
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int") % 2 == 0,
        "A",
    ).otherwise("B")
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(us < F.col("m"), 1).otherwise(0)).alias("pre"),
            F.sum(F.when(us >= F.col("m"), 1).otherwise(0)).alias("post"),
        )
        .select(arm.alias("arm"), "pre", "post")
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("pre").cast("decimal(19,0)").alias("sx"),
        F.sum("post").cast("decimal(19,0)").alias("sy"),
        F.sum((F.col("pre") * F.col("pre")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("pre") * F.col("post")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("post") * F.col("post")).cast("decimal(38,0)")).alias("syy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum("pre").alias("sx_arm"),
        F.sum("post").alias("sy_arm"),
    )
    cxy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cxx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    theta = cxy / cxx
    mean_post = F.col("sy_arm").cast("double") / F.col("n_arm")
    mean_pre_arm = F.col("sx_arm").cast("double") / F.col("n_arm")
    mean_pre_all = F.col("sx").cast("double") / F.col("n")
    return arms.crossJoin(F.broadcast(mom)).select(
        "arm",
        F.col("n_arm").cast("long").alias("n_users"),
        F.col("sy_arm").cast("long").alias("sum_post"),
        mean_post.alias("mean_post"),
        (mean_post - theta * (mean_pre_arm - mean_pre_all)).alias("adjusted_mean"),
        theta.alias("theta"),
        ((cxy * cxy) / (cxx * cyy)).alias("rho_sq"),
    )


@query(
    "orders_shipping_latency_sla",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS d
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CASE WHEN d <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30d,
           CAST(SUM(CASE WHEN d <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_60d,
           CAST(SUM(CASE WHEN d <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_90d,
           CAST(SUM(CASE WHEN d <= 30 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS sla_30d_rate,
           CAST(MAX(d) AS BIGINT) AS max_days
    FROM lat GROUP BY o_orderpriority
    """,
    tags=("analytics", "sla", "join", "latency"),
)
def orders_shipping_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA attainment by priority class — the fulfilment
    dashboard's core metric: per priority, the share of lineitems shipped
    within 30/60/90 days of order placement.  Latency is an exact integer
    DAY diff on DATE-cast values (both engines count calendar days
    between dates identically; timestamp-level diffs would re-open the
    truncation-vs-boundary divergence the microsecond queries avoid).
    The lineitem⋈orders join is the SF-dominant fact join — unhinted, so
    AQE broadcasts at bench SF and switches to sort-merge at scale (the
    probed q09 behavior); everything after is a priority-bounded rollup."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    d = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", d.alias("d")
    )
    within = lambda days: F.sum((F.col("d") <= days).cast("int"))  # noqa: E731
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        within(30).cast("long").alias("n_within_30d"),
        within(60).cast("long").alias("n_within_60d"),
        within(90).cast("long").alias("n_within_90d"),
        (within(30).cast("double") / F.count(F.lit(1))).alias("sla_30d_rate"),
        F.max("d").cast("long").alias("max_days"),
    )


@query(
    "events_growth_accounting",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) / 7)
                  AS BIGINT) AS week
      FROM events
    ),
    firsts AS (SELECT user_id, MIN(week) AS first_week FROM wk GROUP BY user_id),
    seq AS (
      SELECT w.user_id, w.week, f.first_week,
             LAG(w.week) OVER (PARTITION BY w.user_id ORDER BY w.week) AS prev_week
      FROM wk w JOIN firsts f USING (user_id)
    ),
    states AS (
      SELECT week,
             SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS n_new,
             SUM(CASE WHEN prev_week = week - 1 THEN 1 ELSE 0 END) AS n_retained,
             SUM(CASE WHEN week > first_week
                       AND (prev_week IS NULL OR prev_week < week - 1)
                  THEN 1 ELSE 0 END) AS n_resurrected
      FROM seq GROUP BY week
    ),
    churn AS (
      SELECT week + 1 AS week, COUNT(*) AS active_prev
      FROM wk GROUP BY week
    ),
    nxt AS (
      SELECT s.week, s.n_new, s.n_retained, s.n_resurrected,
             COALESCE(c.active_prev, 0) - s.n_retained AS n_churned
      FROM states s LEFT JOIN churn c USING (week)
    )
    SELECT CAST(week AS BIGINT) AS week,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(n_retained AS BIGINT) AS n_retained,
           CAST(n_resurrected AS BIGINT) AS n_resurrected,
           CAST(n_churned AS BIGINT) AS n_churned
    FROM nxt
    """,
    tags=("events", "analytics", "growth-accounting", "lifecycle"),
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the Social-Capital framework every
    consumer dashboard reduces to): per week, users split into NEW (first
    active week), RETAINED (also active the week before), RESURRECTED
    (returning after a gap), and CHURNED (active last week, absent this
    week — credited to the week they went missing).  The identity
    ``active(w) = new + retained + resurrected`` and churn =
    active(w−1) − retained(w) hold exactly; tests pin both.

    Week boundary anchors to epoch Monday (1970-01-05) via integer floor
    division of day diffs — engine-portable, unlike week-of-year
    functions whose ISO conventions differ.  Shapes: one (user, week)
    dedupe, one per-user LAG window, then week-bounded frames only."""
    from ..queries import floordiv_col

    ev = t(spark, sf_dir, "events")
    week = floordiv_col(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-05"))).cast("long"),
        F.lit(7).cast("long"),
    )
    wk = ev.select("user_id", week.alias("week")).distinct()
    firsts = wk.groupBy("user_id").agg(F.min("week").alias("first_week"))
    w = Window.partitionBy("user_id").orderBy("week")
    seq = wk.join(firsts, "user_id").select(
        "week",
        "first_week",
        F.lag("week").over(w).alias("prev_week"),
    )
    states = seq.groupBy("week").agg(
        F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(F.when(F.col("prev_week") == F.col("week") - 1, 1).otherwise(0)).alias(
            "n_retained"
        ),
        F.sum(
            F.when(
                (F.col("week") > F.col("first_week"))
                & (
                    F.col("prev_week").isNull()
                    | (F.col("prev_week") < F.col("week") - 1)
                ),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    churn = wk.groupBy("week").agg(F.count(F.lit(1)).alias("active_prev")).select(
        (F.col("week") + 1).alias("week"), "active_prev"
    )
    return states.join(churn, "week", "left").select(
        F.col("week").cast("long").alias("week"),
        F.col("n_new").cast("long").alias("n_new"),
        F.col("n_retained").cast("long").alias("n_retained"),
        F.col("n_resurrected").cast("long").alias("n_resurrected"),
        (F.coalesce(F.col("active_prev"), F.lit(0)) - F.col("n_retained"))
        .cast("long")
        .alias("n_churned"),
    )


@query(
    "orders_discount_elasticity",
    oracle="""
    WITH base AS (
      SELECT p.p_brand,
             CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d,
             CAST(l.l_quantity AS BIGINT) AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    mom AS (
      SELECT p_brand,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(d) AS HUGEINT) AS sx, CAST(SUM(q) AS HUGEINT) AS sy,
             SUM(CAST(d AS HUGEINT) * d) AS sxx,
             SUM(CAST(d AS HUGEINT) * q) AS sxy,
             SUM(CAST(q AS HUGEINT) * q) AS syy
      FROM base GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_qty_per_pct,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n
           END AS intercept_qty,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN NULL
                ELSE (CAST(n * sxy - sx * sy AS DOUBLE)
                      * CAST(n * sxy - sx * sy AS DOUBLE))
                     / (CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
           END AS r_sq
    FROM mom
    """,
    tags=("analytics", "regression", "ols", "elasticity"),
)
def orders_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of order quantity on discount percentage — the
    price-response (elasticity) readout, and the regression twin of
    ``agg_corr_exact``/CUPED's moment machinery: slope = Cxy/Cxx and
    intercept from the SAME exact integer co-moments (discount becomes an
    exact integer percent via a DECIMAL(4,2) bridge — multiplying the raw
    double by 100 would manufacture 5.000000000000001), R² = ρ².
    Degenerate brands (a single discount level) emit NULLs identically.
    Moments and the n·Σxy − Σx·Σy cross-terms accumulate in
    DECIMAL(38,0) (HUGEINT in the oracle — the same integers; ADVICE r4):
    raw BIGINT would silently wrap in Spark's non-ANSI mode at large SF
    (n·syy ≈ 1.4e20 for lineitem at SF~1000) while DuckDB errors —
    the agg_corr_exact overflow discipline.  One fact join (AQE) + one
    grouped moment aggregation; the brand domain is bounded."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    base = li.join(p, li.l_partkey == p.p_partkey).select(
        "p_brand",
        (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long").alias("d"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    mom = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("d").cast("decimal(19,0)").alias("sx"),
        F.sum("q").cast("decimal(19,0)").alias("sy"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("d") * F.col("q")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("syy"),
    )
    cxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    cxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    cyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cxy.cast("double") / cxx.cast("double")
    return mom.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        F.when(cxx == 0, F.lit(None).cast("double")).otherwise(slope).alias(
            "slope_qty_per_pct"
        ),
        F.when(cxx == 0, F.lit(None).cast("double"))
        .otherwise((F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"))
        .alias("intercept_qty"),
        F.when((cxx == 0) | (cyy == 0), F.lit(None).cast("double"))
        .otherwise((cxy.cast("double") * cxy.cast("double")) / (cxx.cast("double") * cyy.cast("double")))
        .alias("r_sq"),
    )


@query(
    "revenue_share_of_parent",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    ),
    reg AS (SELECT region, SUM(rev) AS region_rev FROM rev GROUP BY region),
    tot AS (SELECT SUM(rev) AS total_rev FROM rev)
    SELECT rev.region, rev.nation,
           CAST(rev.rev AS DOUBLE) AS nation_revenue,
           CAST(rev.rev AS DOUBLE) / CAST(reg.region_rev AS DOUBLE)
             AS share_of_region,
           CAST(reg.region_rev AS DOUBLE) / CAST(tot.total_rev AS DOUBLE)
             AS region_share_of_total
    FROM rev JOIN reg USING (region) CROSS JOIN tot
    """,
    tags=("analytics", "bi", "ratio-to-report", "hierarchy"),
)
def revenue_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent (the RATIO_TO_REPORT idiom every BI
    tool ships): nation revenue as a share of its REGION, and each
    region as a share of the GRAND total — two rollup levels re-joined
    onto the leaf frame.  All revenue sums are exact decimals; the two
    shares are single divisions.  The star join is the q05 shape
    (SF-scaling sides unhinted — AQE broadcasts at bench SF, sort-merge
    at scale); everything after the first aggregation is
    nation/region-bounded, so the share joins never touch the fact
    table again."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("rev"))
    )
    reg = rev.groupBy("region").agg(F.sum("rev").alias("region_rev"))
    tot = rev.agg(F.sum("rev").alias("total_rev"))
    return (
        rev.join(reg, "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.col("rev").cast("double").alias("nation_revenue"),
            (F.col("rev").cast("double") / F.col("region_rev").cast("double")).alias(
                "share_of_region"
            ),
            (
                F.col("region_rev").cast("double") / F.col("total_rev").cast("double")
            ).alias("region_share_of_total"),
        )
    )


# ---------------------------------------------------------------------------
# cluster-robust uncertainty: delete-one-bucket jackknife

JK_BUCKETS = 16  #: content-hash user buckets (hash_bucket's native width)
JK_FP_SCALE = 1_000_000_000  #: fixed-point scale for leave-one-out means


@query(
    "events_value_jackknife_ci",
    oracle=f"""
    WITH b AS (
      SELECT (strpos('0123456789abcdef',
                     SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) AS bk,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(v) AS DECIMAL(38,2)) AS s FROM b),
    per AS (
      SELECT bk, CAST(COUNT(*) AS HUGEINT) AS nb, CAST(SUM(v) AS DECIMAL(38,2)) AS sb
      FROM b GROUP BY bk
    ),
    loo AS (
      SELECT bk,
             CAST(FLOOR((CAST(tot.s - per.sb AS DOUBLE)
                         / CAST(tot.n - per.nb AS DOUBLE))
                        * CAST({JK_FP_SCALE} AS DOUBLE)) AS HUGEINT) AS mfp
      FROM per CROSS JOIN tot
    ),
    agg1 AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nb_buckets, SUM(mfp) AS sfp FROM loo),
    var_s AS (
      SELECT SUM((agg1.nb_buckets * loo.mfp - agg1.sfp)
                 * (agg1.nb_buckets * loo.mfp - agg1.sfp)) AS var_scaled
      FROM loo CROSS JOIN agg1
    )
    SELECT CAST(tot.n AS BIGINT) AS n_events,
           CAST(agg1.nb_buckets AS BIGINT) AS n_buckets,
           CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE) AS mean_value,
           SQRT(CAST(var_s.var_scaled AS DOUBLE)
                * (CAST(agg1.nb_buckets AS DOUBLE) - 1)
                / CAST(agg1.nb_buckets AS DOUBLE))
             / (CAST(agg1.nb_buckets AS DOUBLE) * CAST({JK_FP_SCALE} AS DOUBLE))
             AS se_jackknife,
           (CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))
             - 1.96 * (SQRT(CAST(var_s.var_scaled AS DOUBLE)
                            * (CAST(agg1.nb_buckets AS DOUBLE) - 1)
                            / CAST(agg1.nb_buckets AS DOUBLE))
                       / (CAST(agg1.nb_buckets AS DOUBLE) * CAST({JK_FP_SCALE} AS DOUBLE)))
             AS ci_lo,
           (CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))
             + 1.96 * (SQRT(CAST(var_s.var_scaled AS DOUBLE)
                            * (CAST(agg1.nb_buckets AS DOUBLE) - 1)
                            / CAST(agg1.nb_buckets AS DOUBLE))
                       / (CAST(agg1.nb_buckets AS DOUBLE) * CAST({JK_FP_SCALE} AS DOUBLE)))
             AS ci_hi
    FROM tot CROSS JOIN agg1 CROSS JOIN var_s
    """,
    tags=("events", "analytics", "experimentation", "jackknife", "uncertainty"),
)
def events_value_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-robust standard error of the mean event value by
    DELETE-ONE-BUCKET JACKKNIFE over content-hash USER buckets — the
    uncertainty readout a metrics platform attaches to every dashboard
    number: per-user correlation makes the naive s/√n SE overconfident,
    and the delete-one-group jackknife (the estimator behind every
    online-experimentation platform's CIs) handles it without
    distributional assumptions or RNG.  Buckets are the deterministic
    md5 buckets of ``quality.hash_bucket`` (retry-stable, engine-
    portable; a user's events always leave together — the clustering
    requirement).

    Determinism: bucket sums are exact decimals; each leave-one-out mean
    is ONE double expression floored to JK_FP_SCALE fixed point, so the
    across-bucket variance Σ(B·m_b − Σm)² is an EXACT integer (summing
    raw double means across buckets would be order-dependent — the usual
    float-sum trap, avoided by quantize-then-sum); the SE/CI are fixed
    double expressions over those exact inputs.  Magnitudes: m_fp ~
    1e11, (B·m_fp)² ~ 1e25·B ≪ 1e38.

    Scale shape: one corpus pass to B=16 bucket partials (map-side
    combined), then everything is 16-row frames — the same
    bounded-reduce shape as the moment queries."""
    from .quality import hash_bucket

    ev = t(spark, sf_dir, "events")
    b = ev.select(
        hash_bucket(F.col("user_id")).alias("bk"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    tot = b.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("v").cast("decimal(38,2)").alias("s"),
    )
    per = b.groupBy("bk").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("nb"),
        F.sum("v").cast("decimal(38,2)").alias("sb"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "bk",
        F.floor(
            (
                (F.col("s") - F.col("sb")).cast("double")
                / (F.col("n") - F.col("nb")).cast("double")
            )
            * F.lit(float(JK_FP_SCALE))
        )
        .cast("decimal(19,0)")
        .alias("mfp"),
    )
    agg1 = loo.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("nb_buckets"),
        F.sum("mfp").alias("sfp"),
    )
    dev = F.col("nb_buckets") * F.col("mfp") - F.col("sfp")
    var_s = (
        loo.crossJoin(F.broadcast(agg1))
        .agg(F.sum((dev * dev).cast("decimal(38,0)")).alias("var_scaled"))
    )
    bN = F.col("nb_buckets").cast("double")
    se = F.sqrt(
        F.col("var_scaled").cast("double") * (bN - 1) / bN
    ) / (bN * F.lit(float(JK_FP_SCALE)))
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    return (
        tot.crossJoin(F.broadcast(agg1))
        .crossJoin(F.broadcast(var_s))
        .select(
            F.col("n").cast("long").alias("n_events"),
            F.col("nb_buckets").cast("long").alias("n_buckets"),
            mean.alias("mean_value"),
            se.alias("se_jackknife"),
            (mean - 1.96 * se).alias("ci_lo"),
            (mean + 1.96 * se).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# robust trend estimation (Theil–Sen) vs OLS


@query(
    "events_trend_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT b.x - a.x AS dx, b.y - a.y AS dy,
             CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
      FROM daily a JOIN daily b ON b.x > a.x
    ),
    ranked AS (
      SELECT slope,
             ROW_NUMBER() OVER (ORDER BY slope, dx, dy) AS rn,
             COUNT(*) OVER () AS n
      FROM pairs
    ),
    med AS (
      SELECT AVG(slope) AS theil_sen_slope,
             CAST(MAX(n) AS BIGINT) AS n_pairs
      FROM ranked
      WHERE rn IN (CAST(FLOOR((n + 1) / 2.0) AS BIGINT),
                   CAST(FLOOR((n + 2) / 2.0) AS BIGINT))
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
      FROM daily
    ),
    ols AS (
      SELECT CAST(n AS BIGINT) AS n_days,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS ols_slope
      FROM mom
    )
    SELECT ols.n_days, med.n_pairs, med.theil_sen_slope, ols.ols_slope
    FROM ols CROSS JOIN med
    """,
    tags=("events", "analytics", "robust", "trend"),
)
def events_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST trend of daily event volume — the Theil–Sen estimator
    (median of all pairwise day-to-day slopes) next to the plain OLS
    slope on the same points.  Theil–Sen has a 29% breakdown point: a
    traffic-spike day (bot burst, backfill replay, collection outage)
    drags OLS arbitrarily but moves a median-of-slopes only one rank —
    the pair of numbers IS the anomaly report (they agree ⇒ the trend is
    real; they diverge ⇒ inspect the outlier days before believing
    either).

    Scale shape: the ONLY corpus-scale stage is the daily count (one
    map-side-combined groupBy on the date).  Everything after runs on a
    frame bounded by the TIMESPAN, not the row count: d days ⇒ d(d−1)/2
    slope pairs (30 days ⇒ 435 rows here; ten YEARS of days is still
    only ~6.7M pairs).  The single-partition ranking window is over that
    bounded pair frame — the zipf-slope "survivors only" idiom, never
    over corpus rows.

    Determinism: slopes are single IEEE divisions of exact integer
    deltas (identical in both engines); the median rank runs over the
    total order (slope, dx, dy); the even-count median averages the same
    two doubles in both engines.  OLS moments ride the exact
    DECIMAL(38,0)/HUGEINT machinery (agg_corr_exact discipline), one
    final double division."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("x")
    ).agg(F.count(F.lit(1)).alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("b.x") > F.col("a.x")).select(
        (F.col("b.x") - F.col("a.x")).alias("dx"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    # bounded frame: |pairs| = days², never corpus rows (docstring)
    w = Window.orderBy("slope", "dx", "dy")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / F.lit(2.0)).cast("long"))
        | (F.col("rn") == F.floor((F.col("n") + 2) / F.lit(2.0)).cast("long"))
    ).agg(
        F.avg("slope").alias("theil_sen_slope"),
        F.max("n").cast("long").alias("n_pairs"),
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x").cast("decimal(19,0)").alias("sx"),
        F.sum("y").cast("decimal(19,0)").alias("sy"),
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    ols = mom.select(
        n.cast("long").alias("n_days"),
        (
            (n * F.col("sxy") - sx * sy).cast("double")
            / (n * F.col("sxx") - sx * sx).cast("double")
        ).alias("ols_slope"),
    )
    return ols.crossJoin(F.broadcast(med)).select(
        "n_days", "n_pairs", "theil_sen_slope", "ols_slope"
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build (the dimensional-modeling / CDC history shape)


@query(
    "orders_scd2_priority_history",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS prio, o_orderdate AS d, o_orderkey,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ),
    flagged AS (
      SELECT o_custkey, prio, d, o_orderkey,
             CASE WHEN prev IS NULL OR prev <> prio THEN 1 ELSE 0 END AS chg
      FROM seq
    ),
    ver AS (
      SELECT o_custkey, prio, d, o_orderkey,
             SUM(chg) OVER (PARTITION BY o_custkey
                            ORDER BY d, o_orderkey) AS vid
      FROM flagged
    ),
    vspan AS (
      SELECT o_custkey, prio, vid, MIN(d) AS v_start
      FROM ver GROUP BY o_custkey, prio, vid
    ),
    vint AS (
      SELECT prio, v_start,
             LEAD(v_start) OVER (PARTITION BY o_custkey ORDER BY vid) AS v_end
      FROM vspan
    )
    SELECT prio AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN v_end IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_current,
           CAST(SUM(CASE WHEN v_end IS NOT NULL
                         THEN date_diff('day', CAST(v_start AS DATE),
                                        CAST(v_end AS DATE))
                         ELSE 0 END) AS BIGINT) AS closed_days,
           CASE WHEN COUNT(*) > SUM(CASE WHEN v_end IS NULL THEN 1 ELSE 0 END)
                THEN CAST(SUM(CASE WHEN v_end IS NOT NULL
                               THEN date_diff('day', CAST(v_start AS DATE),
                                              CAST(v_end AS DATE))
                               ELSE 0 END) AS DOUBLE)
                     / (COUNT(*) - SUM(CASE WHEN v_end IS NULL THEN 1 ELSE 0 END))
                ELSE NULL END AS avg_closed_days
    FROM vint GROUP BY prio ORDER BY prio
    """,
    tags=("analytics", "scd2", "dimension", "cdc", "lakehouse"),
)
def orders_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 dimension build — the slowly-changing-dimension history
    every warehouse maintains: treat each customer's order stream as a
    change feed for their "current priority" attribute, open a new
    VERSION whenever the attribute changes (change flag → running sum =
    version id — the gaps-and-islands idiom), stamp each version with
    [effective_from, effective_to) validity via LEAD, and leave the last
    version open (the ``is_current`` row).  Reported as the per-priority
    version census: how many versions ever existed, how many are current,
    and the exact closed-version dwell time in days — the shape audit
    for dimension-table bloat before a backfill.

    Scale shape: every window PARTITIONs BY the dimension's natural key
    (o_custkey) — one hash exchange that Spark reuses across the lag,
    the running sum, and the lead (same partitioning all the way down);
    per-key sequences are short.  The final rollup is
    attribute-bounded (5 rows).  No global window anywhere.

    Determinism: version boundaries use the total per-key order
    (o_orderdate, o_orderkey) so same-day orders sequence identically in
    both engines; dwell time is integer days on DATE casts (NTZ
    wall-clock, no timezone); the single double division is guarded and
    identically associated on both sides."""
    o = t(spark, sf_dir, "orders")
    kw = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("d"),
        "o_orderkey",
        F.lag("o_orderpriority").over(kw).alias("prev"),
    )
    flagged = seq.withColumn(
        "chg",
        F.when(
            F.col("prev").isNull() | (F.col("prev") != F.col("prio")), 1
        ).otherwise(0),
    )
    vw = (
        Window.partitionBy("o_custkey")
        .orderBy("d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ver = flagged.withColumn("vid", F.sum("chg").over(vw))
    vspan = ver.groupBy("o_custkey", "prio", "vid").agg(F.min("d").alias("v_start"))
    lw = Window.partitionBy("o_custkey").orderBy("vid")
    vint = vspan.select(
        "prio", "v_start", F.lead("v_start").over(lw).alias("v_end")
    )
    closed_days = F.sum(
        F.when(
            F.col("v_end").isNotNull(),
            F.datediff(F.col("v_end").cast("date"), F.col("v_start").cast("date")),
        ).otherwise(0)
    )
    n_current = F.sum(F.when(F.col("v_end").isNull(), 1).otherwise(0))
    n_versions = F.count(F.lit(1))
    return (
        vint.groupBy(F.col("prio").alias("priority"))
        .agg(
            n_versions.cast("long").alias("n_versions"),
            n_current.cast("long").alias("n_current"),
            closed_days.cast("long").alias("closed_days"),
            F.when(
                n_versions > n_current,
                closed_days.cast("double") / (n_versions - n_current),
            ).alias("avg_closed_days"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# SRM — sample-ratio mismatch, the experiment-health gate that runs BEFORE
# any readout is trusted

SRM_FP = 1_000_000  #: fixed-point scale for the chi-square statistic
#: chi-square critical value at alpha=0.001, df=1 (the standard SRM
#: alert threshold — SRM checks run at strict alpha because a true
#: mismatch invalidates the whole experiment), in SRM_FP fixed point
SRM_CRIT_FP = 10_828_000
#: the planted triggering bug: arm-B exposures for even user_ids are
#: "lost" (a one-sided logging failure — the classic SRM root cause).
#: The loss is HALF the arm: at the strict SRM alpha the chi-square
#: needs a large effect to clear 10.828 on corpora of hundreds of
#: users (at sf0.01 a 20%% loss reads chi2 ≈ 5 — undetectable), and a
#: positive control that doesn't fire is no control at all
SRM_BUG_MOD = 2


@query(
    "events_ab_srm_check",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN (strpos('0123456789abcdef',
                               SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm
      FROM events GROUP BY user_id
    ),
    scen AS (
      SELECT 'a_clean' AS scenario,
             SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b
      FROM assign
      UNION ALL
      SELECT 'b_exposure_bug',
             SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END),
             SUM(CASE WHEN arm = 'B' AND user_id % {SRM_BUG_MOD} <> 0
                      THEN 1 ELSE 0 END)
      FROM assign
    )
    SELECT scenario,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(ROUND(
             (CAST(n_a - n_b AS DOUBLE) * (n_a - n_b)) / (n_a + n_b)
             * {SRM_FP}, 0) AS BIGINT) AS chi2_fp,
           CAST(CASE WHEN ROUND(
             (CAST(n_a - n_b AS DOUBLE) * (n_a - n_b)) / (n_a + n_b)
             * {SRM_FP}, 0) > {SRM_CRIT_FP} THEN 1 ELSE 0 END
             AS BIGINT) AS srm_flag
    FROM scen ORDER BY scenario
    """,
    tags=("events", "analytics", "experimentation", "quality"),
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch (SRM) — the health check every experiment
    platform runs before showing a readout: under the 50/50 design, do
    the OBSERVED arm sizes fit?  A mismatch (chi-square above the
    alpha=0.001 critical value 10.828) means exposure logging or
    triggering is broken and the experiment readout is invalid no
    matter how significant it looks.  Two scenarios in one frame: the
    real md5 assignment (must NOT flag — it is deterministic and
    near-exactly 50/50), and a PLANTED one-sided exposure bug (arm-B
    logs lost for user_id % {SRM_BUG_MOD} == 0 — must flag).  The
    planted row is the positive control proving the detector detects;
    the clean row passing is the detector exonerating the real split.

    For equal expected counts E = (n_a+n_b)/2 the two-cell chi-square
    collapses to (n_a−n_b)²/(n_a+n_b) — one rational double over exact
    integer counts, quantized to SRM_FP fixed point before the
    threshold comparison (the zipf/heaps ROUND discipline).

    Scale shape: one per-user aggregation (map-side combinable) then a
    2-row reduce; nothing corpus-sized past the first shuffle — same
    plan family as `events_ab_test_analysis`."""
    ev = t(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int") % 2 == 0,
        "A",
    ).otherwise("B")
    assign = ev.groupBy("user_id").agg(F.lit(1).alias("one")).select(
        "user_id", arm.alias("arm")
    )
    is_a = F.when(F.col("arm") == "A", 1).otherwise(0)
    is_b = F.when(F.col("arm") == "B", 1).otherwise(0)
    is_b_logged = F.when(
        (F.col("arm") == "B") & (F.col("user_id") % SRM_BUG_MOD != 0), 1
    ).otherwise(0)
    clean = assign.agg(
        F.lit("a_clean").alias("scenario"),
        F.sum(is_a).alias("n_a"),
        F.sum(is_b).alias("n_b"),
    )
    bugged = assign.agg(
        F.lit("b_exposure_bug").alias("scenario"),
        F.sum(is_a).alias("n_a"),
        F.sum(is_b_logged).alias("n_b"),
    )
    chi2_fp = F.round(
        ((F.col("n_a") - F.col("n_b")).cast("double")
         * (F.col("n_a") - F.col("n_b")))
        / (F.col("n_a") + F.col("n_b"))
        * SRM_FP,
        0,
    ).cast("long")
    return (
        clean.unionAll(bugged)
        .select(
            "scenario",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            chi2_fp.alias("chi2_fp"),
            F.when(chi2_fp > SRM_CRIT_FP, 1)
            .otherwise(0)
            .cast("long")
            .alias("srm_flag"),
        )
        .orderBy("scenario")
    )


# ---------------------------------------------------------------------------
# snapshot AS OF — the READ-side lakehouse primitive completing the trio:
# pipeline_cdc_merge (write), orders_scd2_priority_history (history),
# orders_snapshot_as_of (point-in-time read)

SNAPSHOT_AS_OF = "1995-06-30"  #: the reconstruction timestamp (mid-corpus)


@query(
    "orders_snapshot_as_of",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn
      FROM orders WHERE o_orderdate <= DATE '{SNAPSHOT_AS_OF}'
    )
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS latest_effective_date
    FROM ranked WHERE rn = 1
    GROUP BY status, priority
    ORDER BY status, priority
    """,
    tags=("analytics", "lakehouse", "time-travel", "cdc"),
)
def orders_snapshot_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT AS OF — point-in-time reconstruction from a change log:
    each customer's state at {SNAPSHOT_AS_OF} is their LATEST order at
    or before it (latest-wins over the change feed, ties broken by
    orderkey like every CDC consumer here).  This is the read-side
    lakehouse primitive — `pipeline_cdc_merge` applies changes,
    `orders_scd2_priority_history` materializes full validity history,
    and this answers "what did the table look like at T" WITHOUT a
    maintained history table: filter to ≤ T, latest-wins per key.
    Output is the state census at T (status × priority cohorts), the
    frame a backfill audit diffs against the SCD2 reconstruction.

    Scale shape: the date filter pushes to the scan (only pre-T files
    are read under date partitioning at 100 TB); latest-wins is one
    ROW_NUMBER window on the natural key — a single o_custkey exchange,
    short per-key sequences; the census rollup is (status × priority)
    bounded.

    Determinism: tie order (o_orderdate, o_orderkey) descending; dates
    rendered as strings; counts exact."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") <= F.lit(SNAPSHOT_AS_OF).cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        o.select(
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            "o_orderdate",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        latest.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.min("o_custkey").cast("long").alias("min_custkey"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias(
                "latest_effective_date"
            ),
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# snapshot DIFF — time travel between two versions (the Delta CDF /
# Iceberg changelog read): what changed between the table AS OF T1 and
# AS OF T2

SNAPSHOT_DIFF_T1 = "1996-07-01"  #: earlier version timestamp
SNAPSHOT_DIFF_T2 = "1998-07-01"  #: later version timestamp


def _state_at_sql(alias: str, ts: str) -> str:
    return f"""{alias} AS (
      SELECT o_custkey, o_orderpriority AS prio FROM (
        SELECT o_custkey, o_orderpriority,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC)
                 AS rn
        FROM orders WHERE o_orderdate <= DATE '{ts}'
      ) WHERE rn = 1
    )"""


@query(
    "orders_snapshot_diff",
    oracle=f"""
    WITH {_state_at_sql("s1", SNAPSHOT_DIFF_T1)},
    {_state_at_sql("s2", SNAPSHOT_DIFF_T2)}
    SELECT CAST(s2.o_custkey AS BIGINT) AS o_custkey,
           s1.prio AS prio_t1,
           s2.prio AS prio_t2,
           CASE WHEN s1.o_custkey IS NULL THEN 'added'
                WHEN s1.prio <> s2.prio THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM s2 LEFT JOIN s1 ON s1.o_custkey = s2.o_custkey
    """,
    tags=("analytics", "lakehouse", "time-travel", "cdc", "diff"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF — the version-to-version change feed (what Delta
    exposes as Change Data Feed and Iceberg as the changelog scan)
    derived from the raw change log with NO maintained history table:
    reconstruct the per-customer state at {SNAPSHOT_DIFF_T1} and at
    {SNAPSHOT_DIFF_T2} (latest-wins, the `orders_snapshot_as_of`
    primitive, shared `_state_at` body), full-key join, classify every
    key live at T2 as added / changed / unchanged.  'removed' cannot
    occur on an append-only feed — a MERGE-maintained table would get
    it from the same join's other anti side.  This is the read that
    prices an incremental refresh: |added| + |changed| is exactly the
    row set a downstream MV must reprocess.

    Scale shape: both snapshot scans push their date filter to the
    scan; latest-wins is one ROW_NUMBER window per snapshot on the
    SAME natural key, so the diff join reuses the o_custkey
    partitioning end-to-end (one exchange total under AQE); row-level
    output, no driver math.

    Determinism: tie order (o_orderdate, o_orderkey) DESC in both
    engines; the diff is pure column equality on exact strings."""

    def state_at(ts: str) -> DataFrame:
        o = t(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") <= F.lit(ts).cast("date")
        )
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
        )
        return (
            o.select(
                "o_custkey",
                F.col("o_orderpriority").alias("prio"),
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    s1 = state_at(SNAPSHOT_DIFF_T1).select(
        F.col("o_custkey"), F.col("prio").alias("prio_t1")
    )
    s2 = state_at(SNAPSHOT_DIFF_T2).select(
        F.col("o_custkey"), F.col("prio").alias("prio_t2")
    )
    return s2.join(s1, "o_custkey", "left").select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "prio_t1",
        "prio_t2",
        F.when(F.col("prio_t1").isNull(), F.lit("added"))
        .when(F.col("prio_t1") != F.col("prio_t2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U — the RANK-based A/B readout (no normality assumption)


@query(
    "events_ab_mann_whitney",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN (strpos('0123456789abcdef',
                               SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS m
      FROM events GROUP BY user_id
    ),
    vals AS (
      SELECT m, COUNT(*) AS cnt,
             SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cnt_b
      FROM per_user GROUP BY m
    ),
    pre AS (
      SELECT m, cnt, cnt_b,
             COALESCE(SUM(cnt) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM vals
    ),
    agg AS (
      SELECT SUM(cnt) AS n,
             SUM(cnt_b) AS n_b,
             SUM(cnt) - SUM(cnt_b) AS n_a,
             SUM(cnt_b * (2 * before + cnt + 1)) AS r2_b,
             SUM(cnt * cnt * cnt - cnt) AS tie_t
      FROM pre
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(r2_b - n_b * (n_b + 1) AS BIGINT) AS u2_b,
           CAST(tie_t AS BIGINT) AS tie_correction,
           CASE WHEN n_a = 0 OR n_b = 0
                     OR (n + 1) - CAST(tie_t AS DOUBLE) / (n * (n - 1.0)) <= 0
                THEN NULL
                ELSE (CAST(r2_b - n_b * (n_b + 1) AS DOUBLE) / 2
                      - CAST(n_a AS DOUBLE) * n_b / 2)
                     / SQRT((CAST(n_a AS DOUBLE) * n_b / 12.0)
                            * ((n + 1) - CAST(tie_t AS DOUBLE) / (n * (n - 1.0))))
           END AS z_score
    FROM agg
    """,
    tags=("events", "analytics", "experimentation", "ab-test", "nonparametric"),
)
def events_ab_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U — the NONPARAMETRIC two-arm readout: rank every
    user's metric (total event value, exact cents) in the pooled sample,
    sum arm-B ranks, U = R_B − n_B(n_B+1)/2, tie-corrected normal
    approximation.  This is the test the parametric readouts
    (`events_ab_test_analysis`'s two-proportion z,
    `events_ab_cuped`) can't replace when the metric is heavy-tailed —
    revenue per user almost always is, and a few whales can swing a
    means-based test while the rank test stays calibrated.

    Distributed shape: ranking WITHOUT a global sort — group users by
    exact metric value (distinct-value frame), then
    ``distributed_prefix_sum`` over the value order (range exchange +
    bounded per-partition offsets, the `global_rank` idiom), so the
    average rank of a tie group is derived per value:
    2·rank̄ = 2·(count below) + t + 1, kept as INTEGER double-ranks.
    One per-user aggregation + one value-grouped frame + one bounded
    reduce.

    Determinism: metric is exact integer cents (decimal sum × 100);
    double-ranks, U×2 and the tie term Σ(t³−t) are exact integers; z is
    one fixed double expression over those integers, NULL-guarded on
    degenerate arms or zero variance."""
    from .layout import distributed_prefix_sum

    ev = t(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int") % 2 == 0,
        "A",
    ).otherwise("B")
    per_user = ev.groupBy("user_id").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("m")
    ).select(arm.alias("arm"), "m")
    vals = per_user.groupBy("m").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("cnt_b"),
    )
    pre = distributed_prefix_sum(vals, ["m"], "cnt", "run").withColumn(
        "before", F.col("run") - F.col("cnt")
    )
    agg = pre.agg(
        F.sum("cnt").alias("n"),
        F.sum("cnt_b").alias("n_b"),
        (F.sum("cnt") - F.sum("cnt_b")).alias("n_a"),
        F.sum(
            F.col("cnt_b") * (2 * F.col("before") + F.col("cnt") + 1)
        ).alias("r2_b"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie_t"),
    )
    nd = F.col("n").cast("double")
    var_core = (nd + 1) - F.col("tie_t").cast("double") / (
        F.col("n") * (nd - 1.0)
    )
    u2 = F.col("r2_b") - F.col("n_b") * (F.col("n_b") + 1)
    z = (
        u2.cast("double") / 2
        - F.col("n_a").cast("double") * F.col("n_b") / 2
    ) / F.sqrt(
        (F.col("n_a").cast("double") * F.col("n_b") / 12.0) * var_core
    )
    degenerate = (
        (F.col("n_a") == 0) | (F.col("n_b") == 0) | (var_core <= 0)
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2.cast("long").alias("u2_b"),
        F.col("tie_t").cast("long").alias("tie_correction"),
        F.when(degenerate, F.lit(None).cast("double")).otherwise(z).alias(
            "z_score"
        ),
    )


# ---------------------------------------------------------------------------
# difference-in-differences — the panel estimator completing the
# experimentation family (z-test: levels; CUPED: prediction adjustment;
# DiD: per-user fixed effects under parallel trends)


@query(
    "events_diff_in_diff",
    oracle="""
    WITH mid AS (
      SELECT CAST(FLOOR((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) / CAST(2 AS DOUBLE))
                  AS BIGINT) AS m
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             CASE WHEN (strpos('0123456789abcdef',
                               SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             SUM(CASE WHEN epoch_us(ts) >= mid.m THEN 1 ELSE 0 END)
               - SUM(CASE WHEN epoch_us(ts) < mid.m THEN 1 ELSE 0 END) AS d
      FROM events CROSS JOIN mid
      GROUP BY user_id
    ),
    arms AS (
      SELECT arm,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(d) AS HUGEINT) AS sd,
             SUM(CAST(d AS HUGEINT) * d) AS sdd
      FROM per_user GROUP BY arm
    ),
    w AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
        MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
        MAX(CASE WHEN arm = 'A' THEN sd END) AS sd_a,
        MAX(CASE WHEN arm = 'B' THEN sd END) AS sd_b,
        MAX(CASE WHEN arm = 'A' THEN sdd END) AS sdd_a,
        MAX(CASE WHEN arm = 'B' THEN sdd END) AS sdd_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(sd_a AS DOUBLE) / n_a AS mean_diff_a,
           CAST(sd_b AS DOUBLE) / n_b AS mean_diff_b,
           CAST(sd_b AS DOUBLE) / n_b - CAST(sd_a AS DOUBLE) / n_a
             AS did_estimate,
           (CAST(sd_b AS DOUBLE) / n_b - CAST(sd_a AS DOUBLE) / n_a)
             / SQRT(
                 CAST(n_a * sdd_a - sd_a * sd_a AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))
                 + CAST(n_b * sdd_b - sd_b * sd_b AS DOUBLE)
                   / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1))
               ) AS z_score
    FROM w
    """,
    tags=("events", "analytics", "experimentation", "diff-in-diff"),
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES readout — the panel estimator that
    completes the experimentation family: `events_ab_test_analysis`
    compares LEVELS (biased if arms differ at baseline), `events_ab_cuped`
    adjusts by a pre-period PREDICTION; DiD differences each user against
    THEMSELVES (post − pre activity), so any time-constant user effect
    cancels exactly, and compares the per-user changes across arms —
    identification needs only parallel trends.  Arm = the shared md5
    assignment; pre/post = the corpus time midpoint (CUPED's anchor,
    so the two adjusted readouts are directly comparable).

    Everything before the final expressions is exact: per-user change d
    is an integer, per-arm moments (n, Σd, Σd²) accumulate in
    DECIMAL(38,0)/HUGEINT (the agg_corr_exact discipline — n·Σd² would
    wrap raw BIGINT at large SF), and the estimate / Welch z-score are
    fixed double trees over those six exact numbers — hash-stable.
    Scale shape: one per-user shuffle, then a 2-row reduce; nothing
    corpus-sized after the first aggregate."""
    from ..queries import epoch_micros

    ev = t(spark, sf_dir, "events")
    us = epoch_micros(F.col("ts"))
    mid = ev.agg(
        F.floor((F.min(us) + F.max(us)) / F.lit(2.0)).cast("long").alias("m")
    )
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int") % 2 == 0,
        "A",
    ).otherwise("B")
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.when(us >= F.col("m"), 1).otherwise(0))
                - F.sum(F.when(us < F.col("m"), 1).otherwise(0))
            ).alias("d")
        )
        .select(arm.alias("arm"), "d")
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("d").cast("decimal(19,0)").alias("sd"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,0)")).alias("sdd"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "A", F.col("sd"))).alias("sd_a"),
        F.max(F.when(F.col("arm") == "B", F.col("sd"))).alias("sd_b"),
        F.max(F.when(F.col("arm") == "A", F.col("sdd"))).alias("sdd_a"),
        F.max(F.when(F.col("arm") == "B", F.col("sdd"))).alias("sdd_b"),
    )
    mean_a = F.col("sd_a").cast("double") / F.col("n_a").cast("double")
    mean_b = F.col("sd_b").cast("double") / F.col("n_b").cast("double")
    var_a = (F.col("n_a") * F.col("sdd_a") - F.col("sd_a") * F.col("sd_a")).cast(
        "double"
    ) / (
        F.col("n_a").cast("double")
        * F.col("n_a").cast("double")
        * (F.col("n_a").cast("double") - 1)
    )
    var_b = (F.col("n_b") * F.col("sdd_b") - F.col("sd_b") * F.col("sd_b")).cast(
        "double"
    ) / (
        F.col("n_b").cast("double")
        * F.col("n_b").cast("double")
        * (F.col("n_b").cast("double") - 1)
    )
    return w.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        mean_a.alias("mean_diff_a"),
        mean_b.alias("mean_diff_b"),
        (mean_b - mean_a).alias("did_estimate"),
        ((mean_b - mean_a) / F.sqrt(var_a + var_b)).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# position-based (U-shaped) multi-touch attribution — the credit model
# that replaces last-touch once a pipeline can afford the touch join

MT_FP = 1_000_000  #: fixed-point credit scale (a conversion = 1.0 = MT_FP)
MT_EDGE_FP = 400_000  #: first- and last-touch credit when n >= 3
MT_MID_FP = 200_000  #: middle-touch pool when n >= 3
#: STRUCTURAL fan-out caps (VERDICT r7 #6): without them the user-keyed
#: touch join is quadratic in per-user activity — fine on real corpora
#: (bounded journeys) but an assumed bound, not a structural one, and
#: replicated probe corpora inflate it (3.2x at 10x, BASELINE.md r7).
#: Production attribution systems rate-limit exactly this way.
MT_USER_WEEK_CAP = 64  #: attributable touches kept per user per week (latest)
MT_MAX_TOUCH = 32  #: U-shape computed over the LAST n touches per conversion
MT_WEEK_US = 7 * 86_400 * 1_000_000  #: the week bucket for the rate cap


@query(
    "events_attribution_position_based",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id, event_id AS conv_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ),
    touches_all AS (
      SELECT user_id, event_id AS touch_id, ts AS tts, event_type AS channel,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, epoch_us(ts) // {MT_WEEK_US}
               ORDER BY ts DESC, event_id DESC) AS wr
      FROM events WHERE event_type IN ('click', 'view')
    ),
    touches AS (
      SELECT user_id, touch_id, tts, channel FROM touches_all
      WHERE wr <= {MT_USER_WEEK_CAP}
    ),
    joined0 AS (
      SELECT p.conv_id, p.value, t.channel, t.tts, t.touch_id,
             ROW_NUMBER() OVER (PARTITION BY p.conv_id
                                ORDER BY t.tts DESC, t.touch_id DESC) AS rd,
             COUNT(*) OVER (PARTITION BY p.conv_id) AS n_pre
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND (t.tts < p.pts OR (t.tts = p.pts AND t.touch_id < p.conv_id))
       AND date_diff('microsecond', t.tts, p.pts) <= {ATTRIB_WINDOW_US}
    ),
    joined AS (
      SELECT conv_id, value, channel, tts, touch_id,
             LEAST(n_pre, {MT_MAX_TOUCH}) - rd + 1 AS rn,
             LEAST(n_pre, {MT_MAX_TOUCH}) AS n_touch
      FROM joined0 WHERE rd <= {MT_MAX_TOUCH}
    ),
    credited AS (
      SELECT channel, value,
             CASE WHEN n_touch = 1 THEN {MT_FP}
                  WHEN n_touch = 2 THEN {MT_FP} // 2
                  WHEN rn = 1 OR rn = n_touch THEN {MT_EDGE_FP}
                  ELSE {MT_MID_FP} // (n_touch - 2) END AS w
      FROM joined
    ),
    organic AS (
      SELECT 'organic' AS channel, p.value, {MT_FP} AS w
      FROM purchases p
      WHERE NOT EXISTS (SELECT 1 FROM joined j WHERE j.conv_id = p.conv_id)
    ),
    allc AS (SELECT * FROM credited UNION ALL SELECT * FROM organic)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
           CAST(SUM(w) AS BIGINT) AS credit_fp,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) * w)
                AS BIGINT) AS revenue_credit_microcents
    FROM allc GROUP BY channel
    """,
    tags=("events", "analytics", "attribution", "multi-touch"),
)
def events_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION-BASED (U-shaped) multi-touch attribution — the upgrade
    path from `events_attribution_last_touch` once the touch join is
    affordable: every click/view strictly before a purchase (same tie
    rule as last-touch: (ts, event_id) order) inside the 7-day window
    earns credit — 100% for a lone touch, 50/50 for two, else 40%
    first + 40% last + the middles sharing 20% equally (the industry
    U-shape).  Purchases with no in-window touch stay 'organic' at full
    credit.  Credits are integer fixed-point ({MT_FP} = one conversion;
    middle shares by exact DIV), revenue credit is cents × weight —
    exact integers end-to-end, no float anywhere.

    Scale shape (VERDICT r7 #6 — the bound is STRUCTURAL, not assumed):
    touches are rate-capped to the latest MT_USER_WEEK_CAP per
    (user, epoch-week) BEFORE the join, and the U-shape is computed
    over the last MT_MAX_TOUCH touches per conversion after it — both
    caps applied identically in the oracle, so the per-purchase join
    fan-out is <= 2 weeks x the rate cap whatever the corpus's per-user
    activity (replicated probe corpora inflate exactly this, 3.2x at
    10x pre-cap).  The join itself is user-keyed (one shuffle each
    side); ranking is per-conversion (partition = conv_id).  The
    organic set is an anti-join reusing the joined frame.  Output is
    channel-bounded."""
    from ..queries import dec

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("pts"),
        "value",
    )
    from ..queries import epoch_micros, floordiv_col

    w_week = Window.partitionBy(
        "t_user", floordiv_col(epoch_micros(F.col("tts")), F.lit(MT_WEEK_US))
    ).orderBy(F.col("tts").desc(), F.col("touch_id").desc())
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("user_id").alias("t_user"),
            F.col("event_id").alias("touch_id"),
            F.col("ts").alias("tts"),
            F.col("event_type").alias("channel"),
        )
        .withColumn("wr", F.row_number().over(w_week))
        .filter(F.col("wr") <= MT_USER_WEEK_CAP)  # per-user-week rate cap
        .drop("wr")
    )
    # (user, week-bucket) composite join key: the 7-day lookback spans at
    # most two epoch-week buckets, so each touch is exploded into the two
    # buckets it can serve and the join runs on the FINER key — per-group
    # pair evaluations drop from (user purchases x user touches) to
    # (user-week purchases x <= 2 weeks x rate cap), and the shuffle
    # distributes on (user, week) instead of piling a heavy user on one
    # task.  A (purchase, touch) pair matches exactly one bucket value,
    # so no dedup is needed; the oracle keeps the plain user-keyed join —
    # identical semantics, this is physical only.
    # COMPLETENESS GUARD (ADVICE r8): exploding into {tweek, tweek+1} is
    # exhaustive only while the lookback fits one week bucket — widening
    # ATTRIB_WINDOW_US past MT_WEEK_US without growing the explosion
    # would silently drop qualifying pairs beyond tweek+1.
    assert ATTRIB_WINDOW_US <= MT_WEEK_US, (
        "widen the jweek explosion to ceil(ATTRIB_WINDOW_US/MT_WEEK_US)+1 "
        "buckets before widening the attribution window"
    )
    tweek = floordiv_col(epoch_micros(F.col("tts")), F.lit(MT_WEEK_US))
    touches2 = touches.withColumn(
        "jweek", F.explode(F.array(tweek, tweek + F.lit(1)))
    )
    pweek = floordiv_col(epoch_micros(F.col("pts")), F.lit(MT_WEEK_US))
    joined0 = purchases.withColumn("pweek", pweek).join(
        touches2,
        (F.col("jweek") == F.col("pweek"))
        & (F.col("t_user") == F.col("user_id"))
        & (
            (F.col("tts") < F.col("pts"))
            | ((F.col("tts") == F.col("pts")) & (F.col("touch_id") < F.col("conv_id")))
        )
        & (
            F.timestamp_diff("MICROSECOND", F.col("tts"), F.col("pts"))
            <= F.lit(ATTRIB_WINDOW_US)
        ),
    )
    # one descending window gives the recency rank AND the pre-cap count;
    # the ascending U-shape position is then pure arithmetic on the kept
    # rows — no second or third window sort over the joined frame
    w_recency = Window.partitionBy("conv_id").orderBy(
        F.col("tts").desc(), F.col("touch_id").desc()
    )
    n_kept = F.least(F.col("n_pre"), F.lit(MT_MAX_TOUCH))
    # CUT the ranked frame (≤ MT_MAX_TOUCH rows per conversion —
    # output-scale): its two consumers (the credit projection and the
    # organic anti-join's build side) otherwise each re-ran the
    # purchase×touch join + recency window (r14, guide §1.2)
    ranked = cut_lineage(
        joined0.select(
            "conv_id",
            "value",
            "channel",
            F.row_number().over(w_recency).alias("rd"),
            F.count(F.lit(1)).over(w_recency.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )).alias("n_pre"),
        )
        .filter(F.col("rd") <= MT_MAX_TOUCH)  # per-conversion touch cap
        .select(
            "conv_id",
            "value",
            "channel",
            (n_kept - F.col("rd") + 1).alias("rn"),
            n_kept.alias("n_touch"),
        )
    )
    joined = ranked  # organic anti-join below needs the kept conv ids
    weight = (
        F.when(F.col("n_touch") == 1, F.lit(MT_FP))
        .when(F.col("n_touch") == 2, F.lit(MT_FP // 2))
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("n_touch")),
            F.lit(MT_EDGE_FP),
        )
        .otherwise(F.expr(f"{MT_MID_FP} DIV (n_touch - 2)"))
    )
    credited = ranked.select("channel", "value", weight.alias("w"))
    organic = purchases.join(
        joined.select("conv_id").distinct(), "conv_id", "left_anti"
    ).select(F.lit("organic").alias("channel"), "value", F.lit(MT_FP).alias("w"))
    allc = credited.unionAll(organic)
    cents = (dec(F.col("value")) * 100).cast("long")
    return allc.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touchpoints"),
        F.sum("w").cast("long").alias("credit_fp"),
        F.sum(cents * F.col("w")).cast("long").alias("revenue_credit_microcents"),
    )
