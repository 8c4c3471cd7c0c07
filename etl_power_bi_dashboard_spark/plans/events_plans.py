"""Event-time windowed aggregation plans over the `events` table — the
batch twins of the Structured Streaming surface in ``streaming/events.py``
(same logical semantics; ``readStream`` + watermark swaps in for the batch
scan).

Scale notes: all three shapes are single-shuffle groupBys on
(window, key); Spark's `window`/`session_window` are native Catalyst
operators (no UDFs). Session windows at 100 TB shuffle by user_id — the
natural partitioning key for clickstream data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import Query, load_events


def _value_dec() -> F.Column:
    return F.col("value").cast("decimal(18,2)")


def q_e1_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event_type: count + exact sum."""
    ev = load_events(spark, sf_dir)
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_value_dec()).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SQL_E1 = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def q_e2_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour long, every 30 minutes (each event lands in 2)."""
    ev = load_events(spark, sf_dir)
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_value_dec()).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# each event belongs to windows starting at its 30-min bucket and 30 min
# earlier (window length 1h, slide 30m, epoch-aligned like Spark)
SQL_E2 = """
WITH exploded AS (
    SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
    FROM events
)
SELECT window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM exploded
GROUP BY 1
"""


def q_e3_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 1-hour inactivity gap.

    Spark's native ``session_window`` (window end = last event + gap). The
    oracle reproduces it with gaps-and-islands SQL.
    """
    ev = load_events(spark, sf_dir)
    sw = F.session_window("ts", "1 hour")
    return (
        ev.groupBy(sw.alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_value_dec()).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


SQL_E3 = """
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL '1 hour'
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '1 hour' AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_no
"""


def q_e5_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced conversion funnel: signup → first click after signup →
    first purchase after that click, per user; output stage counts.

    Stage timestamps are conditional MINs over one scan + one shuffle per
    sequencing level (each level's filter depends on the previous MIN, so
    levels can't collapse into one aggregate — but every level is a keyed
    aggregate on user_id, and AQE reuses the exchange). Timestamps are
    exact integer microseconds on both engines, so the strict-inequality
    sequencing is deterministic.
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    signup = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    click = (
        ev.filter(F.col("event_type") == "click")
        .join(signup, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(click, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        signup.agg(F.count("*").alias("n_signup"))
        .crossJoin(click.agg(F.count("*").alias("n_click_after_signup")))
        .crossJoin(purchase.agg(F.count("*").alias("n_purchase_after_click")))
    )


SQL_E5 = """
WITH signup AS (
    SELECT user_id, MIN(ts) AS signup_ts FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), click AS (
    SELECT e.user_id, MIN(e.ts) AS click_ts
    FROM events e JOIN signup s ON e.user_id = s.user_id
    WHERE e.event_type = 'click' AND e.ts > s.signup_ts
    GROUP BY e.user_id
), purchase AS (
    SELECT e.user_id, MIN(e.ts) AS purchase_ts
    FROM events e JOIN click c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
    GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM signup) AS n_signup,
       (SELECT COUNT(*) FROM click) AS n_click_after_signup,
       (SELECT COUNT(*) FROM purchase) AS n_purchase_after_click
"""


def q_e6_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the Monday-week of
    their first event; for each (cohort_week, weeks-since-cohort) cell,
    the count of distinct cohort members active that week.

    Both the first-event agg and the activity⨝cohort join shuffle on
    user_id — one key, reused across stages (AQE plans the second as a
    co-partitioned join). Week offsets divide exact Monday-aligned day
    diffs by 7, so the matrix is engine-portable."""
    ev = load_events(spark, sf_dir)
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        # timestamp output (e1-style): DATE reprs differ between pandas
        # bridges (datetime.date vs datetime64), timestamps agree
        .select(
            F.col("cohort_week").cast("timestamp").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


SQL_E6 = """
WITH cohort AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY 1
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
    FROM events
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(datediff('day', cohort_week, week) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM activity JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


def q_e7_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly detection: events whose value is > 2 sample
    standard deviations from that user's mean — the metric-monitoring /
    data-validation staple.

    Moments come from DECIMAL power sums over a per-user window (the a12
    trick: var = (n·Σx² − (Σx)²)/(n·(n−1)) with Σx, Σx² exact), so
    partial-aggregation order can't perturb them; the z-score is then a
    handful of identical IEEE ops on both engines. One shuffle on
    user_id — the window and the verdict share it; users with < 2 events
    or zero variance are excluded (z undefined). The zero-variance
    exclusion is an EXPLICIT ``n·s2 − s1² > 0`` filter on both engines —
    relying on 0/0 → NULL division semantics would break under DuckDB
    builds with ``ieee_floating_point_ops=true`` (0/0 → NaN, and DuckDB
    orders NaN above every value, so |z| > 2 would pass oracle-side
    only).
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    x = _value_dec()
    stats = ev.select(
        "user_id",
        "event_id",
        "value",
        F.count("*").over(w).alias("n"),
        F.sum(x).over(w).cast("double").alias("s1"),
        F.sum(x * x).over(w).cast("double").alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    var = (n * F.col("s2") - F.col("s1") * F.col("s1")) / (n * (n - F.lit(1.0)))
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        stats.filter(
            (F.col("n") > 1)
            & (n * F.col("s2") - F.col("s1") * F.col("s1") > 0)
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.0)
        .select("user_id", "event_id", "value", "z")
    )


SQL_E7 = """
WITH s AS (
    SELECT user_id, event_id, value,
           COUNT(*) OVER w AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
           CAST(SUM(CAST(value AS DECIMAL(18,2))
                    * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s2
    FROM events
    WINDOW w AS (PARTITION BY user_id)
), z AS (
    SELECT user_id, event_id, value,
           (value - s1 / CAST(n AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * s2 - s1 * s1)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS z
    FROM s
    WHERE n > 1
      AND CAST(n AS DOUBLE) * s2 - s1 * s1 > 0
)
SELECT user_id, event_id, value, z FROM z WHERE ABS(z) > 2.0
"""


QUERIES: list[Query] = [
    Query("e1_tumbling_hourly", q_e1_tumbling_hourly, SQL_E1, "tumbling window agg"),
    Query("e5_funnel", q_e5_funnel, SQL_E5, "sequenced conversion funnel"),
    Query("e2_sliding_windows", q_e2_sliding_windows, SQL_E2, "sliding window agg"),
    Query("e3_session_windows", q_e3_session_windows, SQL_E3, "session window agg"),
    Query("e6_retention_cohorts", q_e6_retention_cohorts, SQL_E6,
          "weekly cohort retention matrix"),
    Query("e7_value_outliers", q_e7_value_outliers, SQL_E7,
          "per-user z-score anomaly detection"),
]
