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


def _funnel_stages(ev: DataFrame):
    """Per-user sequenced funnel stages (signup → first click after
    signup → first purchase after that click) — the conditional-MIN
    construction SHARED by e5 (stage counts) and e12 (stage timings), so
    the sequencing rules live in exactly one place per engine. Each
    stage is a keyed aggregate on user_id (AQE reuses the exchange);
    later stages carry the earlier timestamps forward.

    Returns (signup, click, purchase): click carries signup_ts, purchase
    carries click_ts and signup_ts.
    """
    signup = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    click = (
        ev.filter(F.col("event_type") == "click")
        .join(signup, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("click_ts"),
            F.min("signup_ts").alias("signup_ts"),
        )
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(click, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("purchase_ts"),
            F.min("click_ts").alias("click_ts"),
            F.min("signup_ts").alias("signup_ts"),
        )
    )
    return signup, click, purchase


def q_e5_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced conversion funnel: signup → first click after signup →
    first purchase after that click, per user; output stage counts.

    Stage timestamps are conditional MINs over one scan + one shuffle per
    sequencing level (each level's filter depends on the previous MIN, so
    levels can't collapse into one aggregate — but every level is a keyed
    aggregate on user_id, and AQE reuses the exchange). Timestamps are
    exact integer microseconds on both engines, so the strict-inequality
    sequencing is deterministic. Construction shared with e12 via
    ``_funnel_stages``.
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    signup, click, purchase = _funnel_stages(ev)
    return (
        signup.agg(F.count("*").alias("n_signup"))
        .crossJoin(click.agg(F.count("*").alias("n_click_after_signup")))
        .crossJoin(purchase.agg(F.count("*").alias("n_purchase_after_click")))
    )


# Shared funnel CTEs (the SQL twin of _funnel_stages) — one definition
# of the sequencing rules for both the e5 and e12 oracles.
_SQL_FUNNEL_CTES = """
WITH signup AS (
    SELECT user_id, MIN(ts) AS signup_ts FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), click AS (
    SELECT e.user_id, MIN(e.ts) AS click_ts, MIN(s.signup_ts) AS signup_ts
    FROM events e JOIN signup s ON e.user_id = s.user_id
    WHERE e.event_type = 'click' AND e.ts > s.signup_ts
    GROUP BY e.user_id
), purchase AS (
    SELECT e.user_id, MIN(e.ts) AS purchase_ts,
           MIN(c.click_ts) AS click_ts, MIN(c.signup_ts) AS signup_ts
    FROM events e JOIN click c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
    GROUP BY e.user_id
)"""

SQL_E5 = _SQL_FUNNEL_CTES + """
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


def q_e8_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types — the
    clickstream "what happens after X" analysis (and the bigram model a
    sequence-data pipeline fits over user sessions).

    Per user, events are totally ordered by (ts, event_id) and each
    event paired with its successor via ``lead`` — ONE shuffle on
    user_id, parallel across users, bounded per-user work. The
    (from, to) pair counts are exact BIGINTs; the row-conditional
    probability divides two of them as ONE IEEE division (numerator and
    denominator both exact), so the engines agree bit-for-bit. The
    final matrix is |event_types|² rows — driver-safe at any corpus
    size.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / row_total.cast("double")
        ).alias("p"),
    )


SQL_E8 = """
WITH seq AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
), counts AS (
    SELECT from_type, to_type, COUNT(*) AS n_transitions
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
           / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
           AS p
FROM counts
"""


def q_e9_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online anomaly detection: each event scored against the ROLLING
    window of its user's 20 previous events (frame excludes the current
    row, so the score is a genuine forecast residual — e7's twin with a
    bounded trailing baseline instead of the full-history window).

    Moments come from DECIMAL power sums over a bounded row frame
    (exact, association-independent — DuckDB's segment-tree sliding
    aggregation and Spark's running frame must agree because decimal
    addition is associative); the z-score is then identical IEEE ops.
    One shuffle on user_id; the frame is ≤20 rows per event, so per-row
    cost is O(1) and the plan scales linearly with events. Warm-up rows
    (fewer than 5 priors) and zero-variance baselines are excluded with
    the explicit ``n·s2 − s1² > 0`` guard (see e7 on why relying on
    0/0 semantics is not portable).
    """
    ev = load_events(spark, sf_dir)
    x = _value_dec()
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
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
            (F.col("n") >= 5)
            & (n * F.col("s2") - F.col("s1") * F.col("s1") > 0)
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3.0)
        .select("user_id", "event_id", "value", "z")
    )


SQL_E9 = """
WITH s AS (
    SELECT user_id, event_id, value,
           COUNT(*) OVER w AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
           CAST(SUM(CAST(value AS DECIMAL(18,2))
                    * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
), z AS (
    SELECT user_id, event_id, value,
           (value - s1 / CAST(n AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * s2 - s1 * s1)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS z
    FROM s
    WHERE n >= 5
      AND CAST(n AS DOUBLE) * s2 - s1 * s1 > 0
)
SELECT user_id, event_id, value, z FROM z WHERE ABS(z) > 3.0
"""


def q_e10_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent click AT-OR-BEFORE it in (ts, event_id) order within a 7-day
    lookback — the marketing-analytics staple, and the single-stream
    cousin of the r1 as-of join (here the match comes from a window over
    one ordered pass instead of a two-table rendezvous). A click in the
    SAME truncated microsecond as the purchase (lower event_id) does
    attach — the identical convention the streaming twin
    (``streaming/stateful.attribution_stream``) applies when it replays
    events in (ts, event_id) order, so batch backfill and stream agree
    by construction; e5/e12's funnel sequencing, which needs STRICT
    stage progression, uses strict inequalities instead.

    ``last(..., ignorenulls)`` over the (ts, event_id) order with a
    frame ending at the PREVIOUS row carries the latest click's ts and
    id forward to each purchase — one shuffle on user_id, no self-join,
    no per-row lookback scan. The 7-day cutoff is an exact integer
    comparison on epoch microseconds (no interval arithmetic to
    disagree over). Unattributed purchases (no click, or the last click
    expired) report NULL credit — kept, because spend reporting needs
    the denominator.
    """
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    seven_days_us = 7 * 24 * 3600 * 1000000
    attributed = (
        F.col("click_ts").isNotNull()
        & (F.unix_micros("ts") - F.unix_micros("click_ts") <= seven_days_us)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            click_ts.alias("click_ts"),
            click_id.alias("click_id"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
            F.when(attributed, F.col("click_id")).alias("attributed_click_id"),
            F.when(attributed, F.col("click_ts")).alias("attributed_click_ts"),
        )
    )


SQL_E10 = """
WITH marked AS (
    SELECT user_id, event_id, ts, event_type, value,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER w AS click_ts,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                      IGNORE NULLS) OVER w AS click_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id,
       event_id AS purchase_id,
       ts AS purchase_ts,
       value,
       CASE WHEN click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(click_ts) <= 604800000000
            THEN click_id END AS attributed_click_id,
       CASE WHEN click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(click_ts) <= 604800000000
            THEN click_ts END AS attributed_click_ts
FROM marked
WHERE event_type = 'purchase'
"""


def q_e11_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the product-
    analytics staple that is NOT window-expressible (COUNT(DISTINCT)
    over a sliding frame isn't a legal window aggregate in either
    engine): a user active twice in the window must count once.

    The scale-shaped rewrite: each distinct (user, day) activity row is
    exploded to the ≤7 report days it supports (day … day+6), distinct-
    deduped, and counted per report day — linear in activity rows with
    a constant ×7 fan-out, versus the quadratic day×history self-join a
    naive formulation runs. All counts exact BIGINTs; stickiness is one
    IEEE division. Report days clamp to the observed [min, max] span.
    """
    ev = load_events(spark, sf_dir)
    act = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    span = act.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    wau = (
        act.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("day"),
        )
        .distinct()
        .crossJoin(F.broadcast(span))
        .filter(F.col("day") <= F.col("d1"))
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    dau = act.groupBy(F.col("d").alias("day")).agg(
        F.count("*").alias("dau")
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            "wau",
            (
                F.coalesce(F.col("dau"), F.lit(0)).cast("double")
                / F.col("wau").cast("double")
            ).alias("stickiness"),
        )
    )


# Oracle is the NAIVE quadratic formulation (per report day, a
# correlated COUNT(DISTINCT) over the trailing window) — so the hash
# gate proves the explode-and-dedup rewrite semantics-preserving, the
# sc1/ml3 differential contract. A report day whose trailing window is
# empty appears in neither formulation (no support rows / wau = 0).
SQL_E11 = """
WITH act AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), span AS (
    SELECT MIN(d) AS d0, MAX(d) AS d1 FROM act
), days AS (
    SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                       CAST(d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM span
), m AS (
    SELECT day,
           (SELECT COUNT(DISTINCT a.user_id) FROM act a
            WHERE a.d BETWEEN day - INTERVAL 6 DAY AND day) AS wau,
           (SELECT COUNT(DISTINCT a.user_id) FROM act a
            WHERE a.d = day) AS dau
    FROM days
)
SELECT CAST(day AS TIMESTAMP) AS day, dau, wau,
       CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
FROM m WHERE wau > 0
"""


def q_e12_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel TIMING: e5 counts who converts, this measures how long
    conversion takes — per user, the exact microsecond lags signup→first
    click and click→first purchase, summarized as converter count plus
    mean/min/max lag in seconds. The report that turns a funnel into an
    SLA (is checkout slow?) and feeds the e10 lookback-window choice.

    Reuses e5's conditional-MIN sequencing (each stage a keyed aggregate
    on user_id, exchange reused). Lags are exact BIGINT epoch-µs
    differences summed as BIGINTs (association-free), so the means are
    single IEEE divisions of exact integers — no rounding convention
    needed. One row out regardless of scale.
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    _, _, purchase = _funnel_stages(ev)
    lag1 = F.unix_micros("click_ts") - F.unix_micros("signup_ts")
    lag2 = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return purchase.agg(
        F.count("*").cast("bigint").alias("n_converters"),
        (F.sum(lag1).cast("double") / F.count("*").cast("double")
         / F.lit(1e6)).alias("mean_signup_to_click_s"),
        (F.sum(lag2).cast("double") / F.count("*").cast("double")
         / F.lit(1e6)).alias("mean_click_to_purchase_s"),
        (F.min(lag2).cast("double") / F.lit(1e6)).alias("min_click_to_purchase_s"),
        (F.max(lag2).cast("double") / F.lit(1e6)).alias("max_click_to_purchase_s"),
    )


SQL_E12 = _SQL_FUNNEL_CTES + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
       CAST(SUM(epoch_us(click_ts) - epoch_us(signup_ts)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mean_signup_to_click_s,
       CAST(SUM(epoch_us(purchase_ts) - epoch_us(click_ts)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mean_click_to_purchase_s,
       CAST(MIN(epoch_us(purchase_ts) - epoch_us(click_ts)) AS DOUBLE)
           / 1e6 AS min_click_to_purchase_s,
       CAST(MAX(epoch_us(purchase_ts) - epoch_us(click_ts)) AS DOUBLE)
           / 1e6 AS max_click_to_purchase_s
FROM purchase
"""


def q_ml8_markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-time evaluation of the e8 transition model: fit argmax
    next-event predictions on all transitions STARTING more than 7 days
    before the corpus's last event, score them on the final week — the
    temporal holdout a sequence model actually gets judged on (and the
    e-family's member of the model-eval trio beside x19 and ml7).

    The cutoff derives from the data (max(ts) − 7 days as exact epoch
    µs, attached as a broadcast 1-row aggregate) so the split exists at
    every sf. Predictions tie-break (count DESC, to_type ASC); test
    states unseen in training keep a row with NULL prediction counted
    incorrect (the ml7 lesson — dropping them would overstate accuracy).
    Counts are exact BIGINTs; accuracy is one IEEE division. Shapes: the
    e8 lead pass (one user_id shuffle), a |types|² model groupBy, and a
    broadcast join onto the test pairs.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
            F.unix_micros("ts").alias("from_us"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    cutoff = ev.agg(
        (F.max(F.unix_micros("ts")) - F.lit(7 * 86_400_000_000))
        .cast("bigint")
        .alias("cutoff_us")
    )
    pairs = pairs.crossJoin(F.broadcast(cutoff))
    train = pairs.filter(F.col("from_us") < F.col("cutoff_us"))
    test = pairs.filter(F.col("from_us") >= F.col("cutoff_us"))
    counts = train.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    w_m = Window.partitionBy("from_type").orderBy(F.desc("n"), "to_type")
    model = (
        counts.withColumn("rk", F.row_number().over(w_m))
        .filter(F.col("rk") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    scored = test.join(F.broadcast(model), "from_type", "left")
    return scored.groupBy("from_type").agg(
        F.max("predicted").alias("predicted"),
        F.count("*").cast("bigint").alias("n_test"),
        F.sum(
            F.when(F.col("to_type") == F.col("predicted"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
        (
            F.sum(
                F.when(F.col("to_type") == F.col("predicted"), 1).otherwise(0)
            ).cast("double")
            / F.count("*").cast("double")
        ).alias("accuracy"),
    )


SQL_ML8 = """
WITH pairs AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type,
           epoch_us(ts) AS from_us
    FROM events
), p AS (
    SELECT * FROM pairs WHERE to_type IS NOT NULL
), cut AS (
    SELECT CAST(MAX(epoch_us(ts)) - 604800000000 AS BIGINT) AS cutoff_us
    FROM events
), train AS (
    SELECT p.* FROM p, cut WHERE p.from_us < cut.cutoff_us
), test AS (
    SELECT p.* FROM p, cut WHERE p.from_us >= cut.cutoff_us
), counts AS (
    SELECT from_type, to_type, COUNT(*) AS n FROM train
    GROUP BY from_type, to_type
), model AS (
    SELECT from_type, to_type AS predicted FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY from_type
                                     ORDER BY n DESC, to_type) AS rk
        FROM counts
    ) WHERE rk = 1
)
SELECT t.from_type,
       MAX(m.predicted) AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN t.to_type = m.predicted THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM test t LEFT JOIN model m ON m.from_type = t.from_type
GROUP BY t.from_type
"""


def q_e13_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type — the arrival-process
    diagnostic behind capacity planning and anomaly baselines (is this
    stream ~Poisson? what's its burstiness?): per (user, type) stream,
    consecutive gaps via one lag window; per type, exact moment stats
    over the gaps and the implied exponential rate λ = 1/mean.

    Scale shape: the lag window partitions by (user_id, event_type) —
    millions of small independent partitions, never a global sort — and
    the moment aggregation is a plain partial-agg groupBy on ~#types
    keys. Exactness: gaps are integer µs; sums accumulate as BIGINT and
    DECIMAL(38,0) (the µs² squares would overflow BIGINT), and the
    variance is computed from the exact sums with one IEEE expression at
    the end, so both engines agree bit-for-bit.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "event_type",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
                "gap_us"
            ),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    sum_us = F.sum("gap_us")  # bigint is ample: 1e12 µs × 1e7 gaps
    sumsq = F.sum((F.col("gap_us").cast("decimal(38,0)")
                   * F.col("gap_us").cast("decimal(38,0)")))
    n = F.count("*")
    agg = gaps.groupBy("event_type").agg(
        n.alias("n_gaps"),
        sum_us.alias("sum_us"),
        sumsq.cast("double").alias("sumsq_us"),
        F.min("gap_us").alias("min_us"),
        F.max("gap_us").alias("max_us"),
    )
    mean_s = F.col("sum_us").cast("double") / F.col("n_gaps").cast("double") / 1e6
    var_s = (
        F.col("sumsq_us")
        - F.col("sum_us").cast("double") * F.col("sum_us").cast("double")
        / F.col("n_gaps").cast("double")
    ) / F.col("n_gaps").cast("double") / 1e12
    return agg.select(
        "event_type",
        "n_gaps",
        mean_s.alias("mean_gap_s"),
        (F.col("min_us").cast("double") / 1e6).alias("min_gap_s"),
        (F.col("max_us").cast("double") / 1e6).alias("max_gap_s"),
        var_s.alias("var_gap_s"),
        (F.lit(1.0) / mean_s).alias("rate_per_s"),
    )


SQL_E13 = """
WITH gaps AS (
    SELECT user_id, event_type,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
), g AS (SELECT * FROM gaps WHERE gap_us IS NOT NULL),
agg AS (
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_us,
           CAST(SUM(CAST(gap_us AS DECIMAL(38,0))
                    * CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) AS sumsq_us,
           MIN(gap_us) AS min_us,
           MAX(gap_us) AS max_us
    FROM g GROUP BY event_type
)
SELECT event_type, n_gaps,
       CAST(sum_us AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1e6 AS mean_gap_s,
       CAST(min_us AS DOUBLE) / 1e6 AS min_gap_s,
       CAST(max_us AS DOUBLE) / 1e6 AS max_gap_s,
       (sumsq_us - CAST(sum_us AS DOUBLE) * CAST(sum_us AS DOUBLE)
                   / CAST(n_gaps AS DOUBLE))
           / CAST(n_gaps AS DOUBLE) / 1e12 AS var_gap_s,
       1.0 / (CAST(sum_us AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1e6)
           AS rate_per_s
FROM agg
"""


def q_e14_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths — the product-analytics staple no single
    window expresses: each (user, day)'s first 8 events in strict
    (ts, event_id) order joined into a `a>b>c` path string, then the 20
    most common paths. Where e8's transition matrix sees pairwise hops,
    this sees whole trajectories.

    Scale shape: ONE groupBy (user, day) builds each session's path with
    sort_array over collected (ts, event_id, type) structs — per-group
    arrays bounded by session length, sorting local to each group, no
    window over the event stream; then a path-keyed count whose shuffle
    carries one row per distinct path. Determinism: the struct sort
    order is (ts, event_id) — a total key — and top-20 tie-breaks on
    the path string; the 8-step truncation bounds the path domain.
    """
    ev = load_events(spark, sf_dir)
    paths = (
        ev.groupBy(
            "user_id", F.to_date("ts").alias("day")
        )
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    8,
                ),
                ">",
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    # TakeOrderedAndProject (per-partition top-k + merge), never a rank
    # window over the whole path-count table — the t1 pattern; the
    # (count, path) tie-break makes the top-20 SET deterministic, which
    # is all the order-insensitive driver compare needs.
    return counted.orderBy(F.desc("n_sessions"), F.asc("path")).limit(20)


SQL_E14 = """
WITH p AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id), 1, 8),
               '>') AS path
    FROM events GROUP BY user_id, CAST(ts AS DATE)
),
c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path)
SELECT path, n_sessions
FROM c ORDER BY n_sessions DESC, path LIMIT 20
"""


def q_e15_bounce_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry/exit session matrix with bounce rates: for each (user, day)
    session, the first and last event type in strict (ts, event_id)
    order, aggregated into an entry×exit grid with the single-event
    (bounce) share per cell — the landing-page health readout e14's
    whole-path top-k doesn't give (paths tell you the common journeys;
    this tells you where journeys START, END, and die immediately).

    Scale shape: e14's one-groupBy session build (per-group sorted
    struct arrays bounded by session length, no stream-wide window),
    then a ≤|event_types|² aggregation. Bounce rate is the only IEEE
    op, dividing two exact BIGINTs.
    """
    ev = load_events(spark, sf_dir)
    s = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("a")
    )
    sess = s.select(
        F.element_at("a", 1)["event_type"].alias("entry_type"),
        F.element_at("a", -1)["event_type"].alias("exit_type"),
        F.size("a").alias("n"),
    )
    return sess.groupBy("entry_type", "exit_type").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        (
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("bounce_rate"),
    )


SQL_E15 = """
WITH s AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           list(event_type ORDER BY ts, event_id) AS a,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT a[1] AS entry_type, a[-1] AS exit_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
FROM s GROUP BY 1, 2
"""


def q_e16_event_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder profile: per event type, how often events
    arrive AFTER a later-timestamped event of the same user has already
    landed, and by how much — exactly the statistic that sizes a
    Structured Streaming watermark (`withWatermark` delay must cover
    the observed lateness tail or the streaming ops in streaming/
    events.py silently drop those rows). Arrival order is event_id (the
    monotone ingest id); an event is late iff its ts precedes the
    running max ts among the user's earlier arrivals.

    Keyed per user deliberately: the running max is a per-user window
    (bounded, parallel) matching how keyed streaming state actually
    sees disorder — a global running max would be both a single-reducer
    scan and the wrong statistic for keyed operators. Lateness is an
    exact µs BIGINT difference; the only IEEE ops are the final
    fraction and the µs→s display divisions.

    On the driver fixture this reports 0 everywhere — event_ids are
    assigned in timestamp order, i.e. "this stream needs no watermark
    slack" — so the operator's SENSITIVITY is pinned by a law test
    over a deliberately disordered frame rather than by the fixture.
    """
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts"))
    marked = ev.select(
        "event_type",
        us.alias("t_us"),
        F.max(us).over(w).alias("wm_us"),
    ).select(
        "event_type",
        F.when(
            F.col("wm_us").isNotNull() & (F.col("t_us") < F.col("wm_us")),
            F.col("wm_us") - F.col("t_us"),
        ).alias("late_us"),
    )
    return marked.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count("late_us").cast("bigint").alias("n_late"),
        (
            F.count("late_us").cast("double") / F.count("*").cast("double")
        ).alias("frac_late"),
        (F.max("late_us").cast("double") / F.lit(1e6)).alias(
            "max_lateness_sec"
        ),
        (
            F.sum("late_us").cast("bigint").cast("double")
            / F.lit(1e6)
            / F.count("late_us").cast("double")
        ).alias("avg_lateness_sec"),
    )


SQL_E16 = """
WITH m AS (
    SELECT event_type,
           epoch_us(ts) AS t_us,
           MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS wm_us
    FROM events
),
l AS (
    SELECT event_type,
           CASE WHEN wm_us IS NOT NULL AND t_us < wm_us
                THEN wm_us - t_us END AS late_us
    FROM m
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(late_us) AS BIGINT) AS n_late,
       CAST(COUNT(late_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS frac_late,
       CAST(MAX(late_us) AS DOUBLE) / 1e6 AS max_lateness_sec,
       CAST(CAST(SUM(late_us) AS BIGINT) AS DOUBLE) / 1e6
           / CAST(COUNT(late_us) AS DOUBLE) AS avg_lateness_sec
FROM l GROUP BY 1
"""


def q_e17_survival_horizons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-horizon conversion survival: of users who signed up, what
    fraction purchased within 1 hour / 1 day / 7 days — e12 reports lag
    moments among CONVERTERS; this is the censoring-aware population
    rate (the "D1/D7 conversion" growth metric). A user counts toward a
    horizon's denominator only if the stream's observation end (max ts,
    data-derived) is at least signup + horizon away — users whose
    window hadn't closed yet are censored out, not counted as failures.

    Plan: two keyed aggregates (first signup per user, first
    at-or-after-signup purchase per user — one join), a 1-row max-ts
    broadcast, and a 3-row horizon fan-out. All comparisons are exact
    epoch-µs BIGINTs; the rate is one IEEE division per horizon row.
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    signup = ev.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min(F.unix_micros("ts")).alias("s_us"))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    first_p = (
        signup.join(pur, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"))
    )
    base = signup.join(first_p, "user_id", "left")
    end = ev.agg(F.max(F.unix_micros("ts")).alias("end_us"))
    # BIGINT horizons: horizon·10⁶ µs overflows INT32 at 7 days, which
    # ANSI mode turns into a hard error rather than a silent wrap
    horizons = spark.range(1).select(
        F.explode(
            F.array(F.lit(3600), F.lit(86400), F.lit(604800))
        ).alias("_h")
    ).select(F.col("_h").cast("bigint").alias("horizon_sec"))
    j = base.crossJoin(F.broadcast(end)).crossJoin(F.broadcast(horizons))
    at_risk = (
        F.col("s_us") + F.col("horizon_sec") * F.lit(1000000)
        <= F.col("end_us")
    )
    converted = at_risk & F.col("p_us").isNotNull() & (
        F.col("p_us") - F.col("s_us")
        <= F.col("horizon_sec") * F.lit(1000000)
    )
    return j.groupBy("horizon_sec").agg(
        F.sum(F.when(at_risk, 1).otherwise(0)).cast("bigint").alias(
            "n_at_risk"
        ),
        F.sum(F.when(converted, 1).otherwise(0)).cast("bigint").alias(
            "n_converted"
        ),
        (
            F.sum(F.when(converted, 1).otherwise(0)).cast("double")
            / F.sum(F.when(at_risk, 1).otherwise(0)).cast("double")
        ).alias("conv_rate"),
    )


SQL_E17 = """
WITH s AS (
    SELECT user_id, MIN(epoch_us(ts)) AS s_us FROM events
    WHERE event_type = 'signup' GROUP BY 1
),
p AS (
    SELECT s.user_id, MIN(epoch_us(e.ts)) AS p_us
    FROM s JOIN events e ON e.user_id = s.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
    GROUP BY 1
),
base AS (
    SELECT s.user_id, s.s_us, p.p_us FROM s LEFT JOIN p USING (user_id)
),
endt AS (SELECT MAX(epoch_us(ts)) AS end_us FROM events),
h AS (SELECT CAST(unnest([3600, 86400, 604800]) AS BIGINT) AS horizon_sec),
j AS (
    SELECT base.*, endt.end_us, h.horizon_sec,
           (s_us + horizon_sec * 1000000 <= end_us) AS at_risk
    FROM base CROSS JOIN endt CROSS JOIN h
)
SELECT horizon_sec,
       CAST(SUM(CASE WHEN at_risk THEN 1 ELSE 0 END) AS BIGINT)
           AS n_at_risk,
       CAST(SUM(CASE WHEN at_risk AND p_us IS NOT NULL
                      AND p_us - s_us <= horizon_sec * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN at_risk AND p_us IS NOT NULL
                      AND p_us - s_us <= horizon_sec * 1000000
                     THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CASE WHEN at_risk THEN 1 ELSE 0 END) AS DOUBLE)
           AS conv_rate
FROM j GROUP BY 1
"""


def q_e18_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the new/retained/resurrected/churned
    state machine): per week, how many active users are brand new,
    retained from last week, resurrected after a gap — and how many of
    last week's actives churned — plus the quick ratio
    (new+resurrected)/churned. e6's cohort matrix tracks one cohort
    down the calendar; this is the week-over-week net-growth ledger
    operators actually page through. Weeks are epoch-day DIV 7 integers
    (engine-portable; no ISO-week disagreement).

    Scale shape: distinct (user, week) actives → per-user lag (fully
    parallel windows), one |weeks|-row aggregate, and the churn lag
    over the calendar-bounded weekly series (allowlisted class).
    Identity law-tested: active(w) = new + retained + resurrected and
    churned(w) = active(w−1) − retained(w) on contiguous weeks.
    """
    ev = load_events(spark, sf_dir)
    uw = ev.selectExpr(
        "user_id",
        "CAST(datediff(to_date(ts), DATE'1970-01-01') AS BIGINT) DIV 7 AS wk",
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("wk").alias("fw"))
    wl = Window.partitionBy("user_id").orderBy("wk")
    marked = (
        uw.join(first, "user_id")
        .withColumn("prev_wk", F.lag("wk").over(wl))
        .select(
            "wk",
            F.when(F.col("wk") == F.col("fw"), "new")
            .when(F.col("prev_wk") == F.col("wk") - 1, "retained")
            .otherwise("resurrected")
            .alias("state"),
        )
    )
    weekly = marked.groupBy("wk").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("state") == "retained", 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0))
        .cast("bigint")
        .alias("n_resurrected"),
    )
    ww = Window.orderBy("wk")
    contig = F.lag("wk").over(ww) == F.col("wk") - 1
    prev_active = F.lag("n_active").over(ww)
    churned = F.when(contig, prev_active - F.col("n_retained"))
    return weekly.select(
        "wk",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        churned.cast("bigint").alias("n_churned"),
        F.when(
            churned > 0,
            (F.col("n_new") + F.col("n_resurrected")).cast("double")
            / churned.cast("double"),
        ).alias("quick_ratio"),
    )


SQL_E18 = """
WITH uw AS (
    SELECT DISTINCT user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
    FROM events
),
f AS (SELECT user_id, MIN(wk) AS fw FROM uw GROUP BY 1),
m AS (
    SELECT uw.wk,
           CASE WHEN uw.wk = f.fw THEN 'new'
                WHEN lag(uw.wk) OVER (PARTITION BY uw.user_id
                                      ORDER BY uw.wk) = uw.wk - 1
                     THEN 'retained'
                ELSE 'resurrected' END AS state
    FROM uw JOIN f USING (user_id)
),
weekly AS (
    SELECT wk,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected
    FROM m GROUP BY 1
)
SELECT wk, n_active, n_new, n_retained, n_resurrected,
       CAST(CASE WHEN lag(wk) OVER w = wk - 1
                 THEN lag(n_active) OVER w - n_retained END AS BIGINT)
           AS n_churned,
       CASE WHEN lag(wk) OVER w = wk - 1
             AND lag(n_active) OVER w - n_retained > 0
            THEN CAST(n_new + n_resurrected AS DOUBLE)
                 / CAST(lag(n_active) OVER w - n_retained AS DOUBLE)
       END AS quick_ratio
FROM weekly
WINDOW w AS (ORDER BY wk)
"""


def q_a31_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the BI-dashboard staple
    behind "when are our users actually here" (the reference repo's
    whole purpose is Power BI dashboard feeds; this is the canonical
    7×24 matrix such a dashboard plots). Weekday uses the reference's
    Mon=0 convention (SURVEY F4) computed as (epoch_day + 3) MOD 7 —
    pure integer arithmetic, immune to engine locale/WEEKDAY-origin
    disagreements; hour is the UTC-pinned event hour.

    One groupBy over a ≤168-cell domain; value sums as DECIMAL per the
    money convention, one terminal IEEE division for the per-event
    mean.
    """
    ev = load_events(spark, sf_dir)
    dow = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint")
        + F.lit(3)
    ) % F.lit(7)
    out = ev.groupBy(
        dow.alias("dow_mon0"), F.hour("ts").cast("int").alias("hour")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_value"),
    )
    return out


SQL_A31 = """
SELECT (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7
           AS dow_mon0,
       CAST(hour(ts) AS INT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean_value
FROM events GROUP BY 1, 2
"""


def q_e19_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1/2/7/14 — the signal-processing twin of a21's per-weekday
    seasonality indexes: a21 ASSUMES the weekly cycle and measures its
    shape; the ACF DETECTS which cycle exists (a spike at lag 7 = weekly
    periodicity; fast decay = no memory), which is what a forecasting or
    anomaly-baseline job checks before choosing its seasonal window.
    Missing calendar days enter as zero-count observations (a silent
    day IS signal for a count series), via a 1-row span → sequence
    explode, never a driver round-trip.

    Exactness: with S = Σx, n = #days, the standard ACF(L) =
    Σ(x_t−μ)(x_{t+L}−μ) / Σ(x_t−μ)² is computed as the exact-BIGINT
    ratio Σ(n·x_t−S)(n·x_{t+L}−S) / Σ(n·x_t−S)² (both sides scale by
    n², which cancels) — one terminal IEEE division per lag; at this
    fixture's magnitudes the products sit ~10⁷ below BIGINT overflow
    (switch the two sums to DECIMAL(38,0) past ~10⁹ events/day·year
    series). Scale shape: one groupBy collapses events to ≤|days| rows;
    everything after is calendar-bounded (a25-class post-agg joins).
    """
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d")
    ).agg(F.count("*").cast("bigint").alias("x"))
    span = daily.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    cal = span.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    )
    filled = cal.join(daily, "d", "left").select(
        "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
    )
    tot = filled.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    f = filled.crossJoin(F.broadcast(tot))
    den = f.agg(
        F.sum(
            (F.col("n") * F.col("x") - F.col("s"))
            * (F.col("n") * F.col("x") - F.col("s"))
        )
        .cast("bigint")
        .alias("den")
    )
    lagged = f.select(
        "d",
        "x",
        "n",
        "s",
        F.explode(
            F.array(*[F.lit(v).cast("bigint") for v in (1, 2, 7, 14)])
        ).alias("lag"),
    )
    b = filled.select(
        F.col("d").alias("d2"), F.col("x").alias("x2")
    )
    pairs = lagged.join(
        b, lagged["d"] + lagged["lag"] == b["d2"], "inner"
    )
    num = pairs.groupBy("lag").agg(
        F.sum(
            (F.col("n") * F.col("x") - F.col("s"))
            * (F.col("n") * F.col("x2") - F.col("s"))
        )
        .cast("bigint")
        .alias("num"),
        F.count("*").cast("bigint").alias("n_pairs"),
        F.max("n").alias("n_days"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_days",
        "n_pairs",
        F.when(
            F.col("den") > 0,
            F.col("num").cast("double") / F.col("den").cast("double"),
        ).alias("acf"),
    )


SQL_E19 = """
WITH daily AS (
    SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
cal AS (
    SELECT unnest(range(d0, d1 + 1)) AS d FROM span
),
filled AS (
    SELECT cal.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
    FROM cal LEFT JOIN daily ON cal.d = daily.d
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
    FROM filled
),
den AS (
    SELECT CAST(SUM((n * x - s) * (n * x - s)) AS BIGINT) AS den
    FROM filled, tot
),
pairs AS (
    SELECT CAST(l AS BIGINT) AS lag, a.x AS x, b.x AS x2, tot.n, tot.s
    FROM filled a, LATERAL unnest([1, 2, 7, 14]) AS u(l)
    JOIN filled b ON a.d + l = b.d
    CROSS JOIN tot
),
num AS (
    SELECT lag,
           CAST(SUM((n * x - s) * (n * x2 - s)) AS BIGINT) AS num,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MAX(n) AS BIGINT) AS n_days
    FROM pairs GROUP BY 1
)
SELECT lag, n_days, n_pairs,
       CASE WHEN den > 0
            THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf
FROM num, den
"""


QUERIES: list[Query] = [
    Query("e19_autocorrelation", q_e19_autocorrelation, SQL_E19,
          "daily-count autocorrelation at lags 1/2/7/14 (cycle detection)"),
    Query("a31_dow_hour_heatmap", q_a31_dow_hour_heatmap, SQL_A31,
          "day-of-week × hour activity heatmap (Mon=0, integer dow)"),
    Query("e18_growth_accounting", q_e18_growth_accounting, SQL_E18,
          "weekly new/retained/resurrected/churned ledger + quick ratio"),
    Query("e17_survival_horizons", q_e17_survival_horizons, SQL_E17,
          "censoring-aware D1/D7-style conversion rates at fixed horizons"),
    Query("e16_event_lateness", q_e16_event_lateness, SQL_E16,
          "per-type event-time lateness profile (watermark sizing)"),
    Query("e15_bounce_matrix", q_e15_bounce_matrix, SQL_E15,
          "entry×exit session matrix with bounce rates"),
    Query("e14_top_paths", q_e14_top_paths, SQL_E14,
          "top (user, day) event-type paths (whole-trajectory analytics)"),
    Query("e13_interarrival", q_e13_interarrival, SQL_E13,
          "inter-arrival-time profile per event type (exact moments + rate)"),
    Query("e1_tumbling_hourly", q_e1_tumbling_hourly, SQL_E1, "tumbling window agg"),
    Query("e12_time_to_convert", q_e12_time_to_convert, SQL_E12,
          "funnel timing (exact µs conversion lags)"),
    Query("ml8_markov_eval", q_ml8_markov_eval, SQL_ML8,
          "out-of-time evaluation of the transition model"),
    Query("e5_funnel", q_e5_funnel, SQL_E5, "sequenced conversion funnel"),
    Query("e2_sliding_windows", q_e2_sliding_windows, SQL_E2, "sliding window agg"),
    Query("e3_session_windows", q_e3_session_windows, SQL_E3, "session window agg"),
    Query("e6_retention_cohorts", q_e6_retention_cohorts, SQL_E6,
          "weekly cohort retention matrix"),
    Query("e7_value_outliers", q_e7_value_outliers, SQL_E7,
          "per-user z-score anomaly detection"),
    Query("e8_transition_matrix", q_e8_transition_matrix, SQL_E8,
          "event-type Markov transition matrix"),
    Query("e10_attribution", q_e10_attribution, SQL_E10,
          "last-touch click attribution with a 7-day lookback"),
    Query("e11_rolling_active_users", q_e11_rolling_active_users, SQL_E11,
          "DAU / trailing-7-day WAU / stickiness"),
    Query("e9_rolling_zscore", q_e9_rolling_zscore, SQL_E9,
          "rolling-baseline online anomaly scores"),
]
