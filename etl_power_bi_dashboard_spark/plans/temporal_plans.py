"""Temporal operator plans over the events stream: as-of join, bounded
range join, hierarchical (hypertable-style) rollup — custom operators
built as DataFrame compositions (operators/temporal.py), each with a SQL
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import temporal
from .base import Query, load_events


def q_r1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the user's most recent click at-or-before
    it (classic as-of enrichment)."""
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = temporal.asof_join(purchases, clicks, on="user_id", ts="ts")
    return out.select(
        "user_id", "event_id", "ts", "asof_ts", "asof_click_id"
    )


SQL_R1 = """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id, p.ts,
       (SELECT max(c.ts) FROM c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS asof_ts,
       (SELECT c.click_id FROM c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.ts DESC LIMIT 1) AS asof_click_id
FROM p
"""


def q_r2_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events within 5 minutes AFTER an error by the same user (bounded
    range join via interval bucketing — equi-join shuffle, no nested
    loop)."""
    ev = load_events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    actions = ev.filter(F.col("event_type") != "error").select("user_id", "ts")
    return temporal.range_join_buckets(
        errors, actions, on="user_id", ts="ts", window_seconds=300
    )


SQL_R2 = """
SELECT DISTINCT e.user_id, e.ts AS l_ts, a.ts AS r_ts
FROM (SELECT user_id, ts FROM events WHERE event_type = 'error') e
JOIN (SELECT user_id, ts FROM events WHERE event_type <> 'error') a
  ON a.user_id = e.user_id
 AND a.ts >= e.ts
 AND epoch_us(a.ts) < epoch_us(e.ts) + 300000000
"""


def q_r3_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals re-aggregated from hourly partials (hypertable
    continuous-aggregate shape) — exact because partials are DECIMAL."""
    _, daily = temporal.hierarchical_rollup(load_events(spark, sf_dir))
    return daily.select(
        "bucket_day",
        "n_events",
        F.col("tv_dec").cast("double").alias("total_value"),
    )


SQL_R3 = """
SELECT date_trunc('day', ts) AS bucket_day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
"""


QUERIES: list[Query] = [
    Query("r1_asof_join", q_r1_asof_join, SQL_R1, "as-of join"),
    Query("r2_range_join", q_r2_range_join, SQL_R2, "bounded range join"),
    Query("r3_hierarchical_rollup", q_r3_hierarchical_rollup, SQL_R3, "hypertable rollup"),
]
