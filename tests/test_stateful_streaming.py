"""applyInPandasWithState: state must persist across micro-batches and the
final per-user totals must equal the batch groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_power_bi_dashboard_spark.plans.base import load_events
from etl_power_bi_dashboard_spark.streaming.events import EVENT_SCHEMA
from etl_power_bi_dashboard_spark.streaming.stateful import running_user_totals

from .conftest import SF_DIR


def test_running_totals_across_batches(spark, tmp_path):
    d = str(tmp_path / "ev")
    load_events(spark, SF_DIR).repartition(5).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(d)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    # update mode appends one row per (user, batch); the LAST row per user
    # is the lifetime total — compare against the batch aggregation
    out = spark.table("user_totals").toPandas()
    finals = out.groupby("user_id").last()
    batch = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in load_events(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    got = {
        uid: (int(row.n_events), round(row.total_value, 6))
        for uid, row in finals.iterrows()
    }
    assert got == batch
    # state really crossed batches: some user must appear in >1 update row
    assert (out.groupby("user_id").size() > 1).any()


def test_attribution_stream_matches_batch_e10(spark, tmp_path):
    """Streaming last-touch attribution must agree with the batch e10
    plan when micro-batches arrive in event-time order, with the latest
    click carried across batches in keyed state (including across a
    checkpoint restart)."""
    from etl_power_bi_dashboard_spark.plans.events_plans import (
        q_e10_attribution,
    )
    from etl_power_bi_dashboard_spark.streaming.stateful import (
        attribution_stream,
    )

    ev = load_events(spark, SF_DIR)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    src = str(tmp_path / "attr_src")
    out = str(tmp_path / "attr_out")
    ck = str(tmp_path / "attr_ck")

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            attribution_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    # event-time-ordered arrival: early tranche, then the rest appended
    # to the SAME source dir so the restarted query resumes from state
    ev.filter(F.col("ts") < F.lit(mid)).write.mode("overwrite").parquet(src)
    run()
    ev.filter(F.col("ts") >= F.lit(mid)).write.mode("append").parquet(src)
    run()

    spark.catalog.refreshByPath(out)
    got = {
        (r.purchase_id, r.attributed_click_id)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.purchase_id, r.attributed_click_id)
        for r in q_e10_attribution(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0
    # the lookback really crossed the tranche boundary: some purchase in
    # the late tranche must be credited to a click from the early one
    late_purchases = {
        r.event_id
        for r in ev.filter(
            (F.col("ts") >= F.lit(mid)) & (F.col("event_type") == "purchase")
        ).collect()
    }
    early_clicks = {
        r.event_id
        for r in ev.filter(
            (F.col("ts") < F.lit(mid)) & (F.col("event_type") == "click")
        ).collect()
    }
    assert any(
        pid in late_purchases and cid in early_clicks
        for pid, cid in got
        if cid is not None
    )


def test_funnel_stream_matches_batch_stages(spark, tmp_path):
    """The stateful streaming funnel must emit exactly the batch
    _funnel_stages purchase set (same sequenced timestamps) when
    tranches arrive in event-time order, with stages crossing the
    tranche boundary through keyed state."""
    from etl_power_bi_dashboard_spark.plans.events_plans import _funnel_stages
    from etl_power_bi_dashboard_spark.streaming.stateful import funnel_stream

    ev = load_events(spark, SF_DIR)
    # split INSIDE one converting user's click→purchase gap so the
    # carried state provably sequences stages across the tranches
    _, _, pre_purchase = _funnel_stages(ev.select("user_id", "event_type", "ts"))
    probe = pre_purchase.orderBy("user_id").first()
    mid = probe.click_ts + (probe.purchase_ts - probe.click_ts) / 2
    src = str(tmp_path / "fun_src")
    out = str(tmp_path / "fun_out")
    ck = str(tmp_path / "fun_ck")

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            funnel_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    ev.filter(F.col("ts") < F.lit(mid)).write.mode("overwrite").parquet(src)
    run()
    ev.filter(F.col("ts") >= F.lit(mid)).write.mode("append").parquet(src)
    run()

    spark.catalog.refreshByPath(out)
    rows = spark.read.parquet(out).collect()
    got = {
        (r.user_id, r.signup_us, r.click_us, r.purchase_us) for r in rows
    }
    # transition-only emission: a converted user receiving further events
    # in later batches must NOT re-append the row (a set comparison alone
    # would mask such duplicates)
    assert len(rows) == len(got), "converted rows were re-emitted"
    _, _, purchase = _funnel_stages(
        ev.select("user_id", "event_type", "ts")
    )
    def us(dt_):
        # exact integer microseconds — datetime.timestamp() goes through
        # float seconds and can truncate 1 µs under int()
        import datetime as _dt

        epoch = _dt.datetime(1970, 1, 1, tzinfo=dt_.tzinfo)
        return (dt_ - epoch) // _dt.timedelta(microseconds=1)

    want = {
        (r.user_id, us(r.signup_ts), us(r.click_ts), us(r.purchase_ts))
        for r in purchase.collect()
    }
    assert got == want and len(got) > 0
    # conversion genuinely crossed the boundary for at least one user:
    # click accepted before mid, purchase only after
    mid_us = us(mid)
    assert any(
        c < mid_us <= p for (_, _, c, p) in got
    ), "no cross-tranche conversion exercised the carried state"
