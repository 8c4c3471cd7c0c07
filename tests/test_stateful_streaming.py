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
