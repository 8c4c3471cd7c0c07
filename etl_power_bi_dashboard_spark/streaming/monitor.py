"""Streaming observability: a ``StreamingQueryListener`` that lands
per-micro-batch health metrics (input rows, processed rows/sec,
watermark, state-store rows/memory, batch duration) as JSON-lines —
the feed an on-call dashboard or an auto-scaler consumes.

Why a listener and not a metrics query: progress events are pushed by
the engine on the driver at batch boundaries — zero extra jobs, zero
scans, correct even for queries whose sinks are external systems. At
100 TB the SAME listener watches every query on the driver; the JSONL
landing zone is one small append-only file per run (rotate by
application id), negligible next to the data path.

The reference has no streaming (SURVEY §2.8); this instruments the
§7.4 streaming extension. Progress payloads are Spark-public JSON
(StreamingQueryProgress.json), so the landed schema tracks the engine,
and `parse_progress_log` lifts the operational core into a DataFrame
for SQL-side alerting (e.g. `rows_behind`, batch-duration regressions,
state growth without eviction — the SCD-2 sink concern SCALE.md
documents)."""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Append every query-progress event to a JSONL file.

    Thread-safe (listener callbacks arrive on the engine's listener
    bus thread); failures inside callbacks are swallowed by design —
    observability must never take down the query it watches."""

    def __init__(self, log_path: str) -> None:
        self.log_path = log_path
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        self._append(
            {"event": "started", "id": str(event.id), "name": event.name}
        )

    def onQueryProgress(self, event) -> None:
        try:
            payload = json.loads(event.progress.json)
        except Exception:
            payload = {}
        payload["event"] = "progress"
        self._append(payload)

    def onQueryTerminated(self, event) -> None:
        self._append(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - engine-timed
        pass

    def _append(self, record: dict) -> None:
        try:
            line = json.dumps(record, default=str)
            with self._lock:
                # dirname is '' for a bare relative filename, and
                # makedirs('') raises — which the blanket except below
                # would swallow, silently dropping EVERY event
                parent = os.path.dirname(self.log_path)
                if parent:
                    os.makedirs(parent, exist_ok=True)
                with open(self.log_path, "a", encoding="utf-8") as fh:
                    fh.write(line + "\n")
        except Exception:
            # never let observability kill the stream
            pass


def attach_progress_log(spark: SparkSession, log_path: str) -> ProgressLogListener:
    listener = ProgressLogListener(log_path)
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: ProgressLogListener) -> None:
    spark.streams.removeListener(listener)


def parse_progress_log(spark: SparkSession, log_path: str) -> DataFrame:
    """Lift the landed JSONL into the operational-core DataFrame:
    one row per micro-batch with the fields alerting actually keys on.
    Reads with an explicit schema projection (never inferSchema on an
    operational feed) and tolerates engine-version payload drift — the
    extraction is ``get_json_object`` paths over the raw line, so new
    engine fields never break old readers."""
    raw = spark.read.text(log_path)
    j = F.col("value")
    return (
        raw.select(
            F.get_json_object(j, "$.event").alias("event"),
            F.get_json_object(j, "$.id").alias("query_id"),
            F.get_json_object(j, "$.batchId").cast("long").alias("batch_id"),
            F.get_json_object(j, "$.timestamp").alias("batch_ts"),
            F.get_json_object(j, "$.numInputRows").cast("long").alias(
                "input_rows"
            ),
            F.get_json_object(j, "$.processedRowsPerSecond")
            .cast("double")
            .alias("rows_per_sec"),
            F.get_json_object(j, "$.durationMs.triggerExecution")
            .cast("long")
            .alias("batch_ms"),
            F.get_json_object(j, "$.eventTime.watermark").alias("watermark"),
            F.get_json_object(j, "$.stateOperators[0].numRowsTotal")
            .cast("long")
            .alias("state_rows"),
            F.get_json_object(j, "$.stateOperators[0].numRowsUpdated")
            .cast("long")
            .alias("state_rows_updated"),
        )
        .filter(F.col("event") == "progress")
        .drop("event")
    )
