"""JSONL (newline-delimited JSON) source + sink.

The reference exports only CSV/Parquet (`src/etl_functions.py:421-432`);
JSONL is the additional interchange format every large-scale training-data
pipeline speaks (corpus shards, annotation dumps, API exports). Design
rules for the 100 TB path:

- **Reads take an explicit schema.** `spark.read.json` without one runs a
  full inference pass over the data — a second 100 TB scan before the
  first real job. Callers pass the `StructType` (or DDL string) they
  expect; unparseable lines land in a `_corrupt_record` column instead of
  failing the job, so corpus hygiene is a queryable property, not a crash.
- **Writes shard by records, not files.** `maxRecordsPerFile` bounds shard
  size so downstream loaders (which typically stream one shard per worker)
  get uniform work units; `partition_by` gives hive-style layout for
  partition-pruned re-reads. Compression defaults to gzip — JSONL is
  text, ~10× compressible, and scan cost at scale is IO-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def corrupt_schema(schema: StructType | str) -> StructType:
    """The caller's schema plus the ``_corrupt_record`` column, as a NEW
    StructType. Never use ``StructType.add`` on a caller-supplied schema:
    ``add`` mutates in place AND returns self, so a reused schema object
    would permanently grow a phantom corrupt column (and a second
    quarantine read would add a duplicate). Shared by the batch and
    streaming JSONL readers and the CSV quarantine reader
    (``olist.read_csv_quarantine``) so the quarantine contract has one
    definition."""
    from pyspark.sql.types import StringType, StructField

    base = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    return StructType(
        list(base.fields) + [StructField(CORRUPT_COL, StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with a caller-supplied schema.

    With ``keep_corrupt=True`` the returned frame carries a
    ``_corrupt_record`` string column: NULL for clean rows, the raw line
    for malformed ones (PERMISSIVE mode) — filter on it to quarantine bad
    shards. With the default ``False``, malformed lines are dropped
    (DROPMALFORMED), matching a best-effort corpus ingest.
    """
    if keep_corrupt:
        full = corrupt_schema(schema)
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """Write a DataFrame as JSONL shards under ``path``.

    ``max_records_per_file`` caps rows per output shard (uniform loader
    work units); ``partition_by`` adds hive-style directory partitioning
    for partition-pruned re-reads.
    """
    w = df.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def corrupt_line_report(df_with_corrupt: DataFrame) -> DataFrame:
    """One-row hygiene summary for a ``keep_corrupt=True`` read:
    total lines, clean lines, corrupt lines.

    Spark disallows queries over raw JSON whose referenced columns are
    only ``_corrupt_record`` (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN) — materialize the parse first (``df.cache()`` for
    small audits, or write the parsed frame to parquet and report over
    that for corpus-scale runs).
    """
    c = F.col(CORRUPT_COL)
    return df_with_corrupt.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(c.isNull(), 1)).alias("n_clean"),
        F.count(F.when(c.isNotNull(), 1)).alias("n_corrupt"),
    )


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Streaming JSONL source with the quarantine contract: the stream
    carries the ``_corrupt_record`` column (NULL for clean rows, the raw
    line for malformed ones) so a dead-letter split can run downstream —
    the streaming twin of ``read_jsonl(keep_corrupt=True)``."""
    full = corrupt_schema(schema)
    return (
        spark.readStream.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_stream_sink(
    raw_stream: DataFrame,
    good_path: str,
    bad_path: str,
    checkpoint_path: str,
):
    """Dead-letter-queue sink: each micro-batch splits on
    ``_corrupt_record`` and writes clean rows (column dropped) to
    ``good_path`` and raw malformed lines to ``bad_path`` — the
    always-on form of the batch quarantine readers, so an uncontrolled
    feed never stalls the pipeline and never silently loses evidence.

    Both writes land under per-epoch subdirectories (the
    idempotent_parquet_sink recipe): a replayed batch overwrites its own
    directories instead of duplicating rows on either side of the split.
    The batch is persisted for the two passes and unpersisted after —
    without it each side would re-read the micro-batch's files.
    """

    def _split(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            c = F.col(CORRUPT_COL)
            batch_df.filter(c.isNull()).drop(CORRUPT_COL).write.mode(
                "overwrite"
            ).parquet(f"{good_path}/epoch={epoch_id}")
            batch_df.filter(c.isNotNull()).select(
                c.alias("raw_line")
            ).write.mode("overwrite").parquet(f"{bad_path}/epoch={epoch_id}")
        finally:
            batch_df.unpersist()

    return (
        raw_stream.writeStream.foreachBatch(_split)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
