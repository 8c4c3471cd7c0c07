"""JDBC source/sink (reference S8: `requirements.txt:8-11` declares
sqlalchemy/pyodbc but `src/etl_functions.py` never imports them — the
capability a reference user EXPECTS even though no call site exercises
it). Spark's built-in JDBC datasource replaces both libraries: one API,
any driver on the classpath.

Scale posture — the three things that make a JDBC ingest survive a big
source table:

- **Partitioned parallel reads**: ``partition_column`` +
  ``num_partitions`` turn one giant ``SELECT *`` into N concurrent
  range-bounded queries (``WHERE col >= lo AND col < hi``), one per
  Spark task. Without it the whole table streams through a single
  executor thread — the JDBC twin of the single-reducer window.
- **Predicate/column pushdown**: Catalyst pushes ``filter``/``select``
  into the generated SQL (visible as ``PushedFilters`` in ``explain``),
  so the database ships only the needed rows/columns.
- **Batched writes**: ``batchsize`` controls rows per INSERT batch;
  ``truncate`` avoids full DROP/CREATE on overwrite where supported.

The test suite exercises a REAL roundtrip against embedded Apache Derby
(`derby-*.jar` ships inside pyspark's jars — no install, no network).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JDBC table (or ``(subquery) alias``) as a DataFrame.

    With ``partition_column`` (numeric/date column, ideally indexed) and
    bounds, the scan is split into ``num_partitions`` concurrent range
    queries; otherwise it is a single-task read (fine for dimension
    tables, wrong for facts).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if None in (lower_bound, upper_bound, num_partitions):
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    batchsize: int = 10_000,
    column_types: str | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to a JDBC table in ``batchsize``-row batches.

    ``mode="overwrite"`` drops/recreates (or truncates, with
    ``truncate=true`` in ``properties``) the target; ``"append"`` adds
    rows. Each Spark task opens its own connection, so a wide
    ``df.repartition(n)`` parallelizes the load n-ways — size n to what
    the database can absorb, not to the cluster width.

    ``column_types`` (Spark's ``createTableColumnTypes``, e.g.
    ``"lang VARCHAR(16)"``) overrides the default DDL mapping — needed
    wherever the default is a large-object type the database won't
    index or compare (Derby maps StringType→CLOB, and a pushed-down
    ``WHERE lang = 'en'`` then fails: CLOB isn't comparable).
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


# The Excel reader moved to sources/excel.py (round 6, advice: a
# driver-side pandas parse has nothing to do with JDBC).
