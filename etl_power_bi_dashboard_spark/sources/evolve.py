"""Schema-evolution ingestion: read a lake whose parquet snapshots were
written under DIFFERENT schema versions (columns added or retired over
time) as one coherent DataFrame.

The operational reality behind it: a 100 TB lake is written over months;
producers add columns (``lang`` tagging arrives in March, ``quality``
in June) and old files are never rewritten. A plain ``spark.read
.parquet(root)`` takes the schema of a random footer and silently drops
the columns it didn't pick; the correct read is footer-merging plus an
explicit target schema the pipeline conforms to.

Generalizes the reference's F13 schema backfill (`src/etl_functions.py`
product-translation fallback: a missing input column materializes as a
typed placeholder instead of crashing the pipeline) from one hardcoded
column to any declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_with_schema_evolution(spark: SparkSession, *paths: str) -> DataFrame:
    """Read one or more parquet roots with footer-schema merging: the
    result schema is the union of every file's columns, older files
    surfacing NULL for columns they predate.

    ``mergeSchema`` costs one footer read per file at planning time (not
    a data scan); at very large file counts, prefer a table format that
    tracks schema in metadata — this is the raw-parquet equivalent.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def conform_to_schema(df: DataFrame, schema: StructType | str) -> DataFrame:
    """Project ``df`` onto the declared target schema: missing columns
    materialize as typed NULLs (the F13 backfill, generalized), present
    columns are cast to the declared type, and columns outside the
    declaration are dropped. Pure projection — no shuffle, no data pass
    beyond the scan it composes with.

    Name matching honours the session's resolution mode
    (``spark.sql.caseSensitive``, default false): under the default, a
    producer's ``LANG`` satisfies a declared ``lang`` — exactly as
    ``df.select("lang")`` would resolve it — instead of being silently
    replaced by typed NULLs, which would null out real data without an
    error.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    case_sensitive = (
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false").lower()
        == "true"
    )

    def _key(name: str) -> str:
        return name if case_sensitive else name.lower()

    # key -> actual source column names; a source with BOTH 'lang' and
    # 'LANG' collapses to one key, where a bare F.col("lang") would be
    # an ambiguous reference. Prefer the exact-case match (it is what
    # the declaration asked for), else accept a single
    # case-insensitive hit; multiple inexact hits stay ambiguous and
    # fail here with the field named, not with Spark's resolver error.
    have: dict[str, list[tuple[int, str]]] = {}
    for i, f in enumerate(df.schema.fields):
        have.setdefault(_key(f.name), []).append((i, f.name))
    # positional rename — PySpark has no true ordinal column access
    # (df[int] resolves by NAME), so duplicate-modulo-case sources would
    # hit AMBIGUOUS_REFERENCE; a toDF over unique positional names is a
    # pure projection that makes every pick exact
    base = df.toDF(*[f"_c{i}" for i in range(len(df.columns))])
    cols = []
    for field in schema.fields:
        hits = have.get(_key(field.name), [])
        if not hits:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        exact = [(i, n) for i, n in hits if n == field.name]
        if exact:
            # multiple EXACT duplicates (legal post-join Spark output)
            # deterministically resolve to the first occurrence —
            # pinned by test_conform_exact_duplicate_names_picks_first_
            # occurrence; erroring here was considered and rejected
            # (round 9): the resolver's ambiguity error is exactly what
            # this positional path exists to improve on
            idx = exact[0][0]
        elif len(hits) == 1:
            idx = hits[0][0]
        else:
            raise ValueError(
                f"conform_to_schema: declared column {field.name!r} matches "
                f"multiple source columns case-insensitively "
                f"({[n for _, n in hits]}) and none exactly; rename the "
                "source columns or enable spark.sql.caseSensitive"
            )
        cols.append(F.col(f"_c{idx}").cast(field.dataType).alias(field.name))
    return base.select(*cols)
