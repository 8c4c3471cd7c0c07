"""etl_power_bi_dashboard_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference repo `douglas-data-analyst/etl-power-bi-dashboard` (pandas ETL →
star schema → aggregate tables → BI export), re-expressed Spark-first:

- declarative DataFrame / SQL plans (Catalyst handles pushdown, pruning,
  join strategy, partial aggregation, AQE),
- explicit schemas over columnar Parquet,
- broadcast joins for dimensions, shuffle-based aggregation for facts,
- extensions the reference lacks: window functions, event-time windowed
  aggregation (batch + Structured Streaming), text analysis, exact and
  approximate deduplication (MinHash-LSH / SimHash / n-gram Jaccard),
  embedding similarity search, and multimodal binary-column plumbing.

Layout:
    session.py     SparkSession factory (AQE on, ANSI off, tuned shuffles)
    sources/       readers: testdata catalog, Olist CSV schemas
    sinks.py       CSV + Parquet sinks (dual export like the reference)
    operators/     reusable transformations (ETL stages, dedup, similarity,
                   text, multimodal)
    plans/         the query registry: every SURVEY §2 operator as a named
                   (spark_fn, oracle_sql) pair used by __spark_entry__
    streaming/     Structured Streaming twins of the batch event queries
"""

__version__ = "0.1.0"
