"""Iterative k-means (Lloyd's algorithm) over embedding columns — the
clustering stage of a training-data pipeline (corpus topic bucketing,
IVF index construction for `similarity.ivf_topk`, diversity sampling).

The reference has no clustering (its analytics stop at groupbys,
SURVEY §2.4); this is a §7.4 extension. Spark-first design:

- assignment is `similarity.assign_clusters` — a broadcast cross join of
  K centroids against the corpus with JVM-side `zip_with`/`aggregate`
  array math (no Python in the loop), one narrow pass per iteration;
- centroid recomputation is posexplode → per-(cluster, dim) avg →
  re-assembled array: two shuffles keyed by (cluster_id, pos), both
  tiny (K·dim rows);
- centroids are collected to the driver between iterations (K·dim
  doubles — bytes, not data) and re-broadcast, which also truncates the
  lineage so iteration count can't deepen the plan;
- init is deterministic: the K lowest-id vectors seed the centroids, so
  runs are reproducible across partitionings and engines.

At 100 TB the per-iteration cost is one corpus scan + one K-row
broadcast — the canonical mergeable pattern; sampled mini-batch variants
drop in by replacing the corpus scan with `p9`-style stratified samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import as_double, assign_clusters, sq_dist


def init_centroids(
    corpus: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic seeding: the K lowest-id vectors, centroid_id 0..K-1."""
    seeds = corpus.orderBy(id_col).limit(k).select(
        F.col(id_col), as_double(F.col(vec_col)).alias("embedding")
    )
    w_id = F.row_number().over(Window.orderBy(id_col))
    return seeds.select(
        (w_id - F.lit(1)).alias("centroid_id"), "embedding"
    )


def recompute_centroids(assigned: DataFrame) -> DataFrame:
    """Elementwise mean per cluster: posexplode → per-dimension avg →
    array re-assembly (sorted by position). All JVM-side."""
    ex = assigned.select(
        "cluster_id", F.posexplode("cv").alias("pos", "x")
    )
    dims = ex.groupBy("cluster_id", "pos").agg(F.avg("x").alias("m"))
    return (
        dims.groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("embedding")
        )
        .select(F.col("cluster_id").alias("centroid_id"), "embedding")
    )


def kmeans(
    spark: SparkSession,
    corpus: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Lloyd's iterations; returns (assignments, centroids, sse_history).

    assignments: (vec_id, cluster_id); centroids: (centroid_id,
    embedding); sse_history: within-cluster sum of squared distances per
    iteration (non-increasing up to rounding — pinned by tests).
    """
    cents = init_centroids(corpus, k, id_col, vec_col)
    sse_history: list[float] = []
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(corpus, cents, id_col, vec_col)
        with_d = assigned.join(
            cents.select(
                F.col("centroid_id").alias("cluster_id"),
                F.col("embedding").alias("zv"),
            ),
            "cluster_id",
        ).select(sq_dist(F.col("cv"), F.col("zv")).alias("d2"))
        sse_history.append(with_d.agg(F.sum("d2")).first()[0])
        # collect K·dim doubles to the driver: truncates lineage so the
        # plan depth is constant in the iteration count
        rows = recompute_centroids(assigned).collect()
        cents = spark.createDataFrame(rows, "centroid_id INT, embedding ARRAY<DOUBLE>")
    return (
        assigned.select(id_col, "cluster_id"),
        cents,
        sse_history,
    )
