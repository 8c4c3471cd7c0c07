"""Streaming ANN index maintenance: continuous ingest of new embedding
vectors into the persisted, cluster_id-partitioned IVF index
(operators/similarity.ivf_write_index is the one-shot batch build; this
is its always-on twin — the pipeline a retrieval corpus actually runs,
where documents are embedded as they arrive).

Layout: each micro-batch writes its assignments under its own
``epoch=<id>`` partition, sub-partitioned by ``cluster_id``:

    index/epoch=3/cluster_id=17/part-*.parquet

- **Replay-idempotent**: a replayed batch (failure between write and
  checkpoint commit) overwrites the SAME epoch directory instead of
  duplicating vectors — the idempotent_parquet_sink recipe applied to an
  index.
- **Partition-pruned probes**: cluster_id stays a partition column, so a
  probe still scans only the probed clusters' directories across all
  epochs.
- **Re-embedding wins**: a vector re-ingested in a later epoch (model
  refresh) supersedes its old assignment — probes compact to the latest
  epoch per vec_id (u3's latest-per-key shape) before scoring.

At scale the epoch partitions are periodically folded into the base
index by ``sinks.compact_parquet`` (small-files maintenance) — the
probe-time compaction window stays bounded by the fold cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import similarity

EMBEDDING_DDL = "vec_id bigint, embedding array<float>, label int"


def read_embedding_stream(spark, path: str) -> DataFrame:
    return spark.readStream.schema(EMBEDDING_DDL).parquet(path)


def ivf_append_sink(
    vec_stream: DataFrame,
    centroids: DataFrame,
    index_path: str,
    checkpoint_path: str,
):
    """Maintain the IVF index from a stream of (vec_id, embedding) rows.

    Each micro-batch runs the SAME assignment as the batch build (nearest
    centroid, rounded L2², deterministic tie-break) — stream/batch
    unification means a probe cannot tell which build produced the index.
    """

    def _append(batch_df: DataFrame, epoch_id: int) -> None:
        assigned = similarity.assign_clusters(batch_df, centroids)
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
            f"{index_path}/epoch={epoch_id}"
        )

    return (
        vec_stream.writeStream.foreachBatch(_append)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def ivf_topk_streamed(
    spark,
    index_path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 2,
) -> DataFrame:
    """Top-k against a streamed index: compact to the latest epoch per
    vec_id (re-embedded vectors supersede), then the standard pruned
    probe. The compaction MUST be global (it runs before cluster
    pruning): a re-embedding can move a vector to a different cluster,
    and probing only the new cluster with per-cluster dedup would leave
    the stale row discoverable through its old cluster. The cost is one
    pass over the epoch partitions, which is exactly what the periodic
    ``compact_parquet`` fold amortizes — after a fold, the un-compacted
    window is just the epochs since."""
    assigned = spark.read.parquet(index_path)
    w = Window.partitionBy("vec_id").orderBy(F.desc("epoch"))
    latest = (
        assigned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "epoch")
    )
    return similarity.ivf_probe_topk(latest, centroids, queries, k, n_probe)
