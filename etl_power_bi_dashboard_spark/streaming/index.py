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

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import similarity

EMBEDDING_DDL = "vec_id bigint, embedding array<float>, label int"


def read_embedding_stream(spark, path: str) -> DataFrame:
    return spark.readStream.schema(EMBEDDING_DDL).parquet(path)


# Epoch-id stride between logical runs: epoch = run_base + batch_id.
_RUN_STRIDE = 1_000_000


def _run_base(index_path: str, checkpoint_path: str) -> int:
    """Globally-unique, checkpoint-stable epoch base for one logical run.

    Spark's ``epoch_id`` is CHECKPOINT-LOCAL (every fresh checkpoint
    restarts at 0), so raw epoch ids collide across runs: a second
    ingest run would overwrite ``epoch=0`` — destroying the prior run's
    data — and even without collision, latest-epoch ordering across runs
    would be meaningless (an old run's epoch 1 would beat a new run's
    epoch 0, resurrecting stale embeddings). The fix keys run identity
    off the CHECKPOINT, which is what defines a logical run:

    - first call for a checkpoint CLAIMS the next free ``_RUN_STRIDE``
      multiple by atomically mkdir-ing a ``_runbase=<base>`` sentinel
      inside the index (underscore-prefixed, so parquet readers ignore
      it; mkdir atomicity makes two racing fresh runs take different
      strides instead of silently sharing one), then publishes the base
      to a marker file inside the checkpoint dir via write-then-rename;
    - a crash-resume (same checkpoint) re-reads the marker, so replayed
      batches overwrite their own directories (idempotent); a crash
      before the marker publish leaves only an unused sentinel, and the
      resume claims a fresh stride;
    - a new run (new checkpoint) gets a strictly larger base, so its
      assignments genuinely supersede under latest-epoch compaction.

    Local-filesystem paths (this environment); swap the os calls for the
    Hadoop FileSystem API on an object store.
    """
    marker = os.path.join(checkpoint_path, "ivf_run_base")
    if os.path.exists(marker):
        with open(marker) as fh:
            content = fh.read().strip()
        if content:  # an empty file = crashed mid-claim; re-claim below
            return int(content)
    existing = -1
    if os.path.isdir(index_path):
        for name in os.listdir(index_path):
            if name.startswith("_runbase="):
                existing = max(existing, int(name.split("=", 1)[1]))
            elif name.startswith("epoch="):
                base_of = int(name.split("=", 1)[1]) // _RUN_STRIDE
                existing = max(existing, base_of * _RUN_STRIDE)
    os.makedirs(index_path, exist_ok=True)
    # CLAIM the base atomically: two concurrent fresh runs would compute
    # the same next stride from the scan alone and then overwrite each
    # other's epoch dirs; mkdir of a sentinel is atomic on POSIX, so the
    # loser of the race sees FileExistsError and takes the next stride.
    base = existing + _RUN_STRIDE if existing >= 0 else 0
    while True:
        try:
            os.mkdir(os.path.join(index_path, f"_runbase={base}"))
            break
        except FileExistsError:
            base += _RUN_STRIDE
    os.makedirs(checkpoint_path, exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(base))
    os.replace(tmp, marker)  # atomic publish — no empty-marker crash state
    return base


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
    Epoch directories are ``run_base + batch_id`` (see :func:`_run_base`)
    so replays within a run overwrite their own directory while distinct
    runs never collide and always sort after earlier ones.
    """
    base = _run_base(index_path, checkpoint_path)

    def _append(batch_df: DataFrame, epoch_id: int) -> None:
        assigned = similarity.assign_clusters(batch_df, centroids)
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
            f"{index_path}/epoch={base + epoch_id}"
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
