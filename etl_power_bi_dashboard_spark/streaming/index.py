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


# Epoch-id stride between logical runs: epoch = run_base + batch_id.
_RUN_STRIDE = 1_000_000


def _run_base(spark, index_path: str, checkpoint_path: str) -> int:
    """Globally-unique, checkpoint-stable epoch base for one logical run.

    Spark's ``epoch_id`` is CHECKPOINT-LOCAL (every fresh checkpoint
    restarts at 0), so raw epoch ids collide across runs: a second
    ingest run would overwrite ``epoch=0`` — destroying the prior run's
    data — and even without collision, latest-epoch ordering across runs
    would be meaningless (an old run's epoch 1 would beat a new run's
    epoch 0, resurrecting stale embeddings). The fix keys run identity
    off the CHECKPOINT, which is what defines a logical run:

    - first call for a checkpoint CLAIMS the next free ``_RUN_STRIDE``
      multiple by atomically creating a ``_runbase_<base>`` sentinel
      inside the index (underscore-prefixed, so parquet readers ignore
      it; create-exclusive atomicity makes two racing fresh runs take
      different strides instead of silently sharing one), then publishes
      the base as a marker inside the checkpoint dir;
    - a crash-resume (same checkpoint) re-reads the marker, so replayed
      batches overwrite their own directories (idempotent); a crash
      before the marker publish leaves only an unused sentinel, and the
      resume claims a fresh stride;
    - a new run (new checkpoint) gets a strictly larger base, so its
      assignments genuinely supersede under latest-epoch compaction.

    All filesystem traffic goes through the Hadoop FileSystem API (the
    same route ``events._fs_and_path`` uses), so the protocol holds on
    whatever filesystem the index/checkpoint URIs name — local, HDFS, or
    an object store with an atomic-create semantic — instead of silently
    operating on the driver's local disk for an ``hdfs://`` path, which
    is what the original ``os.*`` implementation did. Both the claim
    sentinel and the run marker are CREATE-EXCLUSIVE empty files whose
    NAME carries the value (``_runbase_<base>`` / ``ivf_run_base_<base>`` — underscore-
    separated, never ``=``: a root-level FILE whose name contains ``=``
    defeats Spark's hidden-file filter (partition discovery parses
    ``name=value`` entries before the underscore check) and breaks
    ``read.parquet`` on the index root):
    ``FileSystem.createNewFile`` is the atomic create-if-absent
    primitive, and a name-carried value has no partially-written-content
    crash state at all, so the old write-then-rename marker dance is
    gone. (On S3-family stores without atomic create, concurrent FRESH
    runs against one index need an external lock; crash-resume — the
    case streaming recovery actually exercises — needs no atomicity.)
    """
    jvm = spark._jvm

    def _p(path: str):
        return jvm.org.apache.hadoop.fs.Path(path)

    conf = spark._jsc.hadoopConfiguration()
    ifs = _p(index_path).getFileSystem(conf)
    cfs = _p(checkpoint_path).getFileSystem(conf)
    if cfs.exists(_p(checkpoint_path)):
        for st in cfs.listStatus(_p(checkpoint_path)):
            name = st.getPath().getName()
            if name.startswith("ivf_run_base_"):
                return int(name.rsplit("_", 1)[1])
    existing = -1
    if ifs.exists(_p(index_path)):
        for st in ifs.listStatus(_p(index_path)):
            name = st.getPath().getName()
            if name.startswith("_runbase_"):
                existing = max(existing, int(name.rsplit("_", 1)[1]))
            elif name.startswith("epoch="):
                base_of = int(name.split("=", 1)[1]) // _RUN_STRIDE
                existing = max(existing, base_of * _RUN_STRIDE)
    ifs.mkdirs(_p(index_path))
    # CLAIM the base atomically: two concurrent fresh runs would compute
    # the same next stride from the scan alone and then overwrite each
    # other's epoch dirs; createNewFile returns False for the loser of
    # the race, who takes the next stride.
    base = existing + _RUN_STRIDE if existing >= 0 else 0
    while not ifs.createNewFile(_p(f"{index_path}/_runbase_{base}")):
        base += _RUN_STRIDE
    cfs.mkdirs(_p(checkpoint_path))
    cfs.createNewFile(_p(f"{checkpoint_path}/ivf_run_base_{base}"))
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
    base = _run_base(vec_stream.sparkSession, index_path, checkpoint_path)

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
