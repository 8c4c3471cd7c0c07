"""SparkSession factory.

The reference engine (pandas, `src/etl_functions.py:562-585` in the
reference repo) is eager and single-node; here the equivalent "runtime" is a
SparkSession tuned for correctness parity and for scale:

- AQE on (runtime partition coalescing, skew-join splitting) so the same
  plans survive a 100× scale-up without retuning,
- AQE's coalescing floor lowered to 64KB: coalescing decides by BYTES,
  but the dedup/graph families shuffle data that is tiny in bytes and
  huge in compute (md5 hashing, array intersections, pair-explosion
  joins over a small-vocabulary corpus) — under the 1MB default floor
  those stages collapse to ONE task and serialize ~20s of work that 32
  cores finish in ~3s (measured on d6's edge build at sf0.1: 26s → 9s
  cold). At cluster scale real partitions dwarf both thresholds and the
  setting is inert; it only stops byte-blind coalescing from
  serializing compute-bound local stages,
- ANSI mode OFF so casts/parses return NULL on failure like
  `pd.to_datetime(errors='coerce')` (plans additionally use try_* functions
  so they stay correct even under an ANSI-on session provided by a driver),
- UTC session timezone so date_id surrogate keys and window buckets are
  deterministic across environments,
- shuffle partitions sized for the local test harness; at cluster scale AQE
  coalesces or splits as needed.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def aqe_enabled() -> bool:
    """Strict-boolean read of the SPARK_GRAFT_AQE invariance knob.

    Any falsy spelling (false/0/off/no, any case) disables AQE;
    everything else (including unset) enables it. Passing the raw env
    value to ``spark.sql.adaptive.enabled`` would produce an invalid
    boolean conf for "0"/"off" that only fails at first session USE,
    and the test skip guards must agree with the session on what
    counts as disabled — both go through this one helper.
    """
    return os.environ.get("SPARK_GRAFT_AQE", "true").lower() not in (
        "false", "0", "off", "no",
    )


def get_spark(
    app_name: str = "etl-power-bi-dashboard-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # `is None`, not truthiness: an explicit shuffle_partitions=0 must
    # surface as the (invalid) value the caller passed, not silently
    # become the env default
    shuffle = (
        shuffle_partitions
        if shuffle_partitions is not None
        else int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    )
    # Config-invariance knob: results must not depend on AQE, so the
    # parity suite can re-run with SPARK_GRAFT_AQE=false to prove no
    # plan silently relies on a runtime re-plan for CORRECTNESS (AQE is
    # a performance feature; only the streaming gap-monitor's
    # state-merge pin and the bench numbers are allowed to care).
    aqe = "true" if aqe_enabled() else "false"
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
