"""Cluster-scale configuration: the partition/shuffle/broadcast sizing
arithmetic for running this engine's plans on a real multi-executor
cluster, as a computed function instead of folklore.

Local test runs (`jobx_spark.session.get_spark`) pin 32 shuffle
partitions because the box has 32 threads; at 100 TB on 1000 executors
the same plans need partition counts derived from DATA SIZE, not core
count alone. The rules encoded here:

  * **Scan side**: `spark.sql.files.maxPartitionBytes` fixes input
    split size (default 128 MB is right for parquet; bigger starves
    parallelism on wide rows, smaller drowns the scheduler in tasks).
  * **Shuffle side**: partitions ≈ shuffle_bytes / target_partition
    (128 MB) — the number that keeps one partition's build side in
    executor memory through a hash aggregate/join. Rounded to a
    multiple of total cores so waves are full, clamped to
    [2×cores, 200k] (beyond ~200k the scheduler + shuffle-index
    overhead dominates; AQE coalesces the excess anyway).
  * **AQE owns the tail**: advisory 64 MB target lets runtime
    re-planning split skewed partitions / merge tiny ones, so the
    static number only has to be the right order of magnitude.
  * **Broadcast**: with 16 GB executors, 256 MB broadcast tables are
    safe (the 10 MB default is tuned for laptops) — every broadcast
    that replaces a shuffle join removes a full exchange of the big
    side.

Nothing here is magic; it is the arithmetic the per-query docstrings
assume when they say "shuffles once on k at any scale".
"""

from __future__ import annotations

MB = 1024 * 1024
GB = 1024 * MB
TB = 1024 * GB

TARGET_PARTITION_BYTES = 128 * MB
AQE_ADVISORY_BYTES = 64 * MB
MAX_SHUFFLE_PARTITIONS = 200_000


def cluster_conf(
    input_bytes: int,
    executors: int = 1000,
    cores_per_executor: int = 4,
    executor_mem_gb: int = 16,
    shuffle_fraction: float = 0.5,
) -> dict[str, str]:
    """Spark confs sized for `input_bytes` of scanned data on an
    `executors`-node cluster. `shuffle_fraction` estimates how much of
    the input survives to the first wide exchange (0.5 is conservative
    for filtered/pre-aggregated plans; use 1.0 for raw repartitions).

    Returns plain string confs — apply via
    ``SparkSession.builder.config(map=cluster_conf(...))`` or
    spark-submit ``--conf`` flags.
    """
    total_cores = max(1, executors * cores_per_executor)
    shuffle_bytes = int(input_bytes * shuffle_fraction)
    raw = max(1, shuffle_bytes // TARGET_PARTITION_BYTES)
    # full waves: round UP to a multiple of total cores
    waves = max(1, -(-raw // total_cores))
    partitions = min(max(waves * total_cores, 2 * total_cores), MAX_SHUFFLE_PARTITIONS)
    # broadcast budget: 1/64 of executor heap, capped at 256 MB
    broadcast = min(256 * MB, (executor_mem_gb * GB) // 64)
    return {
        "spark.sql.shuffle.partitions": str(partitions),
        "spark.sql.files.maxPartitionBytes": str(TARGET_PARTITION_BYTES),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(AQE_ADVISORY_BYTES),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            4 * TARGET_PARTITION_BYTES
        ),
        "spark.sql.autoBroadcastJoinThreshold": str(broadcast),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.speculation": "true",
        "spark.sql.parquet.filterPushdown": "true",
    }
