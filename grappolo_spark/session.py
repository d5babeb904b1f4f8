"""SparkSession factory for the engine.

Defaults follow the scale guidance in SURVEY.md §4: Arrow exchange on
(the engine's inner loops are Arrow-vectorized), AQE on (skew joins,
partition coalescing), and an explicit shuffle-partition count sized to
the local test harness. On a real cluster these are overridden by
spark-submit conf; nothing here is environment-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "grappolo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the engine.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    same entry point serves tests, bench.py and the N-vs-4N scaling harness.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one shuffle partition per core locally; clusters override via conf
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    # Shuffle/spill files: prefer the ramdisk in this sandbox (the box has
    # 128 GiB; per-superstep shuffle data is ~1-2 GB) — measured +25%
    # 32-thread throughput over the disk-backed default. On a real cluster
    # the deployment provisions NVMe local dirs; override via env/conf.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local mode: the driver JVM hosts all executor threads and every
        # localCheckpoint block; 48g of the box's 128 GiB matches the
        # per-executor memory a real cluster deployment would provision
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
