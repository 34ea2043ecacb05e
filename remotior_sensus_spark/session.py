"""SparkSession factory tuned for the engine.

Local-mode testing on ``local[$SPARK_GRAFT_CPUS]``; the same settings
(AQE, adaptive skew join, Arrow) are what we'd ship to a 1000-executor
cluster via spark-submit — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, app: str = "remotior_sensus_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # cluster launch: SPARK_GRAFT_MASTER=spark://... (or yarn, k8s://…)
    # redirects every entry point — bench.py, tests, driver_check —
    # without code changes; the explicit argument still wins.
    master = master or os.environ.get("SPARK_GRAFT_MASTER") \
        or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores; on a real cluster this would be
        # 2-3x total executor cores (AQE coalesces the excess anyway).
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = (2 * os.cpu_count()) if n == "*" else max(2 * int(n), 8)
    extra_java = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.driver.extraJavaOptions", extra_java)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled",
                os.environ.get("SPARK_GRAFT_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # minPartitionSize stays at the 1 MB default: a global 64 KB
        # floor was measured (r06) to win 6x on the CPU-heavy label/CC
        # stages but cost 0.3-0.4 s of task overhead on small headline
        # aggregates — the starved stages pin their own partitioning
        # instead (retile.py, components.polygonize_geometry), which is
        # scoped and scale-adaptive. Env override kept for experiments.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PART", "1048576b"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # NOTE: oversized heaps (48g+) caused sporadic 20-35s G1 full-GC
        # stalls in local mode; 16g is stable for all test/bench scales
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-scale split tuning: test files are 10-150 MB, so the
        # 128 MB default would pin scans to 1-2 tasks; on a real cluster
        # against TB-scale inputs this goes back to the default
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                               str(8 * 1024 * 1024)))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        # zstd shuffle/broadcast compression: on a real cluster shuffle
        # compression buys NETWORK bytes; on this single box it relieves
        # the memory-bandwidth wall that caps high-thread-count scaling
        # (measured: flagship local[8] 5.5s->5.0s, 2->8 speedup
        # 2.8x->3.6x; costs ~15% at local[2] where CPU is the scarce
        # resource — the multi-node-faithful tradeoff)
        .config("spark.io.compression.codec",
                os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"))
        # local mode funnels every shuffle through one local dir; tmpfs
        # keeps the scaling measurement CPU-bound (a real cluster has
        # per-node SSD shuffle dirs)
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
