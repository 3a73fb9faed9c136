"""SparkSession builder with the pipeline's scale-hygiene defaults.

Defaults target the sandbox (local[N], 32 cores); on a real cluster the same
code runs under spark-submit --py-files with executor counts supplied by the
cluster manager — nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# one Arrow batch per UDF call; bounded so per-batch Python memory stays flat
ARROW_BATCH_ROWS = 512


def get_spark(app_name: str = 'jionlp_spark',
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    master = master or f'local[{cpus}]'
    shuffle_partitions = shuffle_partitions or max(cpus, 32)

    # make the package importable on executor Python workers regardless of
    # the driver's cwd (the local-mode stand-in for --py-files: workers read
    # PYTHONPATH, not the driver's sys.path)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get('PYTHONPATH', '')
    if pkg_root not in existing.split(os.pathsep):
        os.environ['PYTHONPATH'] = (pkg_root + os.pathsep + existing
                                    if existing else pkg_root)

    return (
        SparkSession.builder
        .appName(app_name)
        .master(master)
        # AQE: runtime coalesce + skew-join splitting for hot-entity joins
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.adaptive.skewJoin.enabled', 'true')
        .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
        # post-shuffle partitions feed Arrow/pandas UDF stages: a 64MB
        # (default advisory) text partition is minutes of serial Python —
        # keep them small so UDF stages stay wide after AQE coalescing
        .config('spark.sql.adaptive.advisoryPartitionSizeInBytes',
                str(16 * 1024 * 1024))
        .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
        # Arrow everywhere; bounded batches keep UDF memory flat
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.sql.execution.arrow.maxRecordsPerBatch',
                str(ARROW_BATCH_ROWS))
        # 128MB scan splits — sized so a 100TB table yields ~800k tasks,
        # fine for a 1000-executor cluster
        .config('spark.sql.files.maxPartitionBytes', str(128 * 1024 * 1024))
        .config('spark.driver.memory',
                os.environ.get('SPARK_DRIVER_MEMORY', '8g'))
        # RAM-backed shuffle spill dir when available (cluster equivalents:
        # NVMe-local shuffle dirs); /tmp on this sandbox is slow shared disk
        .config('spark.local.dir',
                '/dev/shm/spark-local' if os.path.isdir('/dev/shm')
                else '/tmp')
        .config('spark.ui.showConsoleProgress', 'false')
        .config(map={str(k): str(v)
                     for k, v in (extra_conf or {}).items()})
        .getOrCreate()
    )
