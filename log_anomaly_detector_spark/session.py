"""SparkSession factory tuned for the validation workload.

Local mode is a single JVM; on a real cluster the same config block applies
unchanged except ``master`` (spark-submit supplies it). AQE is on so skewed
shuffles re-plan at runtime; Arrow is on for the vectorized UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "log_anomaly_detector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` default: ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` default: the local core count — the 200 default
    over-parallelizes small local runs and under-parallelizes big ones.
    """
    # cap BLAS threading in the Python workers BEFORE the JVM (and therefore
    # the workers) inherit this environment: task-level parallelism already
    # uses every core, and 32 workers × an N-thread GEMM pool oversubscribes
    # the box exactly when the Arrow kernels go hot. Workers import numpy
    # fresh, so the env caps them; setdefault keeps a caller's explicit
    # sizing. (Driver-side numpy may already be loaded — its tiny dim-sized
    # math doesn't care.)
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] or cluster → cpu hint
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if inner in ("", "*") else int(inner)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # idempotent per-partition rewrite (the engine's upsert analogue):
        # only partitions present in the written DataFrame are replaced.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def quiesce(spark: SparkSession, timeout_s: float = 30.0) -> None:
    """Wait (bounded) for stray async jobs before ``spark.stop()``.

    AQE submits broadcast-stage futures speculatively during planning; when
    the final plan goes another way, the abandoned future keeps running for a
    few seconds after the action returns. Stopping the session mid-task kills
    its Python workers and spews 'Python worker exited unexpectedly (crashed)'
    ERRORs into CLI output — harmless, but indistinguishable from a real
    crash to a reader. CLIs call this between the last action and stop().
    """
    import time

    tracker = spark.sparkContext.statusTracker()
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if not tracker.getActiveJobsIds():
            return
        time.sleep(0.2)
