"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same settings are what we would
ship to a multi-executor cluster via spark-submit (AQE on, skew-join
splitting on, Arrow for pandas UDFs). Shuffle partitions default to the
core count locally; on a real cluster this is sized to ~2-3x total cores
and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "entity_resolution__spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; keeps shuffles 1 task/core, AQE coalesces further.
        shuffle_partitions = cpus if "local" in master else 2 * cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: the driver heap IS the executor heap; 32 concurrent
        # tasks over array-heavy payloads GC-thrash a 24g heap (measured:
        # blocks/pairs stages 5-10x slower at local[32] on 2M-turn input)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "56g"))
        .config("spark.ui.enabled", "false")
        # console progress bar pushes large \r-frames through stderr every
        # 200ms — megabytes per run through a piped/captured stderr, and a
        # blocked pipe stalls the JVM writer thread. Pure noise for a
        # benchmarked engine.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (needed between two-parallelism bench runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # Spark caches the JVM-side context; clear so a new master takes effect.
    from pyspark import SparkContext

    with SparkContext._lock:  # noqa: SLF001 - sanctioned reset for re-master
        SparkContext._active_spark_context = None
    SparkSession._instantiatedSession = None  # noqa: SLF001
    SparkSession._activeSession = None  # noqa: SLF001
