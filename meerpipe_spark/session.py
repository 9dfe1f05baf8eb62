"""Spark session bootstrap.

Tuned for correctness-first local runs while keeping the settings that
matter at cluster scale: AQE for runtime re-planning (skew joins,
shuffle-partition coalescing), Arrow for the pandas-UDF kernels, UTC
session timezone so timestamp semantics match the DuckDB oracle.

At 100 TB the same config applies unchanged except
``spark.sql.shuffle.partitions`` (sized to ~128 MB per shuffle
partition) and storage-level knobs; nothing here is local-mode-only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_driver_memory() -> None:
    """spark.driver.memory set via the session builder is IGNORED in
    PySpark local mode — the py4j gateway launches the JVM (with the
    1 GB default -Xmx) BEFORE session configs apply. Route the heap
    size through the launcher env instead; effective only if the
    gateway isn't up yet, which is exactly the fresh-process case
    (driver gate, bench, oracle sweep) where a 186-query session
    previously OOMed at 1 GB despite "spark.driver.memory=8g" in its
    config. Called from get_spark AND from __spark_entry__ import so
    the external driver's own getOrCreate() benefits too."""
    from pyspark import SparkContext

    # _gateway is a private attribute; a PySpark upgrade renaming it must
    # degrade to "skip the heap tweak", never break session creation.
    gateway = getattr(SparkContext, "_gateway", None)
    if gateway is None and "PYSPARK_SUBMIT_ARGS" not in os.environ:
        mem = os.environ.get("SPARK_DRIVER_MEM", "8g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    if gateway is None:
        # Local-mode python workers inherit the JVM's env, NOT the
        # driver's sys.path mutations. A driver that imported this
        # package via sys.path.insert from another cwd (the round
        # driver runs from /tmp) would otherwise spawn workers that
        # cannot unpickle/deferred-import meerpipe_spark — every
        # mapInPandas/applyInPandas closure referencing module
        # functions (timing fit, media decode, kepler) silently
        # degrades or fails. Prepend the repo root to PYTHONPATH
        # before the gateway launches so workers resolve the package.
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pp = os.environ.get("PYTHONPATH", "")
        if repo not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")


def get_spark(
    app_name: str = "meerpipe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    ensure_driver_memory()
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Driver testdata has shipped events.ts as TIMESTAMP(NANOS) and as
        # tz-naive timestamp[us]; Spark has no nanos timestamp type — read
        # nanos as long and convert in io.load_tables (truncation to micros,
        # matching DuckDB's ns→us read behavior), and read tz-naive micros
        # as LTZ (identical values under the UTC session timezone) so every
        # unix_millis/unix_micros call site sees plain `timestamp`.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
