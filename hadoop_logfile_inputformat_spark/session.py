"""SparkSession factory with scale-oriented defaults.

Centralizes the knobs that matter at 100 TB so every entry point (tests,
bench, __spark_entry__) runs the same configuration:

- AQE on (runtime coalescing, skew-join splitting)
- broadcast threshold raised: all dims in this star schema are tiny
- Arrow enabled for every Python<->JVM hop (data source, pandas UDFs)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hadoop-logfile-inputformat-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # The JVM spawns fresh Python workers for the data source / pandas
    # UDFs; they don't inherit the driver's sys.path. Export the package
    # root on PYTHONPATH *before* the JVM starts so `import
    # hadoop_logfile_inputformat_spark` resolves on every worker. On a
    # real cluster the equivalent is shipping a wheel via --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode runs the whole engine in the driver JVM (32 task
        # threads + broadcast vars + any persisted intermediates): 8g
        # showed GC-pressure swings on warm queries mid-bench, 16g is
        # comfortable on the 128 GiB test box.  On a real cluster this
        # maps to executor memory, sized per-node instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    from hadoop_logfile_inputformat_spark.sources.logfile import register_logfile_source

    register_logfile_source(spark)
    return spark
