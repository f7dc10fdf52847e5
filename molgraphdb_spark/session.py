"""SparkSession construction + per-query session conf helpers.

The driver owns the SparkSession in verify runs, so query functions must
not assume builder-time conf. Anything a query depends on (timezone,
AQE, Arrow) is set via runtime conf in :func:`tune` at call time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "molgraphdb-spark", cpus: int | None = None) -> SparkSession:
    """Build a local session tuned the way the engine wants.

    Designed-for-scale defaults (harmless on local[N], load-bearing on a
    real cluster): AQE on (runtime re-plan, skew-join splitting,
    partition coalescing), shuffle partitions sized to cores locally
    (on a cluster this would be ~2-3x total executor cores or left to
    AQE), Arrow for all pandas-UDF traffic.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/molgraphdb-spark-warehouse")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Set runtime conf this engine's queries rely on, on a session we
    did not build (the driver's). All of these are runtime-settable."""
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
