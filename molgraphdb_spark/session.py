"""SparkSession construction + per-query session conf helpers.

The driver owns the SparkSession in verify runs, so query functions must
not assume builder-time conf. Anything a query depends on (timezone,
AQE, Arrow) is set via runtime conf in :func:`tune` at call time.
"""

from __future__ import annotations

import getpass
import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

#: applicationIds the package zip has already been shipped to — addPyFile
#: is once-per-app, not per-query.
_SHIPPED_APPS: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``molgraphdb_spark`` importable on Python workers regardless
    of the driver's cwd.

    Worker processes resolve imports through their own sys.path; when
    the engine is driven from outside the repo root, every
    mapInPandas/applyInPandas UDF that references this package dies
    with ModuleNotFoundError. Shipping the package as a py-file zip
    (the cluster-standard mechanism — on a real cluster this is
    ``spark-submit --py-files``) removes the cwd dependence. Runtime
    ``addPyFile`` is used instead of builder conf so it also covers
    sessions we did not build (the driver owns the session in verify
    runs).
    """
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED_APPS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            full = os.path.join(root, fname)
            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
            sources.append((rel, full))
    sources.sort()
    # The zip path embeds the user (a world-shared /tmp name fails
    # os.replace across owners on a multi-user host) AND a content
    # hash (two concurrent sessions from different checkouts must not
    # swap each other's code — atomic replace only prevents torn
    # files, not cross-version races).
    digest = hashlib.md5()
    for rel, full in sources:
        digest.update(rel.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    try:
        user = getpass.getuser()
    except Exception:  # no passwd entry in minimal containers
        user = str(os.getuid()) if hasattr(os, "getuid") else "u"
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"molgraphdb_spark_pyfiles_{user}_{digest.hexdigest()[:12]}.zip",
    )
    if not os.path.exists(zip_path):
        tmp_path = zip_path + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for rel, full in sources:
                zf.write(full, rel)
        os.replace(tmp_path, zip_path)  # atomic: concurrent same-content sessions see a whole file
    sc.addPyFile(zip_path)
    _SHIPPED_APPS.add(app)


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
    _ship_package(spark)
    return spark
