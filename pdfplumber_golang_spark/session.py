"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_PKG_DIR)


def package_zip() -> str:
    """Zip this package for spark-submit --py-files / addPyFile shipping.

    Content-hashed filename so stale zips are never reused; workers unpack
    it onto their sys.path, which is exactly the multi-executor deployment
    path (north_rule: "run via spark-submit --py-files")."""
    h = hashlib.sha256()
    files = []
    for root, _dirs, names in os.walk(_PKG_DIR):
        if "__pycache__" in root:
            continue
        for n in sorted(names):
            if n.endswith(".py"):
                p = os.path.join(root, n)
                files.append(p)
                with open(p, "rb") as f:
                    h.update(p.encode())
                    h.update(f.read())
    path = f"/tmp/pdfplumber_golang_spark-{h.hexdigest()[:12]}.zip"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for p in files:
                z.write(p, os.path.relpath(p, _REPO_DIR))
        os.replace(tmp, path)
    return path


def get_spark(
    app: str = "pdfplumber_golang_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """local[N] session tuned for this engine.

    On a real cluster these configs transfer directly: AQE on (runtime
    coalescing + skew-join handling), Arrow enabled for the pandas-UDF
    kernels, shuffle partitions sized to parallelism.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package to executors (works identically on a real cluster)
    spark.sparkContext.addPyFile(package_zip())
    return spark
