"""SparkSession factory tuned for the KG-construction job.

Scale posture (the settings that matter at 100 TB / 1000 executors, all
harmless at local[32]):
  - AQE on, with skew-join splitting and partition coalescing — the north
    rule requires explicit skew handling (/root/repo/BASELINE.json:6,14).
  - Arrow enabled with a bounded records-per-batch so the mapInPandas
    extractor sees micro-batches (the reference's token-budget instinct,
    /root/reference/gondar/utils/Flow.py:14, generalized to batch sizing).
  - shuffle partitions sized by caller (32 in-sandbox; thousands on a
    real cluster).

Iceberg: if the Iceberg runtime jars are on the classpath we configure a
hadoop catalog under the warehouse; otherwise gondar_spark.sources.tables
falls back to parquet + snapshot manifests behind the same interface.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "gondar_spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    arrow_batch_rows: int = 256,
    warehouse: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    # ship ourselves to the Python workers: the mapInPandas closures import
    # gondar_spark, so the package root must be importable worker-side.
    # Local mode: inherit via PYTHONPATH. Cluster mode: users additionally
    # pass the zipped package via `spark-submit --py-files` (north rule,
    # /root/repo/BASELINE.json:14).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{py_path}" if py_path else pkg_root
        )
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_batch_rows),
        # deterministic outputs: never rely on partition order
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.autoBroadcastJoinThreshold": "67108864",
        "spark.ui.enabled": "false",
        "spark.driver.memory": "8g",
    }
    if warehouse and _iceberg_available():
        conf.update(
            {
                "spark.sql.extensions": (
                    "org.apache.iceberg.spark.extensions"
                    ".IcebergSparkSessionExtensions"
                ),
                "spark.sql.catalog.gondar": "org.apache.iceberg.spark.SparkCatalog",
                "spark.sql.catalog.gondar.type": "hadoop",
                "spark.sql.catalog.gondar.warehouse": warehouse,
            }
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _iceberg_available() -> bool:
    """True iff the Iceberg Spark runtime is importable on the JVM side.

    In-sandbox this is False and the parquet fallback engages; on a real
    cluster ship the runtime jar via --packages and this turns on.
    """
    try:
        import importlib.util

        # cheap proxy: a pyspark-iceberg runtime ships no python module, so
        # check the env flag users set when submitting with the jar.
        import os

        return os.environ.get("GONDAR_ICEBERG", "0") == "1" and (
            importlib.util.find_spec("pyspark") is not None
        )
    except Exception:
        return False
