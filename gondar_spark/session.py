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
    warm_start: bool = True,
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
    spark = builder.getOrCreate()
    if warm_start:
        _warm_start(spark)
    return spark


def _warm_start(spark: SparkSession) -> None:
    """One-time per-session JVM warm-up over a few-KB synthetic frame:
    exercise the parquet writer/reader, explode+split, hash aggregate,
    window, join, sort-limit and md5/higher-order-function codegen paths
    so Janino compilation and C2 JIT of the shared operator machinery are
    paid at session build, not by the first production queries (guide
    §1: measure steady state, not compiler warm-up). Costs a few seconds
    once per application — irrelevant against any real workload, and the
    data involved is generated in-memory (no inputs touched, nothing
    precomputed). Idempotent via a session marker; disable with
    ``warm_start=False``."""
    jvm_session_ids = getattr(_warm_start, "_done", set())
    _warm_start._done = jvm_session_ids
    sid = spark.sparkContext.applicationId
    if sid in jvm_session_ids:
        return
    jvm_session_ids.add(sid)
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="gondar_warm_")
    try:
        base = spark.range(2000).select(
            F.col("id"), (F.col("id") % 37).alias("k"),
            F.concat(F.lit("tok a b c d "),
                     F.col("id").cast("string")).alias("txt"),
        )
        base.write.mode("overwrite").parquet(f"{tmp}/t")
        pf = spark.read.parquet(f"{tmp}/t")
        (pf.select("k", F.explode(F.split("txt", " ")).alias("w"))
         .groupBy("w").agg(F.count("*").alias("n"), F.countDistinct("k"))
         .write.mode("overwrite").format("noop").save())
        w = Window.partitionBy("k").orderBy("id")
        win = pf.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        (win.join(pf.select(F.col("id").alias("id2"), "k"), "k")
         .groupBy("k").agg(F.sum("id2").alias("s"))
         .orderBy(F.desc("k")).limit(5)
         .write.mode("overwrite").format("noop").save())
        (pf.select(
            "id", F.md5(F.col("txt").cast("binary")).alias("h"),
            F.array_min(F.transform(
                F.split("txt", " "),
                lambda s: F.md5(s.cast("binary")))).alias("m"))
         .write.mode("overwrite").format("noop").save())
    except Exception:  # warm-up must never fail a session build
        pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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
