"""SparkSession factory with scale-oriented defaults.

The settings below are the ones that matter at 100 TB just as much as on
``local[32]``:

* AQE on (runtime coalesce + skew-join splitting) — document-length skew is
  the dominant hazard in a web-corpus NLP pipeline.
* Arrow enabled and batch size bounded so a pandas-UDF batch of
  (rows x tokens x embedding-dim) floats stays well inside executor memory.
* A generous broadcast threshold: every dimension-ish table we join
  (stopwords, label vocabularies, reference goldens) is tiny.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 64
ARROW_MAX_RECORDS = 512  # 512 docs x ~100 tokens x 64 floats ≈ 13 MB / batch


def get_spark(
    app_name: str = "seq2kg-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    On a real cluster these settings move to spark-submit conf; nothing in
    the package assumes local mode.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or 32
    n = int(cpus)
    # Pin BLAS to one thread per Python worker BEFORE the JVM launches (the
    # workers inherit the JVM's env, which inherits ours).  Spark supplies
    # the parallelism; a threaded BLAS inside each of N workers
    # oversubscribes the host N-fold, and on the GRU hot path's small
    # matmuls the per-call thread sync alone measured ~2x wall.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(2 * n, DEFAULT_SHUFFLE_PARTITIONS)),
        )
        # same pinning for real-cluster executors (no-op in local mode)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Ship the package to executor Python workers (the --py-files story;
    # required whenever the driver wasn't launched from the repo root).
    from seq2kg_spark.packaging import ship_package

    ship_package(spark)
    return spark
