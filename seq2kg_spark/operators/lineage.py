"""Checkpointed, resumable pipeline runs with per-partition lineage.

North-rule requirement: every stage checkpoints with per-partition lineage
rows (partition id, url range, row counts, wall time) so a killed job
resumes without recomputing finished partitions.

Design (works the same on parquet here and Iceberg in production):

* The unit of work is a deterministic **bucket**: ``pmod(xxhash64(url), K)``.
  Buckets are stable across runs and machines — resume-safe by
  construction (no rand(), no timestamps in the key).
* Output is written under ``<out>/bucket=<i>/`` (hive-style partition
  dirs); the lineage table is a parquet dir of small per-bucket rows.
* **Resume = anti-join**: buckets present in lineage are skipped; the rest
  are (re)computed with dynamic-partition overwrite, so a half-written
  bucket dir from a killed run is replaced atomically-enough (Iceberg
  commits make this fully atomic in production).
* The lineage row is written only *after* the bucket's data is committed:
  lineage row present ⇒ bucket complete.  A crash between data and lineage
  writes costs one recompute, never corruption.

Metrics per bucket: url range, input/output row counts, wall-clock ms.
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, bucket int, url_min string, url_max string, "
    "n_input long, n_output long, wall_ms long, run_id string, "
    "committed_at timestamp"
)


def with_bucket(df: DataFrame, key_col: str = "url", n_buckets: int = 16) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def read_lineage(spark: SparkSession, lineage_path: str) -> DataFrame:
    if os.path.exists(lineage_path) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(lineage_path) for f in fs
    ):
        return spark.read.parquet(lineage_path)
    return spark.createDataFrame([], LINEAGE_SCHEMA)


def completed_buckets(spark: SparkSession, lineage_path: str, stage: str) -> set[int]:
    lin = read_lineage(spark, lineage_path)
    return {
        r.bucket for r in lin.where(F.col("stage") == stage)
        .select("bucket").distinct().collect()
    }


def run_stage_checkpointed(
    inputs: DataFrame,
    stage_fn: Callable[[DataFrame], DataFrame],
    *,
    stage: str,
    out_path: str,
    lineage_path: str,
    key_col: str = "url",
    n_buckets: int = 16,
    run_id: str | None = None,
) -> dict:
    """Run ``stage_fn`` over all not-yet-committed buckets; commit + log.

    Returns {"processed": [...], "skipped": [...], "run_id": ...}.
    The stage_fn receives the bucketed input slice (all pending buckets in
    ONE Spark job — resume granularity is per bucket, execution is fully
    parallel) and must preserve the ``bucket`` and ``key_col`` columns.
    """
    spark = inputs.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    done = completed_buckets(spark, lineage_path, stage)
    bucketed = with_bucket(inputs, key_col, n_buckets)
    pending = sorted(set(range(n_buckets)) - done)
    if not pending:
        return {"processed": [], "skipped": sorted(done), "run_id": run_id}

    todo = bucketed.where(F.col("bucket").isin(pending))
    t0 = time.monotonic()
    result = stage_fn(todo)
    assert "bucket" in result.columns, "stage_fn must preserve the bucket column"
    (
        result.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(out_path)
    )
    wall_ms = int((time.monotonic() - t0) * 1000)

    # per-bucket metrics from the committed output (cheap scan of new dirs)
    out = spark.read.parquet(out_path).where(F.col("bucket").isin(pending))
    in_counts = {
        r.bucket: (r.n, r.lo, r.hi)
        for r in todo.groupBy("bucket").agg(
            F.count("*").alias("n"),
            F.min(key_col).alias("lo"),
            F.max(key_col).alias("hi"),
        ).collect()
    }
    out_counts = {
        r.bucket: r.n
        for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    rows = [
        (
            stage, int(b),
            in_counts.get(b, (0, None, None))[1],
            in_counts.get(b, (0, None, None))[2],
            int(in_counts.get(b, (0, None, None))[0]),
            int(out_counts.get(b, 0)),
            wall_ms,
            run_id,
        )
        for b in pending
    ]
    lineage_rows = spark.createDataFrame(
        rows,
        "stage string, bucket int, url_min string, url_max string, "
        "n_input long, n_output long, wall_ms long, run_id string",
    ).withColumn("committed_at", F.current_timestamp())
    lineage_rows.write.mode("append").parquet(lineage_path)
    return {"processed": pending, "skipped": sorted(done), "run_id": run_id}
