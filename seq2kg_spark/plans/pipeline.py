"""End-to-end KG construction plan: pages → triples → canonical graph.

The full Seq2KG-equivalent flow with checkpoint/lineage at each stage
boundary (north rule).  Stages:

1. extract   — lang filter → salted size-bucketed repartition → T1 clean →
               rule-based extraction (mapInPandas) → triples table.
2. canonical — mention LSH blocking → connected components → nodes/edges.

Each stage writes bucketed parquet + lineage rows via
:mod:`seq2kg_spark.operators.lineage`; a rerun after a kill resumes from
the last committed bucket.  In production the writes target Iceberg tables;
the seam is the ``.write.parquet`` call in lineage.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from seq2kg_spark.operators.canonicalize import canonicalize
from seq2kg_spark.operators.extract import extract_triples
from seq2kg_spark.operators.lineage import run_stage_checkpointed


def run_kg_pipeline(
    pages: DataFrame,
    workdir: str,
    *,
    n_buckets: int = 16,
    num_partitions: int | None = None,
    canon_threshold: float = 0.55,
) -> dict:
    """Run the resumable two-stage pipeline; returns stage reports + paths."""
    spark = pages.sparkSession
    triples_path = os.path.join(workdir, "triples")
    lineage_path = os.path.join(workdir, "lineage")

    def extract_stage(bucketed: DataFrame) -> DataFrame:
        t = extract_triples(
            bucketed.select("url", "text", "lang", "bucket"),
            num_partitions=num_partitions,
        )
        # re-derive the bucket from url: deterministic, survives the UDF
        from pyspark.sql import functions as F

        return t.withColumn(
            "bucket",
            F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"),
        )

    report_extract = run_stage_checkpointed(
        pages,
        extract_stage,
        stage="extract",
        out_path=triples_path,
        lineage_path=lineage_path,
        key_col="url",
        n_buckets=n_buckets,
    )

    triples = spark.read.parquet(triples_path)
    nodes, edges = canonicalize(triples, threshold=canon_threshold)
    nodes_path = os.path.join(workdir, "nodes")
    edges_path = os.path.join(workdir, "edges")
    nodes.write.mode("overwrite").parquet(nodes_path)
    edges.write.mode("overwrite").parquet(edges_path)
    return {
        "extract": report_extract,
        "paths": {
            "triples": triples_path,
            "nodes": nodes_path,
            "edges": edges_path,
            "lineage": lineage_path,
        },
    }
