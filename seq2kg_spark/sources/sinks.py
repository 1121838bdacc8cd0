"""S7 — triple sinks: parquet/Iceberg tables + reference-format CSV export.

The production sink is the bucketed parquet/Iceberg write in
:mod:`seq2kg_spark.operators.lineage`; this module adds the parity export —
the reference's exact CSV shapes so its evaluator can consume our output
directly:

* rule-based: header ``index,s1,r,s2``
  (candidate_extraction/triples_from_test_data.py:26-38)
* joint model: header ``index,s1,r,s2,t1,t2,ct1,ct2`` with space-joined
  type sets (joint_model/triples_from_test_data.py:28-40)
* filtering train data: ``index,s1,r,s2,label``
  (redcoat_parser/create_datasets.py:42-46)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_triples_csv(
    triples: DataFrame,
    path: str,
    *,
    index_col: str = "doc_idx",
    typed: bool = False,
    label_col: str | None = None,
) -> None:
    """Reference-format CSV export (single file per partition dir)."""
    cols = [
        F.col(index_col).cast("string").alias("index"),
        F.col("subj").alias("s1"),
        F.col("pred").alias("r"),
        F.col("obj").alias("s2"),
    ]
    if typed:
        cols += [
            F.array_join("subj_types", " ").alias("t1"),
            F.array_join("obj_types", " ").alias("t2"),
            F.lit("").alias("ct1"),
            F.lit("").alias("ct2"),
        ]
    if label_col:
        cols.append(F.col(label_col).cast("string").alias("label"))
    (
        triples.select(*cols)
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .csv(path)
    )


def write_graph_tables(nodes: DataFrame, edges: DataFrame, base: str) -> None:
    """Graph materialization sink (Iceberg seam: swap to writeTo())."""
    nodes.write.mode("overwrite").parquet(f"{base}/nodes")
    edges.write.mode("overwrite").parquet(f"{base}/edges")
