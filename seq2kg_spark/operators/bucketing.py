"""Bucketed tables — shuffle-free co-located joins for repeated keys.

At 100 TB the triples table is joined on ``url`` again and again (back to
pages for provenance, to lineage, to quality scores).  Hash-bucketing both
sides on the join key at WRITE time makes every later equi-join
shuffle-free (SortMergeJoin without Exchange), paying one shuffle once
instead of per query.  This is the parquet/Iceberg `bucket(url, N)`
partition-transform seam; Spark needs ``saveAsTable`` (a metastore entry)
for bucket metadata, so these helpers wrap that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url"
) -> DataFrame:
    """Join two same-bucketed tables: SortMergeJoin with NO shuffle
    exchange (the MERGE hint keeps the small-table broadcast path from
    masking the demonstration; at real scale SMJ is what the planner
    picks anyway)."""
    return (
        spark.table(left_table).hint("merge")
        .join(spark.table(right_table), key)
    )
