"""End-to-end resumable pipeline: pages → curated → triples → graph."""

import pyspark.sql.functions as F

from seq2kg_spark.plans.pipeline import run_kg_pipeline


def test_pipeline_end_to_end(spark, pages, tmp_path):
    report = run_kg_pipeline(
        pages.limit(60), str(tmp_path / "kg"), n_buckets=4, num_partitions=4
    )
    assert report["curate"]["processed"] == [0, 1, 2, 3]
    assert report["extract"]["processed"] == [0, 1, 2, 3]
    curated = spark.read.parquet(report["paths"]["curated"])
    triples = spark.read.parquet(report["paths"]["triples"])
    nodes = spark.read.parquet(report["paths"]["nodes"])
    edges = spark.read.parquet(report["paths"]["edges"])
    lineage = spark.read.parquet(report["paths"]["lineage"])
    # stage-0 gates: only English, quality-ok, first-copy pages survive
    n_curated = curated.count()
    assert 0 < n_curated <= 60
    assert curated.where(F.col("lang") != "en").count() == 0
    assert curated.groupBy(F.md5("text")).count() \
        .where(F.col("count") > 1).count() == 0
    assert triples.count() > 0
    assert nodes.count() > 0
    assert edges.count() > 0
    # one lineage row per bucket per stage
    per_stage = {r["stage"]: r["n"] for r in
                 lineage.groupBy("stage").agg(F.count("*").alias("n"))
                 .collect()}
    assert per_stage == {"curate": 4, "extract": 4}
    # rerun is a no-op for BOTH checkpointed stages
    report2 = run_kg_pipeline(
        pages.limit(60), str(tmp_path / "kg"), n_buckets=4, num_partitions=4
    )
    assert report2["curate"]["processed"] == []
    assert report2["extract"]["processed"] == []
