"""End-to-end resumable pipeline: pages → triples → canonical graph."""

from seq2kg_spark.plans.pipeline import run_kg_pipeline


def test_pipeline_end_to_end(spark, pages, tmp_path):
    report = run_kg_pipeline(
        pages.limit(60), str(tmp_path / "kg"), n_buckets=4, num_partitions=4
    )
    assert report["extract"]["processed"] == [0, 1, 2, 3]
    triples = spark.read.parquet(report["paths"]["triples"])
    nodes = spark.read.parquet(report["paths"]["nodes"])
    edges = spark.read.parquet(report["paths"]["edges"])
    lineage = spark.read.parquet(report["paths"]["lineage"])
    assert triples.count() > 0
    assert nodes.count() > 0
    assert edges.count() > 0
    assert lineage.count() == 4
    # rerun is a no-op for the extract stage
    report2 = run_kg_pipeline(
        pages.limit(60), str(tmp_path / "kg"), n_buckets=4, num_partitions=4
    )
    assert report2["extract"]["processed"] == []
