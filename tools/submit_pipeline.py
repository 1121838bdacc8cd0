"""spark-submit entry point for the KG pipeline (north-rule packaging).

Usage:
    python -c "from seq2kg_spark.packaging import build_package_zip; \\
               print(build_package_zip())"   # -> /tmp/seq2kg_spark_*.zip
    spark-submit --master local[8] --py-files <zip> tools/submit_pipeline.py \\
        <pages_parquet> <workdir> [n_buckets]

Runs the resumable two-stage pipeline (extract → canonicalize) and prints a
one-line JSON report.  No sys.path tricks here — the package must arrive
via --py-files, which is exactly what this script exists to prove.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    pages_path = sys.argv[1]
    workdir = sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = SparkSession.builder.appName("seq2kg-submit").getOrCreate()
    from seq2kg_spark.plans.pipeline import run_kg_pipeline
    from seq2kg_spark.sources.pages import read_pages

    pages = read_pages(spark, pages_path)
    report = run_kg_pipeline(pages, workdir, n_buckets=n_buckets)
    triples = spark.read.parquet(report["paths"]["triples"]).count()
    nodes = spark.read.parquet(report["paths"]["nodes"]).count()
    edges = spark.read.parquet(report["paths"]["edges"]).count()
    print(json.dumps({
        "curated_buckets": report["curate"]["processed"],
        "curated_skipped": report["curate"]["skipped"],
        "processed_buckets": report["extract"]["processed"],
        "skipped_buckets": report["extract"]["skipped"],
        "triples": triples, "nodes": nodes, "edges": edges,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
