"""The pages→triples Spark operator: correctness + partition independence."""

from pyspark.sql import functions as F

from seq2kg_spark.operators.extract import extract_triples


def _sorted_rows(df):
    return sorted(
        ((r.url, r.subj, r.pred, r.obj) for r in df.collect())
    )


def test_extract_nonempty_and_schema(spark, pages):
    t = extract_triples(pages.limit(30), num_partitions=4)
    assert t.columns == ["url", "subj", "pred", "obj"]
    rows = t.collect()
    assert len(rows) > 10
    assert all(r.subj and r.pred and r.obj for r in rows)


def test_extract_partition_independence(spark, pages):
    small = pages.limit(40)
    a = _sorted_rows(extract_triples(small, num_partitions=2))
    b = _sorted_rows(extract_triples(small, num_partitions=13))
    assert a == b


def test_extract_filters_language(spark, pages):
    t = extract_triples(pages)
    de_urls = [r.url for r in pages.where(F.col("lang") != "en")
               .select("url").collect()]
    if de_urls:
        assert t.where(F.col("url").isin(de_urls)).count() == 0
