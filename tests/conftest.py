import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from seq2kg_spark.session import get_spark

    s = get_spark("seq2kg-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages(spark):
    from seq2kg_spark.sources.pages import build_pages_corpus

    return build_pages_corpus(spark, n_rows=300).cache()
