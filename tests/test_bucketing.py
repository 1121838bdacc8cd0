"""Bucketed co-located join: no Exchange in the join plan."""

import contextlib
import io

from pyspark.sql import functions as F

from seq2kg_spark.operators.bucketing import colocated_join, write_bucketed


def test_bucketed_join_is_shuffle_free(spark, pages):
    # saveAsTable writes to the session warehouse dir (./spark-warehouse,
    # gitignored); tables dropped at the end
    import shutil

    for t in ("pages_b", "stats_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    left = pages.select("url", "lang")
    right = pages.select("url", F.length("text").alias("n_chars"))
    write_bucketed(left, "pages_b", n_buckets=8)
    write_bucketed(right, "stats_b", n_buckets=8)
    joined = colocated_join(spark, "pages_b", "stats_b")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in plan
    # co-located buckets: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan, tree
    assert joined.count() == left.count()
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")
