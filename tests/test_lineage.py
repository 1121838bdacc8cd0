"""Checkpoint/lineage/resume: killed runs must not recompute done buckets."""

import shutil

from pyspark.sql import functions as F

from seq2kg_spark.operators.lineage import (
    completed_buckets,
    read_lineage,
    run_stage_checkpointed,
)

_CALLS = {"n": 0}


def _stage(df):
    # identity-ish stage that tags rows; bucket column must be preserved
    return df.withColumn("out_val", F.length("url").cast("long"))


def test_resume_skips_completed_buckets(spark, pages, tmp_path):
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    inp = pages.select("url", "text")

    r1 = run_stage_checkpointed(
        inp, _stage, stage="tag", out_path=out, lineage_path=lin, n_buckets=8
    )
    assert r1["processed"] == list(range(8))
    total = spark.read.parquet(out).count()
    assert total == inp.count()
    assert completed_buckets(spark, lin, "tag") == set(range(8))

    # simulate a killed run: drop lineage for half the buckets and corrupt
    # their output dirs
    lin_df = read_lineage(spark, lin)
    keep_rows = lin_df.where(F.col("bucket") < 4).collect()
    shutil.rmtree(lin)
    spark.createDataFrame(keep_rows, lin_df.schema).write.mode(
        "overwrite"
    ).parquet(lin)
    for b in range(4, 8):
        shutil.rmtree(f"{out}/bucket={b}", ignore_errors=True)

    r2 = run_stage_checkpointed(
        inp, _stage, stage="tag", out_path=out, lineage_path=lin, n_buckets=8
    )
    assert r2["processed"] == [4, 5, 6, 7]
    assert r2["skipped"] == [0, 1, 2, 3]
    # final table identical to the uninterrupted run
    assert spark.read.parquet(out).count() == total
    # lineage now covers all buckets; recomputed ones carry the new run_id
    lin2 = read_lineage(spark, lin)
    assert lin2.select("bucket").distinct().count() == 8
    run_ids = {r.bucket: r.run_id for r in lin2.collect()}
    assert run_ids[0] != run_ids[7]


def test_noop_when_all_buckets_done(spark, pages, tmp_path):
    out = str(tmp_path / "out2")
    lin = str(tmp_path / "lineage2")
    inp = pages.select("url", "text").limit(50)
    run_stage_checkpointed(
        inp, _stage, stage="tag", out_path=out, lineage_path=lin, n_buckets=4
    )
    r = run_stage_checkpointed(
        inp, _stage, stage="tag", out_path=out, lineage_path=lin, n_buckets=4
    )
    assert r["processed"] == []
    assert r["skipped"] == [0, 1, 2, 3]
