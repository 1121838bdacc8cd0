"""Structured Streaming ingest + multimodal binary-column plumbing."""

import pytest

from seq2kg_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_fake_image,
    media_features,
    resize_stub,
)
from seq2kg_spark.streaming.ingest import (
    read_pages_stream,
    stream_extract_triples,
)


def _media_df(spark, n=8):
    rows = [
        (f"m://{i}", "image", encode_fake_image(16 + i, 8 + i, seed=i),
         (16 + i, 8 + i, None, None, "x-fake"))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_streaming_extract_available_now(spark, pages, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages.limit(20).repartition(3).write.parquet(src)
    q = stream_extract_triples(
        read_pages_stream(spark, src), out, ckpt, available_now=True
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert got.columns == ["url", "subj", "pred", "obj"]
    # restart with no new files → no duplicates (checkpointed offsets)
    n1 = got.count()
    q2 = stream_extract_triples(
        read_pages_stream(spark, src), out, ckpt, available_now=True
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_media_features_histograms(spark):
    media = _media_df(spark)
    feats = media_features(media, n_bins=16, num_partitions=2).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-5
        assert r.width >= 16 and r.height >= 8


def test_media_features_audio_codec_and_kind_skew(spark):
    from seq2kg_spark.operators.multimodal import encode_fake_audio

    rows = [
        (f"m://img{i}", "image", encode_fake_image(16, 8, seed=i),
         (16, 8, None, None, "x-fake"))
        for i in range(9)
    ] + [
        # kind skew: one audio item, payload ~100× the images
        ("m://aud0", "audio", encode_fake_audio(16000, 12000, seed=1),
         (None, None, 16000, 12000, "x-fake-audio")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = media_features(media, n_bins=16, num_partitions=2).collect()
    assert len(feats) == 10
    aud = [r for r in feats if r.kind == "audio"]
    assert len(aud) == 1 and aud[0].width == 12000 and aud[0].height == 1
    for r in feats:
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-5


def test_media_decode_corrupt_and_unknown_format(spark):
    from seq2kg_spark.operators.multimodal import _decode

    with pytest.raises(ValueError):
        _decode(b"XXXX" + b"\x00" * 16, "x-fake-audio")
    with pytest.raises(NotImplementedError):
        _decode(b"RIFF....", "wav")


def test_media_resize_roundtrip(spark):
    media = _media_df(spark, n=3)
    resized = resize_stub(media, width=4, height=4).collect()
    assert len(resized) == 3
    for r in resized:
        assert len(bytes(r.payload)) == 4 + 8 + 16  # magic + dims + pixels


def test_unknown_format_raises(spark):
    rows = [("m://x", "image", b"JPEGDATA", (1, 1, None, None, "jpeg"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception, match="no codec|NotImplemented"):
        media_features(media).collect()


def test_streaming_dedup(spark, pages, tmp_path):
    from pyspark.sql import functions as F

    from seq2kg_spark.streaming.ingest import (
        read_pages_stream,
        stream_dedup_pages,
    )

    src = str(tmp_path / "dup_in")
    # write the same 10 pages twice (two files → duplicate rows)
    ten = pages.limit(10)
    ten.write.parquet(src)
    ten.write.mode("append").parquet(src)
    q = stream_dedup_pages(
        read_pages_stream(spark, src),
        str(tmp_path / "dup_out"), str(tmp_path / "dup_ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "dup_out"))
    assert out.count() == 10
    assert out.select("url").distinct().count() == 10


def test_stateful_sessionization(spark, tmp_path):
    import datetime as dt

    from seq2kg_spark.streaming.ingest import sessionize_events_stateful

    base = dt.datetime(2020, 1, 1, 9, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2h gap; user 2: one session
    for i in range(3):
        rows.append((1, base + dt.timedelta(minutes=5 * i), 1.0))
    for i in range(2):
        rows.append((1, base + dt.timedelta(hours=3, minutes=5 * i), 2.0))
    rows.append((2, base, 7.0))
    src = str(tmp_path / "ev_in")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    q = (
        # idle_timeout=False so availableNow terminates when drained
        # (pending processing-time timeouts would spin empty batches until
        # the awaitTermination deadline)
        sessionize_events_stateful(stream, gap_seconds=1800,
                                    idle_timeout=False)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.user_id, r.n_events, r.sum_value)
           for r in spark.sql("select * from sessions").collect()}
    # only CLOSED sessions are emitted: user 1's first session closed by
    # the 2h gap; the open sessions stay in state
    assert (1, 3, 3.0) in got

def test_stream_drain_equals_batch_twin(spark):
    """The availableNow drain of the stateful sessionizer must emit exactly
    the sessions the pure-SQL batch twin computes (closed sessions only —
    each user's final session stays open in state).  The twin doubles as
    the hash-exact `sessions_batch` driver oracle."""
    from seq2kg_spark.streaming.ingest import (
        sessionize_events_batch,
        sessionize_events_stateful,
    )

    sf_dir = "/root/testdata/sf0.001"
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        .select("user_id", "ts", "value")
    )
    q = (
        sessionize_events_stateful(stream, gap_seconds=3600,
                                   idle_timeout=False)
        .writeStream.format("memory").queryName("drain_vs_batch")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    drained = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.sum_value, 6))
        for r in spark.sql("select * from drain_vs_batch").collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.sum_value, 6))
        for r in sessionize_events_batch(ev, gap_seconds=3600).collect()
    }
    assert drained == batch and len(batch) > 0

def test_md5_payload_encoders_roundtrip(spark):
    """md5-derived payloads ride the SAME container/decoder as the
    RandomState ones; normalize=False emits integer bin counts that sum to
    the decoded size (the hash-exact media_features_int preconditions)."""
    import hashlib

    import numpy as np

    from seq2kg_spark.operators.multimodal import (
        _decode,
        encode_fake_audio_md5,
        encode_fake_image_md5,
        media_features,
    )

    img = _decode(encode_fake_image_md5(4, 3, seed=7), "x-fake")
    assert img.shape == (3, 4)
    assert img[0, 0] == hashlib.md5(b"7:0").digest()[0]
    wav = _decode(encode_fake_audio_md5(16000, 5, seed=9), "x-fake-audio")
    d = hashlib.md5(b"9:2").digest()
    assert wav[2] == np.int16(d[0] * 256 + d[1] - 32768)

    rows = [
        ("media://a", "image", encode_fake_image_md5(6, 6, 1),
         {"width": 6, "height": 6, "sample_rate": None, "n_frames": None,
          "format": "x-fake"}),
        ("media://b", "audio", encode_fake_audio_md5(16000, 64, 2),
         {"width": None, "height": None, "sample_rate": 16000,
          "n_frames": 64, "format": "x-fake-audio"}),
    ]
    from seq2kg_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.url: r for r in media_features(media, normalize=False)
           .collect()}
    assert sum(got["media://a"].feature) == 36
    assert sum(got["media://b"].feature) == 64
    assert got["media://b"].width == 64 and got["media://b"].height == 1

def test_windowed_counts_drain_equals_batch_twin(spark, tmp_path):
    """availableNow drain of the watermarked tumbling-window rollup must
    emit exactly the windows the batch twin computes (append mode emits a
    window only once the final watermark passes its end)."""
    from seq2kg_spark.streaming.ingest import (
        windowed_event_counts,
        windowed_event_counts_batch,
    )

    sf_dir = "/root/testdata/sf0.001"
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    import pyspark.sql.functions as F

    # watermarks require TIMESTAMP (not the parquet NTZ default): cast on
    # BOTH sides so window bounds line up
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        .select(F.col("ts").cast("timestamp").alias("ts"),
                "event_type", "value")
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory").queryName("wc_drain")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    drained = {
        (r.window_start, r.window_end, r.event_type, r.n,
         round(r.sum_value, 6))
        for r in spark.sql("select * from wc_drain").collect()
    }
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    batch = {
        (r.window_start, r.window_end, r.event_type, r.n,
         round(r.sum_value, 6))
        for r in windowed_event_counts_batch(ev).collect()
    }
    assert drained == batch and len(batch) > 0
