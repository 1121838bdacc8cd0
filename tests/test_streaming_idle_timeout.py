"""Real idle-timeout coverage for the stateful sessionizer.

``idle_timeout=True`` registers a ProcessingTimeTimeout per user; the
engine keeps scheduling (empty) micro-batches while timeouts are pending,
so under a genuine ``processingTime`` trigger an idle user's OPEN session
is flushed once the gap elapses with no new data.  This is the mode a
long-running stream uses; the ``availableNow`` drains elsewhere in the
suite must use ``idle_timeout=False`` (pending timers make availableNow
spin forever — streaming/ingest.py docstring).

The contract asserted here is exactly the batch twin's open-session drop
rule: the timeout-emitted rows are precisely the sessions
``sessionize_events_batch`` drops (each user's final, still-open session),
and the gap-closed rows match the twin.
"""

import datetime as dt
import time


def test_idle_timeout_flushes_open_sessions(spark, tmp_path):
    from seq2kg_spark.streaming.ingest import (
        sessionize_events_batch,
        sessionize_events_stateful,
    )

    base = dt.datetime(2020, 1, 1, 9, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1, session A (gap-closed by the later events)
        (1, base, 1.0),
        (1, base + 0.2 * s, 1.0),
        (1, base + 0.4 * s, 1.0),
        # user 1, session B — last session, stays open on the data alone
        (1, base + 10 * s, 2.0),
        (1, base + 10.2 * s, 2.0),
        # user 2 — single session, open
        (2, base, 7.0),
    ]
    src = str(tmp_path / "ev_in")
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double")
    ev.coalesce(1).write.parquet(src)  # one file -> all events in batch 0

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    q = (
        sessionize_events_stateful(stream, gap_seconds=1, idle_timeout=True)
        .writeStream.format("memory")
        .queryName("idle_sessions")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # batch 0 emits the gap-closed session; the two open sessions
        # flush when their 1 s processing-time timers fire in a later
        # (possibly empty) micro-batch
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.sql("select * from idle_sessions").count() >= 3:
                break
            time.sleep(0.25)
    finally:
        q.stop()
        q.awaitTermination(60)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("select * from idle_sessions").collect()
    }
    closed = {(1, base, base + 0.4 * s, 3, 3.0)}
    open_flushed = {
        (1, base + 10 * s, base + 10.2 * s, 2, 4.0),
        (2, base, base, 1, 7.0),
    }
    assert got == closed | open_flushed

    # the batch twin emits exactly the gap-closed sessions…
    twin = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize_events_batch(ev, gap_seconds=1).collect()
    }
    assert twin == closed
    # …so the timeout-only rows are exactly the twin's dropped open set
    assert got - twin == open_flushed
