"""Streaming tests: incremental logfile tailing with multi-line holdback,
plus watermarked window pipelines over a deterministic event stream."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.streaming import (
    events_hourly_stream,
    register_logfile_stream_source,
    sessionize_stream,
    sessionize_with_state,
)
from hadoop_logfile_inputformat_spark.testing.loggen import FORMAT_A


def _await_rows(spark, query, table, want, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        got = spark.table(table).count()
        if got >= want:
            return
        time.sleep(0.3)
    raise AssertionError(f"only {spark.table(table).count()} rows, wanted {want}")


def test_logfile_stream_tails_incrementally(spark, tmp_path):
    """Append-as-you-go tailing: records appear as complete lines land;
    a record is only emitted once its terminator (next first-line or
    stable EOF) is seen."""
    log = tmp_path / "app.log"
    log.write_text("2024-01-01 00:00:00,000 | INFO | a | one\n")
    register_logfile_stream_source(spark)
    stream = (
        spark.readStream.format("logfile-stream")
        .option("pattern", FORMAT_A.replace("(?P<timestamp>", "(").replace("(?P<loglevel>", "("))
        .option("tailStableBatches", 1)
        .load(str(tmp_path))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tail_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # batch 1: only 'one' is complete once a second record starts
        with open(log, "a") as f:
            f.write("2024-01-01 00:00:01,000 | ERROR | a | boom\n\tat Frame.x(F.java:1)\n")
        _await_rows(spark, q, "tail_t", 1)
        rows = {r.record.split(" | ")[-1].split("\n")[0]
                for r in spark.table("tail_t").collect()}
        assert "one" in rows
        # the ERROR record is dangling (file may still grow); after the
        # file is stable for tailStableBatches polls it must flush
        _await_rows(spark, q, "tail_t", 2)
        recs = {r.offset: r.record for r in spark.table("tail_t").collect()}
        assert any("boom" in rec and "\n\tat" in rec for rec in recs.values())
    finally:
        q.stop()


def test_logfile_stream_offsets_are_replayable(spark, tmp_path):
    """readBetweenOffsets must reproduce a batch exactly (recovery)."""
    from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (
        LogfileSimpleStreamReader,
    )

    log = tmp_path / "x.log"
    pat = r"^\d{4}-\d{2}-\d{2} .*"
    log.write_text(
        "2024-01-01 a\n\tcont\n2024-01-02 b\n2024-01-03 c\n"
    )
    r = LogfileSimpleStreamReader(
        {"path": str(tmp_path), "pattern": pat, "tailstablebatches": 1}
    )
    start = r.initialOffset()
    rows1, off1 = r.read(start)
    rows1 = list(rows1)
    replay = list(r.readBetweenOffsets(start, off1))
    assert rows1 == replay
    # tail 'c' held back on the first poll (file not yet stable)
    texts = [rec for _, _, rec in rows1]
    assert texts == ["2024-01-01 a\n\tcont", "2024-01-02 b"]
    # second poll with no growth: file stable → tail flushes
    rows2, off2 = r.read(off1)
    assert [rec for _, _, rec in rows2] == ["2024-01-03 c"]


def _event_stream(spark, tmp_path, rows):
    src = tmp_path / "events_in"
    src.mkdir()
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, event_type string, value double")
    df.coalesce(1).write.parquet(str(src / "batch0"))
    return (
        spark.readStream.schema("ts timestamp, user_id long, event_type string, value double")
        .parquet(str(src / "*"))
    )


def test_events_hourly_stream_windows(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (base, 1, "click", 1.0),
        (base + dt.timedelta(minutes=30), 1, "click", 2.0),
        (base + dt.timedelta(hours=1, minutes=5), 2, "view", 5.0),
    ]
    agg = events_hourly_stream(_event_stream(spark, tmp_path, rows))
    q = (
        agg.writeStream.format("memory").queryName("hourly_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode: windows emit only when the watermark closes them;
        # feed a late-future event to push the watermark forward
        spark.createDataFrame(
            [(base + dt.timedelta(hours=5), 3, "click", 0.0)],
            "ts timestamp, user_id long, event_type string, value double",
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "events_in" / "b1"))
        _await_rows(spark, q, "hourly_t", 2)
        got = {(r.window_start.hour, r.event_type): (r.n_events, r.sum_value)
               for r in spark.table("hourly_t").collect()}
        assert got[(10, "click")] == (2, 3.0)
        assert got[(11, "view")] == (1, 5.0)
    finally:
        q.stop()


def test_sessionize_stream_gap_semantics(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (base, 1, "click", 1.0),
        (base + dt.timedelta(minutes=10), 1, "click", 1.0),   # same session
        (base + dt.timedelta(minutes=50), 1, "click", 1.0),   # new session
    ]
    agg = sessionize_stream(_event_stream(spark, tmp_path, rows))
    q = (
        agg.writeStream.format("memory").queryName("sess_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(base + dt.timedelta(hours=6), 9, "click", 0.0)],
            "ts timestamp, user_id long, event_type string, value double",
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "events_in" / "b1"))
        _await_rows(spark, q, "sess_t", 2)
        sess = [r for r in spark.table("sess_t").collect() if r.user_id == 1]
        assert len(sess) == 2
        assert sorted(r.n_events for r in sess) == [1, 2]
    finally:
        q.stop()


def test_stateful_sessionizer_closes_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionizer: a session closes when a later
    event proves the gap elapsed — across micro-batch boundaries — and
    the emitted row carries the custom accumulated state."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(mins, user, typ, val):
        return (t0 + dt.timedelta(minutes=mins), user, typ, val)

    src = tmp_path / "sess_in"
    src.mkdir()
    schema = "ts timestamp, user_id long, event_type string, value double"
    batch1 = [ev(0, 1, "view", 1.0), ev(5, 1, "click", 2.0),
              ev(0, 2, "view", 5.0)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        sessionize_with_state(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("sess_state")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("sess_state").count() == 0  # nothing closed yet

        # batch 2: user 1 comes back 40 min later -> first session closes;
        # user 2 stays silent -> still open
        batch2 = [ev(45, 1, "purchase", 3.0)]
        spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
            str(src / "b1")
        )
        q.processAllAvailable()
        rows = spark.table("sess_state").collect()
        assert len(rows) == 1
        s = rows[0]
        assert s.user_id == 1
        assert s.n_events == 2
        assert s.sum_value == 3.0
        assert s.first_type == "view" and s.last_type == "click"
        assert s.session_start == t0
        assert s.session_end == t0 + dt.timedelta(minutes=5)
    finally:
        q.stop()


def test_logfile_stream_to_windowed_counts(spark, tmp_path):
    """Composition: logfile-stream source -> typed parse -> level counts,
    end to end through the streaming engine."""
    from hadoop_logfile_inputformat_spark.functions.logparse import parse_log_records

    log = tmp_path / "app.log"
    log.write_text(
        "2024-01-01 00:00:00,000 | INFO | a | one\n"
        "2024-01-01 00:00:01,000 | WARN | a | two\n"
        "2024-01-01 00:00:02,000 | INFO | a | three\n"
        "2024-01-01 00:00:03,000 | ERROR | a | boom\n\tat X.y(Z.java:1)\n"
        "2024-01-01 00:00:04,000 | INFO | a | four\n"
    )
    register_logfile_stream_source(spark)
    stream = (
        spark.readStream.format("logfile-stream")
        .option("pattern", FORMAT_A.replace("(?P<timestamp>", "(").replace("(?P<loglevel>", "("))
        .option("tailStableBatches", 1)
        .load(str(tmp_path))
    )
    counts = parse_log_records(stream).groupBy("level").count()
    q = (
        counts.writeStream.format("memory").queryName("lvl_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_lvl"))
        .start()
    )
    try:
        deadline = time.time() + 60
        want = {"INFO": 3, "WARN": 1, "ERROR": 1}
        while time.time() < deadline:
            q.processAllAvailable()
            got = {r.level: r["count"] for r in spark.table("lvl_t").collect()}
            if got == want:
                break
            time.sleep(0.3)
        assert got == want
    finally:
        q.stop()
