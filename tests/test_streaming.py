"""Streaming tests: incremental logfile tailing with multi-line holdback,
plus watermarked window pipelines over a deterministic event stream."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.streaming import (
    dedup_stream,
    enrich_stream_with_dim,
    events_hourly_stream,
    purchases_joined_to_clicks_stream,
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


def test_observe_scan_stream_metrics_in_progress(spark, tmp_path):
    """Streaming parity of S7f getProgress (VERDICT r6 #5): the
    observe_scan metrics must ride the micro-batch and surface in
    StreamingQueryProgress.observedMetrics — per batch, with
    n_records/record_bytes matching the rows that batch emitted."""
    from hadoop_logfile_inputformat_spark.sources.logfile import (
        observe_scan_stream,
    )

    log = tmp_path / "app.log"
    line1 = "2024-01-01 00:00:00,000 | INFO | a | one\n"
    line2 = "2024-01-01 00:00:01,000 | WARN | a | two\n"
    log.write_text(line1 + line2)
    register_logfile_stream_source(spark)
    stream = (
        spark.readStream.format("logfile-stream")
        .option("pattern", FORMAT_A.replace("(?P<timestamp>", "(").replace("(?P<loglevel>", "("))
        .option("tailStableBatches", 1)
        .load(str(tmp_path))
    )
    observed = observe_scan_stream(stream, "scan_m")
    q = (
        observed.writeStream.format("memory")
        .queryName("obs_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        _await_rows(spark, q, "obs_t", 2)
        # find the progress event that carried rows (holdback polls
        # produce empty batches whose metrics row reports 0 records)
        metrics = [
            p["observedMetrics"]["scan_m"]
            for p in (q.recentProgress or [])
            if p.get("observedMetrics", {}).get("scan_m")
        ]
        assert metrics, "no observedMetrics surfaced in progress events"
        total_records = sum(m["n_records"] for m in metrics)
        total_bytes = sum(m["record_bytes"] for m in metrics)
        assert total_records == 2
        # record bodies exclude the trailing newline
        assert total_bytes == len(line1) + len(line2) - 2
        carrying = [m for m in metrics if m["n_records"] > 0]
        assert all(m["n_files"] >= 1 and m["max_offset"] >= 0 for m in carrying)
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


def test_dedup_stream_drops_within_watermark_duplicates(spark, tmp_path):
    """Duplicate rows arriving inside the watermark horizon collapse to
    one; distinct rows all survive."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (base, 1, "click", 1.0),
        (base + dt.timedelta(minutes=1), 1, "click", 1.0),  # dup (same key)
        (base + dt.timedelta(minutes=2), 1, "click", 2.0),  # distinct value
        (base + dt.timedelta(minutes=3), 2, "view", 5.0),
    ]
    out = dedup_stream(_event_stream(spark, tmp_path, rows))
    q = (
        out.writeStream.format("memory").queryName("dedup_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .start()
    )
    try:
        _await_rows(spark, q, "dedup_t", 3)
        got = {(r.user_id, r.event_type, r.value)
               for r in spark.table("dedup_t").collect()}
        assert got == {(1, "click", 1.0), (1, "click", 2.0), (2, "view", 5.0)}
        assert spark.table("dedup_t").count() == 3
    finally:
        q.stop()


def test_stream_stream_interval_join_matches_within_horizon(spark, tmp_path):
    """Purchases join clicks of the same user within the 1 h horizon;
    older clicks and other users don't match."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (base, 1, "click", 1.0),                             # in horizon
        (base - dt.timedelta(hours=3), 1, "click", 9.0),     # too old
        (base + dt.timedelta(minutes=30), 1, "purchase", 0.0),
        (base, 2, "click", 7.0),                             # other user
        (base + dt.timedelta(minutes=10), 3, "purchase", 0.0),  # no click
    ]
    out = purchases_joined_to_clicks_stream(_event_stream(spark, tmp_path, rows))
    q = (
        out.writeStream.format("memory").queryName("ssj_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ssj"))
        .start()
    )
    try:
        _await_rows(spark, q, "ssj_t", 1)
        got = [(r.user_id, r.click_value) for r in spark.table("ssj_t").collect()]
        assert got == [(1, 1.0)]
    finally:
        q.stop()


def test_stream_static_enrichment_broadcasts(spark, tmp_path):
    """Stream-static join attaches dim attributes without shuffling the
    stream side (broadcast asserted on the physical plan)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(base, 1, "click", 1.0), (base, 2, "view", 2.0)]
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    out = enrich_stream_with_dim(_event_stream(spark, tmp_path, rows), dim)
    q = (
        out.writeStream.format("memory").queryName("enrich_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_en"))
        .start()
    )
    try:
        _await_rows(spark, q, "enrich_t", 2)
        got = {(r.user_id, r.tier) for r in spark.table("enrich_t").collect()}
        assert got == {(1, "gold"), (2, "silver")}
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            q.explain()
        assert "BroadcastHashJoin" in buf.getvalue(), (
            "stream-static enrichment must broadcast the dim side"
        )
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


def test_partitioned_reader_multi_file_parallel_plan(tmp_path):
    """The DataSourceStreamReader plans one partition per file backlog
    (and byte-splits a big backlog), reads them independently, and
    commits only terminated records."""
    from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (
        LogfileStreamReader,
    )

    pat = r"\d{4}-\d{2}-\d{2} .*"
    f1 = tmp_path / "a.log"
    f2 = tmp_path / "b.log"
    f1.write_text("2024-01-01 a1\n\tcont\n2024-01-02 a2\n2024-01-03 dangling")
    f2.write_text("2024-01-01 b1\n2024-01-02 b2\n")
    r = LogfileStreamReader({"path": str(tmp_path), "pattern": pat,
                             "tailstablebatches": 99})
    start = r.initialOffset()
    end = r.latestOffset()
    parts = r.partitions(start, end)
    assert sorted(p.path for p in parts) == [str(f1), str(f2)]
    rows = []
    for p in parts:
        for batch in r.read(p):
            rows.extend(zip(batch.column(0).to_pylist(),
                            batch.column(1).to_pylist(),
                            batch.column(2).to_pylist()))
    texts = sorted(rec for _, _, rec in rows)
    # only records whose terminating first-line exists as a COMPLETE
    # line are committed: a2's would-be terminator ('2024-01-03
    # dangling') has no newline yet, so a2 and the dangling tail are
    # both held back; likewise b2 (last record of b.log)
    assert texts == ["2024-01-01 a1\n\tcont", "2024-01-01 b1"]
    # stability flush: same sizes for tailStableBatches polls → tail emits
    r2 = LogfileStreamReader({"path": str(tmp_path), "pattern": pat,
                              "tailstablebatches": 1})
    r2.latestOffset()
    end2 = r2.latestOffset()  # second poll: stable → ends == sizes
    parts2 = r2.partitions(end, end2)
    rows2 = []
    for p in parts2:
        for batch in r2.read(p):
            rows2.extend(batch.column(2).to_pylist())
    assert sorted(rows2) == [
        "2024-01-02 a2", "2024-01-02 b2", "2024-01-03 dangling",
    ]


def test_partitioned_reader_byte_splits_large_backlog(tmp_path):
    from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (
        LogfileStreamReader,
    )

    pat = r"\d{4}-\d{2}-\d{2} .*"
    f1 = tmp_path / "big.log"
    with open(f1, "w") as f:
        for i in range(2000):
            f.write(f"2024-01-01 record number {i:06d} with some padding text\n")
    r = LogfileStreamReader({"path": str(tmp_path), "pattern": pat,
                             "maxpartitionbytes": 4096, "tailstablebatches": 99})
    end = r.latestOffset()
    parts = r.partitions(r.initialOffset(), end)
    assert len(parts) > 4, "large backlog must fan out into byte-range splits"
    rows = []
    for p in parts:
        for batch in r.read(p):
            rows.extend(zip(batch.column(1).to_pylist(), batch.column(2).to_pylist()))
    # multiset equality with a single-split read (split invariance)
    r_one = LogfileStreamReader({"path": str(tmp_path), "pattern": pat,
                                 "tailstablebatches": 99})
    end1 = r_one.latestOffset()
    [p_one] = [p for p in r_one.partitions(r_one.initialOffset(), end1)]
    rows_one = []
    for batch in r_one.read(p_one):
        rows_one.extend(zip(batch.column(1).to_pylist(), batch.column(2).to_pylist()))
    assert sorted(rows) == sorted(rows_one)
    assert len(rows) == 1999  # last record held back (not terminated)


def test_partitioned_reader_replay_deterministic_under_append(tmp_path):
    """Re-reading a committed batch after the file grew must reproduce
    the original rows exactly (reads are capped at the batch-end
    offset)."""
    from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (
        LogfileStreamReader,
    )

    pat = r"\d{4}-\d{2}-\d{2} .*"
    log = tmp_path / "x.log"
    log.write_text("2024-01-01 a\n\tc1\n2024-01-02 b\n")
    r = LogfileStreamReader({"path": str(tmp_path), "pattern": pat,
                             "tailstablebatches": 1})
    r.latestOffset()
    end = r.latestOffset()  # stable → tail flushes: commit includes 'b'
    parts = r.partitions(r.initialOffset(), end)
    def read_all(reader, ps):
        out = []
        for p in ps:
            for batch in reader.read(p):
                out.extend(zip(batch.column(1).to_pylist(),
                               batch.column(2).to_pylist()))
        return sorted(out)
    rows1 = read_all(r, parts)
    assert [rec for _, rec in rows1] == ["2024-01-01 a\n\tc1", "2024-01-02 b"]
    # the file grows: continuation of 'b' plus a new record arrive AFTER
    # the batch was committed
    with open(log, "a") as f:
        f.write("\tlate-continuation\n2024-01-03 c\n")
    rows_replay = read_all(r, r.partitions(r.initialOffset(), end))
    assert rows_replay == rows1, "replay saw bytes appended after commit"


def test_simple_reader_replay_deterministic_under_append(tmp_path):
    from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (
        LogfileSimpleStreamReader,
    )

    pat = r"\d{4}-\d{2}-\d{2} .*"
    log = tmp_path / "y.log"
    log.write_text("2024-01-01 a\n2024-01-02 b\n")
    r = LogfileSimpleStreamReader({"path": str(tmp_path), "pattern": pat,
                                   "tailstablebatches": 1})
    start = r.initialOffset()
    rows1, off1 = r.read(start)
    rows1 = list(rows1)
    with open(log, "a") as f:
        f.write("\tappended-after-commit\n2024-01-03 c\n")
    assert list(r.readBetweenOffsets(start, off1)) == rows1


def test_stream_readers_exclude_compressed_rotation_artifacts(tmp_path):
    """The streaming offset model indexes raw bytes; a rotated .gz
    artifact appearing in the watched glob (dir/* matches app.log.1.gz)
    must be excluded from the file set, not mis-scanned — its content
    was already consumed while it was the live plain file."""
    import gzip

    from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (
        LogfileSimpleStreamReader,
        LogfileStreamReader,
    )

    live = tmp_path / "app.log"
    live.write_text("2024-01-01 00:00:00,000 | INFO | a | one\n")
    with gzip.open(tmp_path / "app.log.1.gz", "wt") as f:
        f.write("2023-12-31 23:59:59,000 | INFO | a | old\n")
    (tmp_path / "app.log.2.zst").write_bytes(b"\x28\xb5\x2f\xfd fake")
    opts = {"path": str(tmp_path), "pattern": FORMAT_A}
    for reader_cls in (LogfileSimpleStreamReader, LogfileStreamReader):
        files = reader_cls(opts)._files()
        assert files == [str(live)], reader_cls.__name__


def test_near_dup_stream_probes_and_grows_index(spark, tmp_path):
    """Streaming incremental dedup: each micro-batch is probed against
    the persisted LSH index AND appended to it, so batch 2 finds its
    near-dup of a batch-1 document.  Also asserts foreachBatch-replay
    idempotence (overwritten pairs partition, skipped index append)."""
    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.streaming import near_dup_stream

    for t in ("t_stream_idx_buckets", "t_stream_idx_sets", "t_stream_idx_batches"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    base = "the quick brown fox jumps over the lazy dog beside the river today"
    alt = "many colorful parrots squawk loudly above the ancient temple ruins at dawn"
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(1, base)], schema)
    dedup.build_minhash_index(
        spark, corpus, "t_stream_idx", n_buckets=2, path=str(tmp_path / "idx")
    )
    src = tmp_path / "docs_in"
    src.mkdir()
    sink = str(tmp_path / "pairs")
    # batch 1: 101 near-dups the seed corpus doc; 102 is novel
    spark.createDataFrame(
        [(101, base + " extra"), (102, alt)], schema
    ).coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = near_dup_stream(
        stream, "t_stream_idx", sink, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        got1 = {(r.doc_a, r.doc_b) for r in spark.read.parquet(sink).collect()}
        assert (1, 101) in got1
        assert not any(b == 102 for _, b in got1)

        # batch 2: 201 near-dups 102 — only findable if batch 1 was
        # appended to the index
        spark.createDataFrame([(201, alt + " extra")], schema).coalesce(
            1
        ).write.parquet(str(src / "b1"))
        q.processAllAvailable()
        got2 = {(r.doc_a, r.doc_b) for r in spark.read.parquet(sink).collect()}
        assert (102, 201) in got2
    finally:
        q.stop()
        n_bucket_rows = spark.table("t_stream_idx_buckets").count()

        # replaying an already-applied batch must neither duplicate
        # pairs nor re-append index rows
        from hadoop_logfile_inputformat_spark.streaming import (
            near_dup_stream_batch,
        )

        replay = spark.createDataFrame([(201, alt + " extra")], schema)
        near_dup_stream_batch(replay, "t_stream_idx", sink, batch_id=1)
        assert spark.table("t_stream_idx_buckets").count() == n_bucket_rows
        got3 = {(r.doc_a, r.doc_b) for r in spark.read.parquet(sink).collect()}
        assert got3 == got2
        for t in ("t_stream_idx_buckets", "t_stream_idx_sets", "t_stream_idx_batches"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_near_dup_stream_compaction_bounds_index_files(spark, tmp_path):
    """20-micro-batch soak: every micro-batch appends n_buckets files
    per index table, so an unmaintained stream reaches
    O(batches x buckets) files; with ``compact_every=5`` wired into the
    lifecycle the file count must stay bounded by
    O(compact_every x buckets) — and the index must still answer
    probes correctly after multiple compaction cycles."""
    import glob
    import os

    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.streaming import near_dup_stream

    name = "t_soak_idx"
    for t in (f"{name}_buckets", f"{name}_sets", f"{name}_batches"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    base = "the quick brown fox jumps over the lazy dog beside the river today"
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(1, base)], schema)
    dedup.build_minhash_index(
        spark, corpus, name, n_buckets=2, path=str(tmp_path / "idx")
    )
    src = tmp_path / "docs_in"
    src.mkdir()
    # 20 one-doc files -> 20 micro-batches via maxFilesPerTrigger=1;
    # 19 distinct texts plus one near-dup of the seed corpus doc
    for i in range(20):
        # fully word-disjoint docs (threshold is 0.10: ANY shared
        # 3-shingle skeleton would cross it)
        text = (
            base + " extra"
            if i == 19
            else " ".join(
                f"{w}{i}"
                for w in (
                    "alpha", "beta", "gamma", "delta", "epsilon",
                    "zeta", "eta", "theta", "iota", "kappa",
                )
            )
        )
        spark.createDataFrame([(100 + i, text)], schema).coalesce(
            1
        ).write.parquet(str(src / f"b{i:02d}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    sink = str(tmp_path / "pairs")
    q = near_dup_stream(
        stream, name, sink, str(tmp_path / "ckpt"), compact_every=5
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table(f"{name}_batches").count() == 20

    def _nfiles(table):
        detail = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        loc = next(r.data_type for r in detail if r.col_name == "Location")
        return len(glob.glob(os.path.join(loc.removeprefix("file:"), "*.parquet")))

    # 20 applied batches -> compactions at 5/10/15/20; the last one
    # rewrites to one file per bucket.  Without maintenance this would
    # be (1 seed + 20 appends) x 2 buckets = 42 files.
    bound = (5 + 1) * 2
    assert _nfiles(f"{name}_buckets") <= bound
    assert _nfiles(f"{name}_sets") <= bound
    # correctness across compaction cycles: the late near-dup of the
    # batch-0 seed was still found, and novel docs produced no pairs
    got = {(r.doc_a, r.doc_b) for r in spark.read.parquet(sink).collect()}
    assert (1, 119) in got
    assert all(b == 119 for _, b in got)
    # the index still probes correctly post-compaction
    probe = spark.createDataFrame(
        [(500, "alpha7 beta7 gamma7 delta7 epsilon7 zeta7 eta7 theta7"
               " iota7 kappa7 padded")],
        schema,
    )
    pairs = dedup.incremental_near_dups(spark, probe, name)
    assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == {(107, 500)}
    for t in (f"{name}_buckets", f"{name}_sets", f"{name}_batches"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_curate_stream_gates_and_dedups_across_batches(spark, tmp_path):
    """Continuous corpus ingestion: quality+Gopher gates drop junk,
    within-batch and cross-batch exact dups never re-enter the corpus,
    and a replayed batch body is effectively-once."""
    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.streaming import (
        curate_stream,
        curate_stream_batch,
    )

    for t in ("t_curate_idx_hashes", "t_curate_idx_batches"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    good = (
        "the quick brown fox jumps over the lazy dog beside the calm river"
    )
    good2 = (
        "many colorful parrots squawk loudly above the ancient temple ruins"
        " in the warm morning light"
    )
    junk = "1234 5678 9012 3456 7890"  # zero alpha chars: fails quality
    schema = "doc_id long, text string"
    seed = spark.createDataFrame([(1, good)], schema)
    dedup.build_exact_index(
        spark, seed, "t_curate_idx", n_buckets=2,
        path=str(tmp_path / "idx"),
    )
    src = tmp_path / "docs_in"
    src.mkdir()
    sink = str(tmp_path / "corpus")
    # batch 0: dup of the seed doc, junk, and one genuinely new doc —
    # plus an in-batch duplicate of the new doc
    spark.createDataFrame(
        [(101, good), (102, junk), (103, good2), (104, good2)], schema
    ).coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = curate_stream(stream, "t_curate_idx", sink, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        kept = {r.doc_id for r in spark.read.parquet(sink).collect()}
        assert kept == {103}  # 101 dup-of-seed, 102 junk, 104 in-batch dup
        # batch 1: resubmission of good2 must be caught via the index
        spark.createDataFrame([(201, good2)], schema).coalesce(1).write.parquet(
            str(src / "b1")
        )
        q.processAllAvailable()
        kept = {r.doc_id for r in spark.read.parquet(sink).collect()}
        assert kept == {103}
    finally:
        q.stop()
    n_hashes = spark.table("t_curate_idx_hashes").count()
    # replaying batch 0's body must not change sink or index
    replay = spark.createDataFrame(
        [(101, good), (102, junk), (103, good2), (104, good2)], schema
    )
    curate_stream_batch(replay, "t_curate_idx", sink, batch_id=0)
    assert {r.doc_id for r in spark.read.parquet(sink).collect()} == {103}
    assert spark.table("t_curate_idx_hashes").count() == n_hashes


def test_stream_reader_ignore_missing_files(tmp_path):
    """A partition whose file rotated away between planning and read
    yields nothing under ignoreMissingFiles=true and raises without it
    (the wedged-stream escape hatch)."""
    from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (
        LogfileStreamPartition,
        LogfileStreamReader,
    )

    pat = r"\d{4}-\d{2}-\d{2} .*"
    real = tmp_path / "real.log"
    real.write_text("2024-01-01 here\n")
    ghost = LogfileStreamPartition(str(tmp_path / "rotated.log"), 0, 50, 50, pat)

    tolerant = LogfileStreamReader(
        {"path": str(real), "pattern": pat, "ignoremissingfiles": "true"}
    )
    assert list(tolerant.read(ghost)) == []

    strict = LogfileStreamReader({"path": str(real), "pattern": pat})
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        list(strict.read(ghost))


def test_event_time_timeout_closes_idle_session_on_rocksdb(spark, tmp_path):
    """EVENT-time timeout + RocksDB state store (the 100 TB pairing,
    SCALING.md "Streaming"): an idle user's open session closes when
    the WATERMARK passes last_event + gap — no later event of that user
    required, deterministic in event time — and the closed session's
    state row leaves the store (bounded state).  The query runs on the
    RocksDB provider and the progress metrics must prove it engaged."""
    import datetime as dt

    from hadoop_logfile_inputformat_spark.streaming import (
        ROCKSDB_STATE_CONFS,
    )

    saved = {}
    for k, v in ROCKSDB_STATE_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(mins, user, typ, val):
        return (t0 + dt.timedelta(minutes=mins), user, typ, val)

    src = tmp_path / "sess_et"
    src.mkdir()
    schema = "ts timestamp, user_id long, event_type string, value double"
    spark.createDataFrame(
        [ev(0, 1, "view", 1.0), ev(5, 1, "click", 2.0), ev(0, 2, "view", 5.0)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        sessionize_with_state(
            stream, gap_s=1800, watermark_delay="10 minutes"
        )
        .writeStream.format("memory")
        .queryName("sess_et")
        .option("checkpointLocation", str(tmp_path / "ckpt_et"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("sess_et").count() == 0  # nothing closed yet
        # an UNRELATED user-2 event 2h later advances the watermark far
        # past user 1's (last_event + gap); timeouts are evaluated
        # against the PREVIOUS batch's watermark, so one more batch
        # actually fires it
        spark.createDataFrame(
            [ev(120, 2, "view", 1.0)], schema
        ).coalesce(1).write.parquet(str(src / "b1"))
        q.processAllAvailable()
        spark.createDataFrame(
            [ev(121, 2, "view", 1.0)], schema
        ).coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        got = {(r.user_id, r.n_events) for r in spark.table("sess_et").collect()}
        # user 1: closed by TIMEOUT only (it never had a later event);
        # user 2: first session closed by the ordinary in-stream gap
        assert got == {(1, 2), (2, 1)}
        u1 = [r for r in spark.table("sess_et").collect() if r.user_id == 1][0]
        assert u1.sum_value == 3.0
        assert u1.session_start == t0
        assert u1.session_end == t0 + dt.timedelta(minutes=5)
        prog = q.lastProgress
        ops = prog["stateOperators"][0]
        # bounded state: only user 2's open session remains
        assert ops["numRowsTotal"] == 1
        # the RocksDB provider actually served the query
        assert any(
            m.startswith("rocksdb") for m in ops.get("customMetrics", {})
        ), ops.get("customMetrics")
    finally:
        q.stop()
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def test_sessionize_timeout_modes_are_mutually_exclusive(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        sessionize_with_state(
            spark.readStream.format("rate").load().selectExpr(
                "timestamp as ts", "value as user_id",
                "'x' as event_type", "1.0 as value",
            ),
            watermark_delay="1 minute",
            idle_flush_ms=1000,
        )


def test_embedding_index_stream_probes_appends_and_flags_drift(spark, tmp_path):
    """Streaming incremental vector search (the embedding twin of
    near_dup_stream): each micro-batch's vectors are top-k-probed
    against the persisted IVF index, then appended through the bucket
    spec — so batch 2 finds its nearest neighbor from batch 1.  Also
    pins foreachBatch-replay idempotence (anti-join makes the replayed
    match set identical; the append is skipped) and the drift ledger's
    on_retrain hook firing once when a shifted batch crosses the
    threshold."""
    import random

    from hadoop_logfile_inputformat_spark.operators import similarity
    from hadoop_logfile_inputformat_spark.streaming import (
        embedding_index_stream,
        embedding_index_stream_batch,
    )

    name = "t_emb_idx"
    for s in ("_lists", "_centroids", "_batches", "_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
    rnd = random.Random(11)
    dim = 8

    def _vec(axis):
        v = [rnd.gauss(0, 0.03) for _ in range(dim)]
        v[axis] += 1.0
        return v

    schema = "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    seed = [(i, _vec(0)) for i in range(20)] + [
        (i, _vec(1)) for i in range(20, 40)
    ]
    similarity.build_ivf_index(
        spark,
        spark.createDataFrame(seed, schema),
        name,
        n_buckets=2,
        path=str(tmp_path / "idx"),
    )
    src = tmp_path / "vecs_in"
    src.mkdir()
    # batch 0: 101 sits in the e1 seed cluster; 102 opens a NOVEL
    # direction (e5) the index has never seen
    spark.createDataFrame(
        [(101, _vec(1)), (102, _vec(5))], schema
    ).coalesce(1).write.parquet(str(src / "b0"))
    # batch 1: 201 is near 102 — its top-1 is findable only if batch 0
    # was appended to the lists
    spark.createDataFrame([(201, _vec(5))], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    # batch 2: a shifted batch (all e6) that must cross the drift gate
    b2_rows = [(300 + i, _vec(6)) for i in range(5)]
    spark.createDataFrame(b2_rows, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    sink = str(tmp_path / "matches")
    retrains = []
    q = embedding_index_stream(
        stream,
        name,
        sink,
        str(tmp_path / "ckpt"),
        compact_every=2,
        drift_threshold=0.15,
        on_retrain=retrains.append,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table(f"{name}_batches").count() == 3
    matches = spark.read.parquet(sink)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in matches.filter(F.col("rank") == 1).collect()
    }
    # 101's nearest standing neighbor is in the e1 seed cluster
    assert 20 <= top1[101] < 40
    # 102 arrived with batch 0: its matches exclude same-batch 101 and
    # come from the seed corpus only
    assert top1[102] < 40
    # 201 (batch 1) finds 102 (batch 0) — proof the append landed
    assert top1[201] == 102
    # drift hook fired exactly once, with the ledger dict
    assert len(retrains) == 1 and retrains[0]["retrain_recommended"]
    assert similarity.ivf_index_drift(spark, name, threshold=0.15)[
        "retrain_recommended"
    ]

    # replay of the NEWEST applied batch (the realistic foreachBatch
    # crash-replay: the failure happens before newer data lands):
    # identical matches — the anti-join keeps the batch's own now-
    # indexed vectors out of its result — and no re-append.
    # This session cached the lists relation before the STREAM's
    # cloned session compacted it (files moved) — the per-session
    # relation-cache caveat compact_bucketed_table documents:
    spark.catalog.refreshTable(f"{name}_lists")
    n_lists = spark.table(f"{name}_lists").count()
    got_before = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in matches.collect()
    }
    b2 = spark.createDataFrame(b2_rows, schema)
    embedding_index_stream_batch(b2, name, sink, batch_id=2)
    assert spark.table(f"{name}_lists").count() == n_lists
    got_after = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got_after == got_before
    for s in ("_lists", "_centroids", "_batches", "_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_takedown_stream_tombstones_and_folds(spark, tmp_path):
    """Continuous takedown against the LSH index: streamed doc_ids stop
    surfacing as index-side partners at the next probe, a replayed
    batch is an idempotent no-op (no bookkeeping table needed), and
    crossing compact_at folds the pending set into the index."""
    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.operators.tables import load
    from hadoop_logfile_inputformat_spark.streaming import (
        takedown_stream,
        takedown_stream_batch,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    is_delta = F.col("doc_id") % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM
    corpus, delta = docs.filter(~is_delta), docs.filter(is_delta)
    name = "t_takedown"
    try:
        dedup.build_minhash_index(
            spark, corpus, name, n_buckets=4, path=str(tmp_path / "idx")
        )
        base = dedup.incremental_near_dups(spark, delta, name).collect()
        victims = sorted({r.doc_a for r in base})[:2]
        assert victims
        src = tmp_path / "req_in"
        src.mkdir()
        spark.createDataFrame(
            [(v,) for v in victims], "doc_id long"
        ).coalesce(1).write.parquet(str(src / "b0"))
        stream = spark.readStream.schema("doc_id long").parquet(
            str(src / "*")
        )
        q = takedown_stream(
            stream, name, str(tmp_path / "ckpt"), compact_at=None
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        after = dedup.incremental_near_dups(spark, delta, name).collect()
        assert not any(r.doc_a in victims for r in after)
        assert spark.catalog.tableExists(f"{name}_tombstones")
        # replay of the same request batch: idempotent no-op
        assert takedown_stream_batch(
            spark.createDataFrame([(v,) for v in victims], "doc_id long"),
            name, batch_id=0,
        ) == 0
        # a batch crossing compact_at folds: tombstones gone, rows
        # physically reclaimed, probe unchanged
        more = [
            r.doc_id
            for r in corpus.select("doc_id").limit(5).collect()
            if r.doc_id not in victims
        ][:2]
        n = takedown_stream_batch(
            spark.createDataFrame([(v,) for v in more], "doc_id long"),
            name, batch_id=1, compact_at=2,
        )
        assert n == len(more)
        assert not spark.catalog.tableExists(f"{name}_tombstones")
        assert spark.table(f"{name}_sets").filter(
            F.col("doc_id").isin(victims + more)
        ).count() == 0
        post = dedup.incremental_near_dups(spark, delta, name).collect()
        assert {(r.doc_a, r.doc_b) for r in post} <= {
            (r.doc_a, r.doc_b) for r in after
        }
    finally:
        for s in ("_buckets", "_sets", "_batches", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_takedown_batch_dispatches_to_embedding_index(spark):
    """The same takedown verb resolves the IVF family from the catalog
    signature: streamed vec_ids are tombstoned out of a built
    embedding index and its probes."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.tables import load
    from hadoop_logfile_inputformat_spark.streaming import (
        takedown_stream_batch,
    )

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    queries = v.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    name = "t_takedown_ivf"
    try:
        S.build_ivf_index(spark, v, name)
        hits = S.ann_ivf_probe(spark, queries, name)
        victim = hits.select(
            F.col("neighbor_id").alias("vec_id")
        ).limit(1)
        vid = victim.collect()[0].vec_id
        assert takedown_stream_batch(victim, name, batch_id=0) == 1
        still = S.ann_ivf_probe(spark, queries, name).filter(
            F.col("neighbor_id") == vid
        ).count()
        assert still == 0
    finally:
        for s in ("_lists", "_centroids", "_batches", "_stats",
                  "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_takedown_audit_sink_dispositions(spark, tmp_path):
    """The erasure trail: every requested id lands in the batch's audit
    partition with its disposition — tombstoned on first request,
    already_deleted on an idempotent re-request — and a replayed batch
    overwrites its own partition (exactly-once trail)."""
    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.operators.tables import load
    from hadoop_logfile_inputformat_spark.streaming import (
        takedown_stream_batch,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(
        F.col("doc_id") % dedup.INCR_SPLIT_MOD != dedup.INCR_DELTA_REM
    )
    ids = [r.doc_id for r in corpus.select("doc_id").limit(3).collect()]
    name, sink = "t_td_audit", str(tmp_path / "audit")
    try:
        dedup.build_minhash_index(
            spark, corpus, name, n_buckets=4, path=str(tmp_path / "idx")
        )
        req = lambda xs: spark.createDataFrame(
            [(x,) for x in xs], "doc_id long"
        )
        assert takedown_stream_batch(
            req(ids[:2]), name, batch_id=0, audit_sink=sink
        ) == 2
        a0 = {
            (r.id, r.disposition)
            for r in spark.read.parquet(f"{sink}/batch_id=0").collect()
        }
        assert a0 == {(ids[0], "tombstoned"), (ids[1], "tombstoned")}
        # batch 1: one re-request + one new id
        assert takedown_stream_batch(
            req(ids[1:]), name, batch_id=1, audit_sink=sink
        ) == 1
        a1 = {
            (r.id, r.disposition)
            for r in spark.read.parquet(f"{sink}/batch_id=1").collect()
        }
        assert a1 == {
            (ids[1], "already_deleted"),
            (ids[2], "tombstoned"),
        }
        # replay of batch 0: partition overwritten, one row per id,
        # dispositions now reflect the replay (documented)
        takedown_stream_batch(req(ids[:2]), name, batch_id=0, audit_sink=sink)
        a0r = {
            (r.id, r.disposition)
            for r in spark.read.parquet(f"{sink}/batch_id=0").collect()
        }
        assert a0r == {
            (ids[0], "already_deleted"),
            (ids[1], "already_deleted"),
        }
    finally:
        for s in ("_buckets", "_sets", "_batches", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_takedown_pending_counter_reseeds_after_foreign_fold(spark, tmp_path):
    """r12 ADVICE fix: the takedown stream's running pending counter
    goes stale-high when ANOTHER actor folds the tombstones (an ingest
    stream's in-stream compaction in the same deployment).  Before the
    corpus-rewriting compact_fn fires, the batch cheaply re-verifies —
    a foreign fold is detected and the counter RESEEDS instead of
    triggering a spurious full-index rewrite on a one-tombstone batch."""
    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.operators import maintenance as M
    from hadoop_logfile_inputformat_spark.operators.tables import load
    from hadoop_logfile_inputformat_spark.streaming import (
        takedown_stream_batch,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(
        F.col("doc_id") % dedup.INCR_SPLIT_MOD != dedup.INCR_DELTA_REM
    )
    name = "t_reseed"
    t = f"{name}_tombstones"
    try:
        dedup.build_minhash_index(spark, corpus, name, n_buckets=4)
        ids = [r.doc_id for r in corpus.select("doc_id").limit(4).collect()]
        state = {"pending": None}
        assert takedown_stream_batch(
            spark.createDataFrame([(ids[0],), (ids[1],)], "doc_id long"),
            name, batch_id=0, compact_at=100, state=state,
        ) == 2
        assert state["pending"] == 2
        # FOREIGN fold: another session's compaction drops the table,
        # the stream's counter is never told
        M.compact_minhash_index(spark, name)
        assert not spark.catalog.tableExists(t)
        state["pending"] = 150  # stale-high (long pre-fold history)
        # one new tombstone crosses the stale threshold → re-verify
        # finds actual=1 → reseed, NO spurious fold
        assert takedown_stream_batch(
            spark.createDataFrame([(ids[2],)], "doc_id long"),
            name, batch_id=1, compact_at=100, state=state,
        ) == 1
        assert spark.catalog.tableExists(t)
        assert spark.table(t).count() == 1
        assert state["pending"] == 1
        # table-MISSING branch: foreign fold again, then a batch that
        # adds no new tombstone (re-request of a folded id defers) —
        # the stale counter reseeds to 0 instead of crashing or folding
        M.compact_minhash_index(spark, name)
        assert not spark.catalog.tableExists(t)
        state["pending"] = 150
        takedown_stream_batch(
            spark.createDataFrame([(ids[0],)], "doc_id long"),
            name, batch_id=2, compact_at=100, state=state,
        )
        if not spark.catalog.tableExists(t):
            assert state["pending"] == 0
        else:  # the re-request re-tombstoned: reseeded to actual
            assert state["pending"] == spark.table(t).count()
    finally:
        for s in ("_buckets", "_sets", "_batches", "_tombstones",
                  "_deferred"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_rotated_ivfpq_streaming_lifecycle(spark, tmp_path):
    """r13 (judge task): an OPQ-ROTATED IVFPQ index through the full
    STREAMING lifecycle.  Pins: (1) embedding_index_stream now serves
    the IVFPQ family (family-dispatched probe/append/compact) and its
    micro-batch appends encode through the STORED rotation — the final
    probe is BIT-equal to a rebuild-on-union with the same frozen
    model (centroids + codebooks + matrix); (2) a mid-stream
    out-of-band retrain RE-LEARNS the rotation (new matrix) and resets
    the replay log + drift ledger by contract, and the next stream
    segment appends through the NEW stored matrix (again bit-equal to
    the post-retrain-model rebuild); (3) streamed takedowns tombstone
    out of the rotated index."""
    from hadoop_logfile_inputformat_spark.operators import (
        maintenance as M,
        similarity as S,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load
    from hadoop_logfile_inputformat_spark.streaming import (
        embedding_index_stream,
        takedown_stream,
    )

    name, twin = "t_rot_stream", "t_rot_twin"
    sfx = ("_codes", "_quantized", "_codebooks", "_centroids", "_lists",
           "_batches", "_stats", "_qstats", "_tombstones", "_deferred")

    def _drop_all():
        for n in (name, twin):
            for s in sfx:
                spark.sql(f"DROP TABLE IF EXISTS {n}{s}")

    def _probe_rows(n):
        return sorted(
            tuple(r)
            for r in S.ann_ivfpq_probe(spark, queries, n, k=5).collect()
        )

    def _model(n):
        cb = spark.table(f"{n}_codebooks").filter(
            F.col("m") >= 0
        ).localCheckpoint(eager=True)
        cents = spark.table(f"{n}_centroids").localCheckpoint(eager=True)
        return cents, cb, S._read_rotation(spark.table(f"{n}_codebooks"))

    _drop_all()
    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    part = F.col("vec_id") % 8
    seed = v.filter(part < 5)
    b0, b1, b2 = (v.filter(part == p) for p in (5, 6, 7))
    queries = v.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    try:
        S.build_ivfpq_index(
            spark, seed, name, iters=2,
            path=str(tmp_path / "idx"), rotation="opq",
        )
        cents0, cb0, R0 = _model(name)
        assert R0 is not None and len(R0) == 64

        # ---- stream segment 1: two micro-batches through the index --
        src = tmp_path / "vin"
        src.mkdir()
        b0.coalesce(1).write.parquet(str(src / "b0"))
        b1.coalesce(1).write.parquet(str(src / "b1"))
        schema = spark.read.parquet(str(src / "b0")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        sink, ckpt = str(tmp_path / "matches"), str(tmp_path / "ckpt")
        q = embedding_index_stream(
            stream, name, sink, ckpt, compact_every=None
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        for s in ("_batches", "_codes", "_quantized", "_codebooks"):
            spark.catalog.refreshTable(f"{name}{s}")
        assert spark.table(f"{name}_batches").count() == 2
        # the matches sink got one partition per batch, ranks served
        got = spark.read.parquet(sink)
        assert got.filter(F.col("rank") == 1).count() > 0
        # appends never touch the stored rotation
        assert S._read_rotation(spark.table(f"{name}_codebooks")) == R0

        # ---- streamed appends == rebuild with the same frozen model -
        union01 = seed.unionByName(b0).unionByName(b1)
        S.build_ivfpq_index(
            spark, union01, twin,
            centroids=cents0, codebooks=cb0, rotation=R0,
        )
        a, b = _probe_rows(name), _probe_rows(twin)
        assert a == b and a

        # ---- mid-stream retrain: re-learns R, resets the ledgers ----
        S.retrain_ivfpq_index(spark, name, iters=2)
        cents1, cb1, R1 = _model(name)
        assert R1 is not None and R1 != R0
        # persisted kind stays parametric; replay log + ledger reset
        assert S._read_rotation_kind(
            spark.table(f"{name}_codebooks")
        ) == "opq"
        assert spark.table(f"{name}_batches").count() == 0
        assert not S.ivf_index_drift(spark, name)["retrain_recommended"]

        # ---- stream segment 2: appends ride the NEW stored matrix ---
        b2.coalesce(1).write.parquet(str(src / "b2"))
        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q2 = embedding_index_stream(
            stream2, name, sink, ckpt, compact_every=None
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        for s in ("_batches", "_codes", "_quantized", "_codebooks"):
            spark.catalog.refreshTable(f"{name}{s}")
        assert spark.table(f"{name}_batches").count() == 1
        assert S._read_rotation(spark.table(f"{name}_codebooks")) == R1
        for s in sfx:
            spark.sql(f"DROP TABLE IF EXISTS {twin}{s}")
        S.build_ivfpq_index(
            spark, union01.unionByName(b2), twin,
            centroids=cents1, codebooks=cb1, rotation=R1,
        )
        a2, b2r = _probe_rows(name), _probe_rows(twin)
        assert a2 == b2r and a2

        # ---- streamed takedowns against the rotated index -----------
        victim_q, victim_n = next(
            (r[0], r[1])
            for r in a2
            if r[1] is not None
        )
        tsrc = tmp_path / "tin"
        tsrc.mkdir()
        spark.createDataFrame(
            [(int(victim_n),)], "vec_id BIGINT"
        ).coalesce(1).write.parquet(str(tsrc / "t0"))
        tstream = (
            spark.readStream.schema("vec_id BIGINT")
            .parquet(str(tsrc / "*"))
        )
        tq = takedown_stream(
            tstream, name, str(tmp_path / "tckpt"), compact_at=None
        )
        try:
            tq.processAllAvailable()
        finally:
            tq.stop()
        spark.catalog.refreshTable(f"{name}_tombstones")
        assert spark.table(f"{name}_tombstones").count() == 1
        after = S.ann_ivfpq_probe(spark, queries, name, k=5)
        assert (
            after.filter(F.col("neighbor_id") == victim_n).count() == 0
        )
    finally:
        _drop_all()
