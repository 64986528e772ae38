"""Integration tests of the ``logfile`` DataSource on a live SparkSession.

PySpark-native restatement of the reference's self-verifying cluster
program (Test.java:76-155): generated corpus with golden per-level
counts, plain-vs-gzip equivalence, per-path pattern resolution, split
sweeps, and filter pushdown.
"""

import re

import pytest
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.functions.logparse import parse_log_records
from hadoop_logfile_inputformat_spark.testing.loggen import (
    FORMAT_A,
    FORMAT_B,
    write_log_corpus,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("logs"))
    summary, path_formats, paths = write_log_corpus(
        out, n_files=4, seconds_per_file=2.0, seed=42
    )
    return out, summary, path_formats, paths


def _reader(spark, path_formats):
    r = spark.read.format("logfile")
    for path, fmt in path_formats.items():
        r = r.option(f"pattern.{path}", FORMAT_A if fmt == "A" else FORMAT_B)
    return r


def test_golden_counts_plain_and_gzip(spark, corpus):
    """Test.java:117-152 parity: total + per-level counts must equal the
    generation-time golden summary, for .log and .log.gz reads alike."""
    out, summary, path_formats, _ = corpus
    for ext in ("log", "log.gz"):
        df = _reader(spark, path_formats).load(f"{out}/*.{ext}")
        parsed = parse_log_records(df)
        counts = {r["level"]: r["n"] for r in
                  parsed.groupBy("level").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == summary.total, ext
        assert counts == {k: v for k, v in summary.by_level.items() if v}, ext


def test_multiline_error_records_have_stack_traces(spark, corpus):
    out, summary, path_formats, _ = corpus
    df = _reader(spark, path_formats).load(f"{out}/*.log")
    errors = parse_log_records(df).filter(F.col("level") == "ERROR")
    n_multiline = errors.filter(F.col("record").contains("\n\tat ")).count()
    assert n_multiline == summary.by_level["ERROR"]


def test_split_sweep_invariance(spark, corpus):
    """Multiset of (path, offset, record) is invariant under partition
    size — from many tiny splits to one split per file."""
    out, _, path_formats, _ = corpus
    def read_with(mpb):
        return (
            _reader(spark, path_formats)
            .option("maxPartitionBytes", mpb)
            .load(f"{out}/*.log")
        )
    golden = sorted(read_with(1 << 30).collect())
    for mpb in (512, 4096, 65536):
        got = sorted(read_with(mpb).collect())
        assert got == golden, f"maxPartitionBytes={mpb}"
    # sanity: tiny splits actually produced parallel partitions
    assert read_with(4096).rdd.getNumPartitions() > 4


def test_gzip_single_partition_per_file(spark, corpus):
    out, _, path_formats, paths = corpus
    n_gz = sum(1 for p in paths if p.endswith(".gz"))
    df = _reader(spark, path_formats).option("maxPartitionBytes", 512).load(f"{out}/*.log.gz")
    assert df.rdd.getNumPartitions() == n_gz


def test_offsets_seekable(spark, corpus):
    """The (path, offset) key must allow random access: seeking to the
    offset in the file finds the record's first line."""
    out, _, path_formats, _ = corpus
    rows = (
        _reader(spark, path_formats).load(f"{out}/*.log")
        .filter(F.col("record").contains("NullPointerException"))
        .limit(20)
        .collect()
    )
    assert rows
    for row in rows:
        first_line = row["record"].split("\n", 1)[0]
        with open(row["path"], "rb") as f:
            f.seek(row["offset"])
            assert f.readline().decode().rstrip("\n") == first_line


def test_default_pattern_fallback(spark, tmp_path):
    p = tmp_path / "x.log"
    p.write_text("2024-01-01 00:00:00,000 | INFO | c | hi\n\tmore\n")
    df = (
        spark.read.format("logfile")
        .option("pattern", FORMAT_A)
        .load(str(p))
    )
    assert df.count() == 1


def test_missing_pattern_is_hard_error(spark, tmp_path):
    p = tmp_path / "y.log"
    p.write_text("whatever\n")
    with pytest.raises(Exception, match="[Nn]o first-line pattern"):
        spark.read.format("logfile").load(str(p)).count()


def test_path_filter_pushdown_prunes_files(spark, corpus):
    """A path predicate must reach the source: partition count shrinks
    to the one matching file (pruned before task launch)."""
    out, _, path_formats, paths = corpus
    target = next(p for p in paths if p.endswith(".log"))
    df = (
        _reader(spark, path_formats)
        .load(f"{out}/*.log")
        .filter(F.col("path") == target)
    )
    assert df.select("path").distinct().collect()[0][0] == target
    assert df.rdd.getNumPartitions() == 1


def test_glob_and_comma_paths(spark, corpus):
    out, _, path_formats, paths = corpus
    logs = [p for p in paths if p.endswith(".log")]
    df = _reader(spark, path_formats).load(f"{logs[0]},{logs[1]}")
    assert df.select("path").distinct().count() == 2


def test_unsupported_compression_is_hard_error(spark, tmp_path):
    """A .zst (or other stdlib-undecodable codec) input must fail with a
    clear error, not be scanned as plain text into garbage records —
    parity with the reference's rejection of codecs it cannot handle
    (LogfileRecordReader.java:163-165)."""
    p = tmp_path / "app.log.zst"
    p.write_bytes(b"\x28\xb5\x2f\xfd not really zstd but the suffix decides")
    with pytest.raises(Exception, match="unsupported compression"):
        (
            spark.read.format("logfile")
            .option("pattern", FORMAT_A)
            .load(str(p))
            .count()
        )


def test_xz_reads_whole_file(spark, tmp_path):
    import lzma

    content = (
        "2024-01-01 00:00:00,000 | INFO | c | hi\n\tcont\n"
        "2024-01-01 00:00:01,000 | WARN | c | yo\n"
    )
    p = tmp_path / "app.log.xz"
    p.write_bytes(lzma.compress(content.encode()))
    df = (
        spark.read.format("logfile")
        .option("pattern", FORMAT_A)
        .option("maxPartitionBytes", 16)
        .load(str(p))
    )
    rows = sorted((r.offset, r.record) for r in df.collect())
    assert len(rows) == 2
    assert rows[0][1].endswith("\tcont")
    assert df.rdd.getNumPartitions() == 1  # never split


def test_mixed_case_per_path_pattern_resolves(spark, tmp_path):
    """Spark lowercases option keys; a per-path pattern registered for a
    mixed-case path must still resolve (exact, basename, and glob)."""
    p = tmp_path / "MyApp.log"
    p.write_text("2024-01-01 00:00:00,000 | INFO | c | hi\n\tmore\n")
    # exact-path option (arrives lowercased at the source)
    df = (
        spark.read.format("logfile")
        .option(f"pattern.{p}", FORMAT_A)
        .load(str(p))
    )
    assert df.count() == 1
    # glob option with uppercase letters in the key
    df2 = (
        spark.read.format("logfile")
        .option("pattern.MyApp*.log", FORMAT_A)
        .load(str(p))
    )
    assert df2.count() == 1


def test_invalid_utf8_bytes_replaced_not_fatal(spark, tmp_path):
    """A corrupt byte sequence inside a record must not kill the scan:
    both scanners decode with errors=replace, and offsets stay exact
    (byte positions are computed before decoding)."""
    raw = (
        b"2024-01-01 ok line\n"
        b"2024-01-02 bad \xff\xfe bytes\n"
        b"\tcont \x80\n"
        b"2024-01-03 tail\n"
    )
    p = tmp_path / "bad.log"
    p.write_bytes(raw)
    for scanner in ("chunked", "line"):
        df = (
            spark.read.format("logfile")
            .option("pattern", r"\d{4}-\d{2}-\d{2} .*")
            .option("scanner", scanner)
            .load(str(p))
        )
        rows = sorted((r.offset, r.record) for r in df.collect())
        assert len(rows) == 3, scanner
        assert rows[1][0] == raw.index(b"2024-01-02")
        assert "�" in rows[1][1]  # replacement char, not a crash
        assert rows[2][1] == "2024-01-03 tail"


def test_vanilla_session_can_read(tmp_path):
    """Regression for round 2's only driver defect: a SparkSession built
    WITHOUT any of session.py's confs must still read through the source.

    Spark 4.1 fails reader init with [DATA_SOURCE_PUSHDOWN_DISABLED] when
    ``pushFilters`` is implemented but ``spark.sql.python.filterPushdown.
    enabled`` is unset; register_logfile_source() must flip it at runtime.
    Mirrors the reference's "works with just a Configuration" contract
    (README.md:59-64). Runs in a subprocess so the parent test JVM's
    configuration cannot leak in.
    """
    import subprocess
    import sys
    import os

    p = tmp_path / "vanilla.log"
    p.write_text(
        "2024-01-01 00:00:00,000 | INFO | c | hi\n"
        "\tcontinuation\n"
        "2024-01-01 00:00:01,000 | WARN | c | bye\n"
    )
    script = f"""
from pyspark.sql import SparkSession
from hadoop_logfile_inputformat_spark.sources.logfile import register_logfile_source

spark = SparkSession.builder.master("local[2]").appName("vanilla").getOrCreate()
register_logfile_source(spark)
df = (spark.read.format("logfile")
      .option("pattern", {FORMAT_A!r})
      .load({str(p)!r}))
n = df.count()
assert n == 2, n
print("VANILLA_OK")
spark.stop()
"""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    assert "VANILLA_OK" in res.stdout


def test_zstd_reads_whole_file_when_lib_available(spark, tmp_path):
    """With the optional ``zstandard`` package installed, .zst inputs
    read whole-file like .gz; without it, the hard error stands
    (covered by test_unsupported_compression_is_hard_error)."""
    zstd = pytest.importorskip("zstandard")
    content = (
        "2024-01-01 00:00:00,000 | INFO | c | one\n"
        "\tcont\n"
        "2024-01-01 00:00:01,000 | WARN | c | two\n"
    )
    p = tmp_path / "app.log.zst"
    p.write_bytes(zstd.ZstdCompressor().compress(content.encode()))
    df = (
        spark.read.format("logfile")
        .option("pattern", FORMAT_A)
        .load(str(p))
    )
    rows = sorted((r.offset, r.record) for r in df.collect())
    assert len(rows) == 2
    assert "cont" in rows[0][1]


def test_observe_scan_metrics(spark, corpus):
    """S7f getProgress analogue: observed metrics ride the scan and match
    the golden corpus summary exactly, with no extra pass over the data."""
    from hadoop_logfile_inputformat_spark.sources.logfile import observe_scan

    out, summary, path_formats, paths = corpus
    df = _reader(spark, path_formats).load(f"{out}/*.log")
    observed, obs = observe_scan(df)
    n = observed.count()
    m = obs.get
    assert m["n_records"] == n == summary.total
    assert m["n_files"] == sum(1 for p in paths if p.endswith(".log"))
    assert m["max_offset"] > 0
    # payload bytes == sum of record lengths (ASCII corpus: octet==char)
    total_chars = df.select(F.sum(F.length("record"))).collect()[0][0]
    assert m["record_bytes"] == total_chars


def test_preset_patterns_assemble_multiline_records(spark, tmp_path):
    """Each named preset must assemble continuation lines onto the
    preceding matching first line."""
    samples = {
        "syslog": (
            "Jan  5 03:04:05 host1 app[42]: started\n"
            "Jan  5 03:04:06 host1 app[42]: failure\n"
            "  continuation detail line\n"
            "Jan 15 03:04:07 host1 app[42]: done\n",
            3,
        ),
        "apache-access": (
            '10.0.0.1 - frank [10/Oct/2024:13:55:36 -0700] "GET / HTTP/1.1" 200 2326\n'
            '10.0.0.2 - - [10/Oct/2024:13:55:37 -0700] "POST /x HTTP/1.1" 500 0\n'
            "wrapped user-agent tail\n",
            2,
        ),
        "apache-error": (
            "[Mon Dec 16 01:02:03.456789 2019] [core:error] [pid 100] msg one\n"
            "stack detail\n"
            "[Mon Dec 16 01:02:04.000000 2019] [core:error] [pid 100] msg two\n",
            2,
        ),
        "syslog-5424": (
            "<165>1 2024-01-31T12:34:56Z host app 1 - - body one\n"
            "body continuation\n"
            "<34>1 2024-01-31T12:34:57Z host app 1 - - body two\n",
            2,
        ),
        "json-object": (
            '{ "level": "info",\n  "msg": "pretty printed" }\n'
            '{ "level": "error", "msg": "single line" }\n',
            2,
        ),
        "log4j": (
            "2024-01-31 12:34:56,789 ERROR boom\n"
            "\tat com.example.Main(Main.java:1)\n"
            "2024-01-31 12:34:57,000 INFO ok\n",
            2,
        ),
    }
    for preset, (body, expect) in samples.items():
        p = tmp_path / f"{preset}.log"
        p.write_text(body)
        rows = (
            spark.read.format("logfile")
            .option("preset", preset)
            .load(str(p))
            .collect()
        )
        assert len(rows) == expect, preset
        joined = "\n".join(r.record for r in rows)
        assert joined.strip("\n") == body.strip("\n"), preset


def test_preset_unknown_name_is_hard_error(spark, tmp_path):
    p = tmp_path / "x.log"
    p.write_text("2024-01-01 ok\n")
    with pytest.raises(Exception, match="[Uu]nknown logfile pattern preset"):
        spark.read.format("logfile").option("preset", "nope").load(str(p)).count()


def test_explicit_pattern_beats_preset(spark, tmp_path):
    p = tmp_path / "y.log"
    p.write_text("A one\nB two\ncont\n")
    rows = (
        spark.read.format("logfile")
        .option("preset", "log4j")          # would match nothing
        .option("pattern", r"[AB] .*")      # explicit wins
        .load(str(p))
        .collect()
    )
    assert len(rows) == 2


def test_per_path_preset_resolution(spark, tmp_path):
    a = tmp_path / "a.log"
    a.write_text("Jan  5 03:04:05 h app: one\ncont\n")
    b = tmp_path / "b.log"
    b.write_text("2024-01-31 12:34:56,789 INFO two\n")
    rows = (
        spark.read.format("logfile")
        .option("preset.a.log", "syslog")
        .option("preset.b.log", "log4j")
        .load(f"{a},{b}")
        .collect()
    )
    assert len(rows) == 2


def test_sql_create_view_using_logfile(spark, corpus):
    """Pure-SQL surface: the registered Python data source must work
    through CREATE TEMPORARY VIEW ... USING logfile, so SQL-only users
    get the multi-line reader without touching the DataFrame API."""
    out, summary, path_formats, paths = corpus
    # pick one format-A file so a single pattern option suffices
    path = next(p for p, f in path_formats.items() if f == "A")
    spark.sql("DROP VIEW IF EXISTS sql_logs")
    # Spark SQL string literals are backslash-escaped, so the regex's
    # backslashes must be doubled when spelled inline in OPTIONS
    sql_pattern = FORMAT_A.replace("\\", "\\\\")
    spark.sql(
        f"""
        CREATE TEMPORARY VIEW sql_logs
        USING logfile
        OPTIONS (path '{path}', pattern '{sql_pattern}')
        """
    )
    try:
        n = spark.sql("SELECT count(*) AS n FROM sql_logs").collect()[0].n
        direct = (
            spark.read.format("logfile")
            .option("pattern", FORMAT_A)
            .load(path)
            .count()
        )
        assert n == direct > 0
        firsts = spark.sql(
            "SELECT count(*) AS n FROM sql_logs WHERE record LIKE '% | %'"
        ).collect()[0].n
        assert firsts == n  # every assembled record carries the header
    finally:
        spark.sql("DROP VIEW IF EXISTS sql_logs")


# ---------------------------------------------------------------------------
# Corrupt/missing-file tolerance (spark.sql.files.* semantics as options)
# ---------------------------------------------------------------------------

_TOL_PAT = r"\d{4}-\d{2}-\d{2} .*"


def _write_truncated_gz(tmp_path, n_records=80_000, keep_frac=0.5):
    import gzip as _gzip

    plain = b"".join(
        f"2024-01-0{1 + (i % 8)} record {i}\n\tdetail line {i}\n".encode()
        for i in range(n_records)
    )
    full = tmp_path / "full.log.gz"
    with _gzip.open(str(full), "wb") as fh:
        fh.write(plain)
    data = full.read_bytes()
    trunc = tmp_path / "trunc.log.gz"
    trunc.write_bytes(data[: int(len(data) * keep_frac)])
    full.unlink()
    return str(trunc)


def test_corrupt_gzip_fails_hard_by_default(spark, tmp_path):
    path = _write_truncated_gz(tmp_path)
    df = spark.read.format("logfile").option("pattern", _TOL_PAT).load(path)
    with pytest.raises(Exception):
        df.count()


def test_ignore_corrupt_files_keeps_partial_rows(spark, tmp_path):
    """Spark's ignoreCorruptFiles contract: rows decoded before the
    corruption are returned, the job completes, and a healthy sibling
    file is unaffected."""
    bad = _write_truncated_gz(tmp_path)
    good = tmp_path / "good.log"
    good.write_text("2024-01-01 healthy one\n2024-01-02 healthy two\n")
    df = (
        spark.read.format("logfile")
        .option("pattern", _TOL_PAT)
        .option("ignoreCorruptFiles", "true")
        .load(f"{bad},{good}")
    )
    rows = df.collect()
    good_rows = [r for r in rows if r.path == str(good)]
    bad_rows = [r for r in rows if r.path == bad]
    assert len(good_rows) == 2
    # chunks decoded before the truncation point still yield their
    # records (the corpus spans multiple scanner chunks by design)
    assert 0 < len(bad_rows) < 80_000
    assert all(r.record.startswith("2024-01-0") for r in bad_rows)


def test_ignore_missing_files_read_path(spark, tmp_path):
    """A file that vanishes between planning and read contributes
    nothing under ignoreMissingFiles=true and raises without it.
    Driven at the reader level: listing-time existence makes the
    end-to-end race untestable deterministically."""
    from hadoop_logfile_inputformat_spark.sources.logfile import (
        LogfilePartition,
        LogfileReader,
    )
    from pyspark.sql.types import StructType

    real = tmp_path / "real.log"
    real.write_text("2024-01-01 present\n")
    ghost = LogfilePartition(str(tmp_path / "gone.log"), 0, 100, _TOL_PAT)

    opts = {"path": str(real), "pattern": _TOL_PAT,
            "ignoremissingfiles": "true"}
    reader = LogfileReader(StructType([]), opts)
    assert list(reader.read(ghost)) == []

    opts_strict = {"path": str(real), "pattern": _TOL_PAT}
    strict = LogfileReader(StructType([]), opts_strict)
    with pytest.raises(FileNotFoundError):
        list(strict.read(ghost))


def test_tolerant_read_yields_prefix_at_any_truncation(tmp_path):
    """Property: for ANY truncation point of a gzip log, the tolerant
    reader returns a PREFIX of the full record sequence — never a
    corrupted/partial record, never out-of-order, never rows past the
    cut.  Driven at the reader level (no Spark jobs) so a sweep of cut
    points stays fast."""
    import gzip as _gzip

    from pyspark.sql.types import StructType

    from hadoop_logfile_inputformat_spark.sources.logfile import (
        LogfilePartition,
        LogfileReader,
    )

    records = [
        f"2024-01-0{1 + (i % 8)} record {i}\n\tdetail {i}\n" for i in range(5000)
    ]
    full_path = tmp_path / "full.log.gz"
    with _gzip.open(str(full_path), "wb") as fh:
        fh.write("".join(records).encode())
    blob = full_path.read_bytes()

    def read_records(path):
        opts = {"path": str(path), "pattern": _TOL_PAT,
                "ignorecorruptfiles": "true"}
        reader = LogfileReader(StructType([]), opts)
        part = LogfilePartition(str(path), 0, -1, _TOL_PAT)
        out = []
        for batch in reader.read(part):
            out.extend(batch.column("record").to_pylist())
        return out

    full = read_records(full_path)
    assert len(full) == 5000
    for frac in (0.1, 0.33, 0.5, 0.77, 0.95):
        cut = tmp_path / f"cut_{int(frac * 100)}.log.gz"
        cut.write_bytes(blob[: int(len(blob) * frac)])
        got = read_records(cut)
        assert got == full[: len(got)], f"not a prefix at cut {frac}"
        assert len(got) < 5000


def test_stage_decompress_identical_and_splittable(spark, corpus, tmp_path):
    """The giant-gzip mitigation (SCALING.md "Ingestion"): one linear
    decompression pre-pass into splittable staging, after which the
    corpus byte-range-splits instead of one-task-per-.gz
    (LogfileInputFormat.java:112-119 contract).  Staged reads must be
    record-identical (offsets included — the staged copy is the exact
    decompressed byte stream), basenames preserved for per-basename
    pattern options, plain files pass through unstaged, and the pass
    is idempotent."""
    import os

    from hadoop_logfile_inputformat_spark.sources.logfile import (
        stage_decompress,
    )

    out, summary, path_formats, paths = corpus
    staging = str(tmp_path / "staging")
    staged = stage_decompress(spark, f"{out}/*.log.gz", staging)
    gz_paths = [p for p in paths if p.endswith(".gz")]
    assert len(staged) == len(gz_paths)
    assert sorted(os.path.basename(p) for p in staged) == sorted(
        os.path.basename(p)[: -len(".gz")] for p in gz_paths
    )

    def read_basename_patterns(paths_spec, mpb=1 << 30):
        # basename-keyed patterns: a staged copy of app.log.gz keeps the
        # basename app.log, so the PLAIN file's registration covers it
        r = spark.read.format("logfile").option("maxPartitionBytes", mpb)
        for path, fmt in path_formats.items():
            r = r.option(
                f"pattern.{os.path.basename(path)}",
                FORMAT_A if fmt == "A" else FORMAT_B,
            )
        return r.load(paths_spec)

    direct = read_basename_patterns(f"{out}/*.log.gz")
    via_staging = read_basename_patterns(",".join(staged))
    key = lambda r: (r["offset"], r["record"])  # noqa: E731
    assert sorted(map(key, via_staging.collect())) == sorted(
        map(key, direct.collect())
    )
    assert via_staging.count() == summary.total

    # splittability: the staged copies byte-range split; the gz originals
    # are pinned to one task per file
    n_gz = len(gz_paths)
    assert (
        read_basename_patterns(f"{out}/*.log.gz", mpb=4096)
        .rdd.getNumPartitions()
        == n_gz
    )
    assert (
        read_basename_patterns(",".join(staged), mpb=4096)
        .rdd.getNumPartitions()
        > n_gz
    )

    # idempotent: a second pass returns the same paths without rewriting
    mtimes = {p: os.path.getmtime(p) for p in staged}
    again = stage_decompress(spark, f"{out}/*.log.gz", staging)
    assert again == staged
    assert {p: os.path.getmtime(p) for p in staged} == mtimes

    # mixed spec: plain inputs pass through unstaged, compressed stage
    mixed = stage_decompress(spark, f"{out}/*", staging)
    assert sorted(p for p in mixed if p.startswith(out)) == sorted(
        p for p in paths if p.endswith(".log")
    )
    assert sorted(p for p in mixed if not p.startswith(out)) == sorted(staged)

    # unsupported codec: hard error on the driver, same as the read path
    bad = tmp_path / "x.log.lz4"
    bad.write_bytes(b"\x00")
    with pytest.raises(Exception, match="unsupported compression"):
        stage_decompress(spark, str(bad), staging)


def test_stage_decompress_chunked_identity_and_bounds(spark, corpus, tmp_path):
    """Chunked staging (the bounded-storage variant): each compressed
    stream splits into ≈chunk_bytes part files DURING the one staging
    pass, cut only at first-line boundaries — so direct, whole-file
    staged, and chunk-staged reads yield the IDENTICAL record multiset,
    no part starts mid-record, no staged file approaches the source's
    full decompressed size, and the .parts manifest makes the pass
    idempotent and crash-safe."""
    import os

    from hadoop_logfile_inputformat_spark.sources.logfile import (
        stage_decompress,
    )

    out, summary, path_formats, paths = corpus
    gz_paths = sorted(p for p in paths if p.endswith(".gz"))
    # per-file patterns differ (FORMAT_A/B); chunk one known-format file
    src = next(p for p in gz_paths if path_formats[p[: -len(".gz")]] == "A")
    staging = str(tmp_path / "staged_chunks")
    chunk = 4096
    staged = stage_decompress(
        spark, src, staging, chunk_bytes=chunk, pattern=FORMAT_A
    )
    assert len(staged) > 1, "fixture file must split into multiple parts"
    assert staged.sources == {src: list(staged)}
    # parts bounded: each ≤ chunk + one record (records are small here)
    plain_size = sum(os.path.getsize(p) for p in staged)
    assert all(os.path.getsize(p) < chunk * 2 for p in staged)
    # every part STARTS with a first line (no mid-record cut)
    import re as _re

    first = _re.compile(FORMAT_A)
    for p in staged:
        with open(p, "rb") as fh:
            head = fh.readline().decode("utf-8").rstrip("\r\n")
        assert first.fullmatch(head), (p, head)
    # identity: direct gz read == chunk-staged read (records, not
    # offsets: offsets are per-file positions and parts restart at 0)
    direct = (
        spark.read.format("logfile").option("pattern", FORMAT_A).load(src)
    )
    via = (
        spark.read.format("logfile")
        .option("pattern", FORMAT_A)
        .load(",".join(staged))
    )
    assert sorted(r["record"] for r in via.collect()) == sorted(
        r["record"] for r in direct.collect()
    )
    # concatenated parts == the exact decompressed stream
    import gzip

    with gzip.open(src, "rb") as fh:
        want = fh.read()
    got = b"".join(open(p, "rb").read() for p in staged)
    assert got == want and len(got) == plain_size
    # idempotent: second call reuses the manifest, no rewrite
    mtimes = {p: os.path.getmtime(p) for p in staged}
    again = stage_decompress(
        spark, src, staging, chunk_bytes=chunk, pattern=FORMAT_A
    )
    assert list(again) == list(staged)
    assert {p: os.path.getmtime(p) for p in staged} == mtimes
    # chunking without a pattern is a hard error (mid-record cuts
    # would silently lose record tails)
    with pytest.raises(ValueError, match="chunk_bytes requires pattern"):
        stage_decompress(spark, src, staging, chunk_bytes=chunk)


def test_stage_decompress_sources_mapping_rekeys_patterns(spark, corpus, tmp_path):
    """ADVICE r9: staging strips the compression suffix, so an option
    registered under the COMPRESSED basename stops matching the staged
    copy.  The returned .sources mapping is the re-keying hook — using
    it, a caller whose options were keyed by compressed names reads
    the staged corpus with the right per-file patterns."""
    import os

    from hadoop_logfile_inputformat_spark.sources.logfile import (
        stage_decompress,
    )

    out, summary, path_formats, paths = corpus
    staging = str(tmp_path / "staged_map")
    staged = stage_decompress(spark, f"{out}/*.log.gz", staging)
    # mapping covers every source, with the compression suffix stripped
    assert sorted(staged.sources) == sorted(
        p for p in paths if p.endswith(".gz")
    )
    r = spark.read.format("logfile")
    for src, staged_paths in staged.sources.items():
        fmt = path_formats[src[: -len(".gz")]]
        pat = FORMAT_A if fmt == "A" else FORMAT_B
        for sp in staged_paths:
            r = r.option(f"pattern.{os.path.basename(sp)}", pat)
    got = r.load(",".join(staged))
    assert got.count() == summary.total


def test_stage_decompress_manifest_reuse_is_validated(spark, corpus, tmp_path):
    """ADVICE r10: chunked manifest reuse must be VALIDATED, not
    assumed — (a) a later call with a different chunk_bytes (or
    pattern) re-stages under the new layout instead of silently
    keeping the old cuts, and (b) a part file a consumer deleted (the
    docstring invites delete-as-consumed) forces a re-stage rather
    than returning dangling paths."""
    import os

    from hadoop_logfile_inputformat_spark.sources.logfile import (
        stage_decompress,
    )

    out, summary, path_formats, paths = corpus
    src = next(
        p for p in sorted(paths)
        if p.endswith(".gz") and path_formats[p[: -len(".gz")]] == "A"
    )
    staging = str(tmp_path / "staged_validate")
    first = stage_decompress(
        spark, src, staging, chunk_bytes=4096, pattern=FORMAT_A
    )
    assert len(first) > 1
    # (a) different chunk_bytes → new layout, not the old part list
    bigger = stage_decompress(
        spark, src, staging, chunk_bytes=1 << 20, pattern=FORMAT_A
    )
    assert len(bigger) == 1 and list(bigger) != list(first)
    # bytes identical either way
    import gzip

    with gzip.open(src, "rb") as fh:
        want = fh.read()
    assert b"".join(open(p, "rb").read() for p in bigger) == want
    # (b) delete one part the manifest lists → reuse refused, re-staged
    third = stage_decompress(
        spark, src, staging, chunk_bytes=1 << 20, pattern=FORMAT_A
    )
    assert list(third) == list(bigger)  # intact manifest reuses
    os.remove(bigger[0])
    fourth = stage_decompress(
        spark, src, staging, chunk_bytes=1 << 20, pattern=FORMAT_A
    )
    assert all(os.path.exists(p) for p in fourth)
    assert b"".join(open(p, "rb").read() for p in fourth) == want


def test_stage_decompress_zero_part_manifest_reuses(spark, tmp_path):
    """r12 ADVICE fix: a chunked source that decompresses to ZERO parts
    (empty stream) writes a header-only manifest; a second call must
    REUSE it as [] instead of re-running the decompression pass on
    every invocation (the r11 code returned None for an empty part
    list, re-staging forever)."""
    import gzip
    import os

    from hadoop_logfile_inputformat_spark.sources.logfile import (
        stage_decompress,
    )

    src = tmp_path / "empty.log.gz"
    with gzip.open(src, "wb"):
        pass  # zero-byte decompressed stream
    staging = str(tmp_path / "staged_zero")
    first = stage_decompress(
        spark, str(src), staging, chunk_bytes=4096, pattern=FORMAT_A
    )
    assert list(first) == []
    manifest = next(
        os.path.join(root, f)
        for root, _, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parts")
    )
    stamp = os.path.getmtime(manifest)
    again = stage_decompress(
        spark, str(src), staging, chunk_bytes=4096, pattern=FORMAT_A
    )
    assert list(again) == []
    assert os.path.getmtime(manifest) == stamp  # reused, not re-staged
