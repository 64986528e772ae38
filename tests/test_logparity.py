"""Driver-program parity tests (Sample.java / Test.java pipelines)."""

import glob
import os

import pytest

from hadoop_logfile_inputformat_spark.operators.logparity import (
    logfile_count_by_level,
    logfile_gzip_equivalence,
    sample_logs,
    verify_counts,
)
from hadoop_logfile_inputformat_spark.testing.loggen import FORMAT_A, write_log_corpus


def test_verify_counts_success_matrix(spark, tmp_path):
    df = verify_counts(spark, str(tmp_path / "corpus"))
    rows = {r.metric: r for r in df.collect()}
    assert set(rows) == {"TOTAL", "INFO", "WARN", "ERROR"}
    assert all(r.success for r in rows.values())
    assert rows["TOTAL"].expected == rows["INFO"].expected + rows["WARN"].expected + rows["ERROR"].expected


def test_sample_logs_writes_formatted_subset(spark, tmp_path):
    src = str(tmp_path / "logs")
    out = str(tmp_path / "out")
    _, path_formats, paths = write_log_corpus(
        src, n_files=2, seconds_per_file=1.0, seed=7, gzip_duals=False
    )
    from hadoop_logfile_inputformat_spark.testing.loggen import FORMAT_B
    per_path = {p: (FORMAT_A if f == "A" else FORMAT_B) for p, f in path_formats.items()}
    sample_logs(spark, f"{src}/*.log", out, FORMAT_A, fraction=0.5, seed=1,
                per_path_patterns=per_path)
    files = glob.glob(os.path.join(out, "part-*"))
    assert len(files) == 1  # coalesce(1): single text file
    content = open(files[0]).read()
    assert "@" in content and ".log" in content
    # %016d zero-padded offset format (Sample.java:100 parity)
    first = content.splitlines()[0]
    assert len(first.split("@")[1].rstrip(":")) == 16


def test_sample_fraction_validated(spark, tmp_path):
    with pytest.raises(ValueError, match="fraction"):
        sample_logs(spark, "x", str(tmp_path / "o"), FORMAT_A, fraction=1.5)


def test_registry_logfile_queries(spark):
    levels = {r.level: r.n for r in logfile_count_by_level(spark, "").collect()}
    assert set(levels) <= {"INFO", "WARN", "ERROR"} and levels
    eq = logfile_gzip_equivalence(spark, "").collect()
    assert eq and all(r.equal for r in eq)


def test_stack_frame_udtf_explodes_error_records(spark):
    """UDTF lateral join: ERROR records explode into one row per frame;
    non-ERROR records contribute nothing."""
    from hadoop_logfile_inputformat_spark.functions.logparse import parse_log_records
    from pyspark.sql import functions as F

    from hadoop_logfile_inputformat_spark.functions.udtfs import (
        stack_frame_hotspots,
    )
    from hadoop_logfile_inputformat_spark.operators.logparity import _read_fixture

    parsed = parse_log_records(_read_fixture(spark, "log"))
    errors = parsed.filter(F.col("level") == "ERROR").select("record")
    hot = stack_frame_hotspots(spark, errors).collect()
    assert hot, "fixture corpus contains ERROR records with stack traces"
    # generator writes Frame0..Frame7 per NPE
    classes = {r.cls for r in hot}
    assert any("Frame0" in c for c in classes)
    n_errors = errors.count()
    assert sum(r.n_frames for r in hot) == 8 * n_errors
    # direct SQL table-function call shape
    frames = spark.sql(
        "SELECT * FROM explode_stack_frames("
        "'e\\n\\tat com.x.Y.z(Y.java:12)\\n\\tat com.x.Q.r(Q.java:9)')"
    ).collect()
    assert [(f.frame_idx, f.cls, f.method, f.file, f.line) for f in frames] == [
        (0, "com.x.Y", "z", "Y.java", 12),
        (1, "com.x.Q", "r", "Q.java", 9),
    ]


def test_cli_sample_and_verify(spark, tmp_path):
    """__main__ CLI parity: sample writes one text file; verify prints
    a SUCCESS matrix and exits 0 on the generated corpus."""
    from hadoop_logfile_inputformat_spark.__main__ import main
    from hadoop_logfile_inputformat_spark.testing.loggen import (
        FORMAT_A,
        FORMAT_B,
        write_log_corpus,
    )

    def _anon(pat):
        return pat.replace("(?P<timestamp>", "(?:").replace("(?P<loglevel>", "(?:")

    d = tmp_path / "corpus"
    write_log_corpus(str(d), n_files=1, seconds_per_file=1.0, seed=3)
    out = tmp_path / "out"
    rc = main([
        "sample", "-i", str(d / "*.log"), "-o", str(out),
        "-p", f"(?:{_anon(FORMAT_A)})|(?:{_anon(FORMAT_B)})",
        "-s", "0.5", "--seed", "11",
    ])
    assert rc == 0
    parts = [p for p in out.iterdir() if p.name.startswith("part-")]
    assert len(parts) == 1 and parts[0].read_text().strip()

    rc = main(["verify", "-d", str(tmp_path / "work")])
    assert rc == 0
