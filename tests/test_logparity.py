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
