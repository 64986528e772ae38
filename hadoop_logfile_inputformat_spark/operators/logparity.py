"""Driver-program parity: the reference's two CLI pipelines as library
functions, plus registry-facing logfile queries.

- :func:`sample_logs`   ≙ Sample.main (Sample.java:64-105): scan →
  Bernoulli sample → formatted projection → single text file.
- :func:`verify_counts` ≙ Test.main (Test.java:76-155): generate a
  corpus with golden counts → read plain and gzip globs → compare
  total + per-level counts → SUCCESS/FAILURE matrix.

The registry queries build a deterministic fixture corpus on first use
(seeded generator, content-addressed directory), so the driver's checks
exercise the actual ``logfile`` data source; all but the Bernoulli
``logfile_sample`` are hash-checked against generator-replay oracles.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.functions.logparse import (
    format_record_lines,
    parse_log_records,
)
from hadoop_logfile_inputformat_spark.sources.logfile import register_logfile_source
from hadoop_logfile_inputformat_spark.testing.loggen import (
    FORMAT_A,
    FORMAT_B,
    LogfileSummary,
    write_log_corpus,
)

_FIXTURE_SEED = 42
_FIXTURE_FILES = 4
_FIXTURE_SECONDS = 2.0


def sample_logs(
    spark: SparkSession,
    input_glob: str,
    output_dir: str,
    pattern: str,
    fraction: float = 0.01,
    seed: int | None = None,
    per_path_patterns: dict | None = None,
) -> None:
    """Sample.java pipeline: scan → sample(fraction) → format → one
    text file.

    Deliberate improvement over the reference: ``coalesce(1)`` instead
    of ``repartition(1)`` (Sample.java:101) — merges partitions without
    a full shuffle.  Fraction validated to [0, 1] (Sample.java:125-127
    parity).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"sample fraction must be in [0, 1], got {fraction}")
    if os.path.exists(output_dir) and os.listdir(output_dir):
        raise FileExistsError(f"output dir '{output_dir}' exists and is not empty")
    register_logfile_source(spark)
    reader = spark.read.format("logfile").option("pattern", pattern)
    for path, pat in (per_path_patterns or {}).items():
        reader = reader.option(f"pattern.{path}", pat)
    df = reader.load(input_glob)
    sampled = df.sample(withReplacement=False, fraction=fraction, seed=seed)
    format_record_lines(sampled).coalesce(1).write.text(output_dir)


def verify_counts(spark: SparkSession, work_dir: str) -> DataFrame:
    """Test.java pipeline: golden-count verification matrix.

    Generates the corpus (plain + byte-identical gzip), reads both
    through the ``logfile`` source, and returns a DataFrame of
    ``(metric, expected, actual_log, actual_gz, success)`` rows —
    the PySpark-native restatement of Test.java:135-152's printout.
    """
    register_logfile_source(spark)
    summary, path_formats, _ = write_log_corpus(
        work_dir, n_files=_FIXTURE_FILES, seconds_per_file=_FIXTURE_SECONDS,
        seed=_FIXTURE_SEED,
    )

    def counts(glob: str) -> dict:
        r = spark.read.format("logfile")
        for path, fmt in path_formats.items():
            r = r.option(f"pattern.{path}", FORMAT_A if fmt == "A" else FORMAT_B)
        parsed = parse_log_records(r.load(glob))
        rows = parsed.groupBy("level").count().collect()
        out = {row["level"]: row["count"] for row in rows}
        out["TOTAL"] = sum(out.values())
        return out

    log_counts = counts(os.path.join(work_dir, "*.log"))
    gz_counts = counts(os.path.join(work_dir, "*.log.gz"))
    expected = dict(summary.by_level, TOTAL=summary.total)
    rows = []
    for metric in ("TOTAL", "INFO", "WARN", "ERROR"):
        e, a, g = expected[metric], log_counts.get(metric, 0), gz_counts.get(metric, 0)
        rows.append((metric, e, a, g, e == a == g))
    from hadoop_logfile_inputformat_spark.operators.tables import local_df

    return local_df(
        spark,
        rows,
        "metric string, expected long, actual_log long, actual_gz long, success boolean",
    )


def _fixture_dir_name() -> str:
    """Deterministic fixture-corpus directory PATH (no IO) — shared by
    :func:`_fixture_dir` and the registry's generator-replay oracles,
    which need the path string without forcing generation at import."""
    return os.path.join(
        tempfile.gettempdir(),
        f"hlis_logfixture_s{_FIXTURE_SEED}_f{_FIXTURE_FILES}_{_FIXTURE_SECONDS}",
    )


def _fixture_dir() -> str:
    """Deterministic shared fixture corpus for registry queries.

    Concurrency-safe: the corpus is generated into a process-private
    temp dir and atomically ``os.rename``d into place, so a parallel
    test worker or registry query can never observe half-written
    files.  If another process won the rename race, its (identical,
    deterministic) corpus is used and ours is discarded.
    """
    d = _fixture_dir_name()
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    staging = tempfile.mkdtemp(prefix="hlis_logfixture_staging_")
    write_log_corpus(
        staging, n_files=_FIXTURE_FILES, seconds_per_file=_FIXTURE_SECONDS,
        seed=_FIXTURE_SEED,
    )
    with open(os.path.join(staging, "_COMPLETE"), "w") as f:
        f.write("ok")
    try:
        os.rename(staging, d)
    except OSError:
        if os.path.exists(marker):
            # lost the race: a complete corpus already sits at d
            shutil.rmtree(staging, ignore_errors=True)
        else:
            # d exists but is incomplete (e.g. a crashed older run):
            # serve this process from its own private complete copy
            return staging
    return d


#: (applicationId, ext) -> fixture DataFrame.  Creating a Python-data-
#: source DataFrame costs a driver-side Python worker round (~0.5 s)
#: for schema/plan resolution; the fixture corpus is immutable, so the
#: frame is reused for the session instead of being rebuilt per query.
_FIXTURE_FRAMES: dict = {}


def _read_fixture(spark: SparkSession, ext: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, ext)
    cached = _FIXTURE_FRAMES.get(key)
    if cached is not None:
        return cached
    register_logfile_source(spark)
    d = _fixture_dir()
    # both layouts tried per record downstream, so a single default
    # pattern alternation suffices for boundary detection; named groups
    # must be anonymized (duplicate names are illegal in one regex)
    def _anon(p: str) -> str:
        return p.replace("(?P<timestamp>", "(?:").replace("(?P<loglevel>", "(?:")

    combined = f"(?:{_anon(FORMAT_A)})|(?:{_anon(FORMAT_B)})"
    df = (
        spark.read.format("logfile")
        .option("pattern", combined)
        .load(os.path.join(d, f"*.{ext}"))
    )
    _FIXTURE_FRAMES[key] = df
    return df


def logfile_count_by_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (hash-checked vs a golden-count VALUES oracle):
    golden-count pipeline over the deterministic fixture, plain files.  ``sf_dir`` is unused — the
    corpus is the generator's, as in the reference's Test driver."""
    parsed = parse_log_records(_read_fixture(spark, "log"))
    return parsed.groupBy("level").agg(F.count("*").alias("n")).orderBy("level")


def logfile_stack_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (hash-checked vs a generator-replay oracle):
    UDTF lateral join — explode the
    stack frames of ERROR records and rank the hottest (cls, method).
    ``sf_dir`` unused; corpus is the deterministic fixture."""
    from hadoop_logfile_inputformat_spark.functions.udtfs import stack_frame_hotspots

    parsed = parse_log_records(_read_fixture(spark, "log"))
    errors = parsed.filter(F.col("level") == "ERROR").select("record")
    return stack_frame_hotspots(spark, errors)


def logfile_gzip_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (hash-checked vs a golden-count oracle):
    per-level counts must be identical
    for the plain and gzip duals; returns the FULL OUTER comparison
    (empty mismatch column set when equivalent)."""
    plain = (
        parse_log_records(_read_fixture(spark, "log"))
        .groupBy("level").agg(F.count("*").alias("n_log"))
    )
    gz = (
        parse_log_records(_read_fixture(spark, "log.gz"))
        .groupBy("level").agg(F.count("*").alias("n_gz"))
    )
    return (
        plain.join(gz, "level", "full_outer")
        .select(
            "level", "n_log", "n_gz",
            (F.col("n_log") == F.col("n_gz")).alias("equal"),
        )
        .orderBy("level")
    )


#: Deterministic sample rate of the registry's ``logfile_sample``, in
#: basis points of 10000 (1000 = 10%).
SAMPLE_BP = 1000


def logfile_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (hash-checked vs a generator-replay oracle):
    Sample.java pipeline as a query — deterministic 10% sample of the
    fixture corpus, formatted like the reference's text-sink lines
    (Sample.java:99-102).  ``sf_dir`` unused; corpus is the
    deterministic fixture.

    The keep decision is a pure function of ``(file basename, offset)``
    — md5 bucketed 0..9999, kept below :data:`SAMPLE_BP` — which is
    Bernoulli-in-distribution like Sample.java:99 but engine-replayable
    (same pattern as text.mixture_sample), so the driver value-hashes
    the full formatted result instead of a rows-only check.  The
    library pipeline :func:`sample_logs` keeps Spark's seeded Bernoulli
    sampler for strict Sample.java parity.
    """
    from hadoop_logfile_inputformat_spark.functions.logparse import (
        format_record_lines,
    )

    df = _read_fixture(spark, "log")
    key = F.format_string(
        "sample:%s@%d", F.regexp_extract("path", "[^/]+$", 0), F.col("offset")
    )
    bucket = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("bigint") % 10000
    return format_record_lines(df.filter(bucket < SAMPLE_BP))
