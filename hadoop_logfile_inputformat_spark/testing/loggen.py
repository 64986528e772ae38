"""Deterministic multi-line log corpus generator.

Python re-statement of the reference's generative test harness
(LogfileGenerator.java:26-105, LogfileType.java:21-28, LogLevel.java:26-28,
LogfileSummary.java:15-37, Test.java:167-209), with one deliberate
improvement: everything is seeded (`random.Random(seed)`), so golden
counts are reproducible run-to-run, not merely tracked-at-generation.

Semantics preserved:

- one record per 5 ms of simulated log time (LogfileGenerator.java:31)
- level mix INFO:WARN:ERROR ≈ 500:500:1 via ``randrange(1001) // 500``
  (LogLevel.java:26-28)
- every ERROR record embeds a multi-line NPE stack trace
  (LogfileGenerator.java:61-62, 95-105)
- two record layouts: A = timestamp-first, B = level-first
  (LogfileType.java:21-23)
- identical bytes written to ``.log`` and ``.log.gz`` duals
  (Test.java:184-209)
- per-level counts tracked into a summary with monoid ``merge``
  (LogfileSummary.java:15-37)
"""

from __future__ import annotations

import gzip
import os
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable, Dict, List, Tuple

#: First-line regexes, verbatim parity with LogfileType.java:21-23
#: (Java and Python regex syntax coincide for these patterns).
FORMAT_A = (
    r"^(?P<timestamp>[0-9]{4}-[0-9]{2}-[0-9]{2}\s[0-2][0-9]:[0-5][0-9]:[0-5][0-9],[0-9]{3})"
    r"\s\|\s(?P<loglevel>INFO|WARN|ERROR)\s\|\s.*"
)
FORMAT_B = (
    r"^(?P<loglevel>INFO|WARN|ERROR)"
    r"\s\|\s(?P<timestamp>[0-9]{4}-[0-9]{2}-[0-9]{2}\s[0-2][0-9]:[0-5][0-9]:[0-5][0-9],[0-9]{3})\s\|\s.*"
)

LEVELS = ("INFO", "WARN", "ERROR")

_LOGGING_CLASSES = [f"com.example.pipeline.{c}" for c in "ABCDE"]

#: Deterministic stand-in for the reference's real NPE stack trace
#: (LogfileGenerator.java:95-105): a first line plus continuation lines
#: that must NOT match either first-line pattern.
_STACK_TRACE = "\n".join(
    ["java.lang.NullPointerException"]
    + [f"\tat com.example.pipeline.Frame{i}.invoke(Frame{i}.java:{10 + i})" for i in range(8)]
)


@dataclass
class LogfileSummary:
    """Count-by-level monoid (LogfileSummary.java:15-37 parity)."""

    total: int = 0
    by_level: Dict[str, int] = field(default_factory=lambda: {lv: 0 for lv in LEVELS})

    def add_record(self, level: str) -> None:
        self.total += 1
        self.by_level[level] += 1

    def merge(self, other: "LogfileSummary") -> "LogfileSummary":
        out = LogfileSummary(self.total + other.total)
        for lv in LEVELS:
            out.by_level[lv] = self.by_level[lv] + other.by_level[lv]
        return out


def _timestamp(dt: datetime) -> str:
    # yyyy-MM-dd HH:mm:ss,SSS (LogfileType.java:28)
    return f"{dt:%Y-%m-%d %H:%M:%S},{dt.microsecond // 1000:03d}"


def _random_level(rng: random.Random) -> str:
    return LEVELS[rng.randrange(1001) // 500]  # LogLevel.java:26-28


def _random_text(rng: random.Random, level: str) -> str:
    if level == "INFO":
        return f"customer #{rng.randrange(1000, 10000):05d} logged in."
    if level == "WARN":
        return f"customer #{rng.randrange(1000, 10000):05d} failed password attempt."
    return _STACK_TRACE


def generate_log_records(
    fmt: str,
    start: datetime,
    end: datetime,
    consumer: Callable[[str], None],
    rng: random.Random,
) -> LogfileSummary:
    """Emit one record per 5 ms of simulated time in ``[start, end)``
    (LogfileGenerator.java:26-34 parity); returns tracked counts.

    ``fmt`` is ``"A"`` (timestamp-first) or ``"B"`` (level-first).
    """
    summary = LogfileSummary()
    step = timedelta(milliseconds=5)
    next_ts = start
    while next_ts < end:
        level = _random_level(rng)
        text = _random_text(rng, level)
        summary.add_record(level)
        cls = _LOGGING_CLASSES[rng.randrange(5)]
        if fmt == "A":
            entry = f"{_timestamp(next_ts)} | {level} | {cls} | {text}\n"
        else:
            entry = f"{level} | {_timestamp(next_ts)} | {cls} | {text}\n"
        consumer(entry)
        next_ts += step
    return summary


def summarize_log_corpus(
    *,
    n_files: int = 4,
    seconds_per_file: float = 2.0,
    seed: int = 42,
    start: datetime | None = None,
) -> LogfileSummary:
    """Golden counts of the corpus :func:`write_log_corpus` would write
    for the same parameters, computed WITHOUT any IO.

    Replays the exact RNG draw sequence (per-file format draw, then the
    per-record draws inside :func:`generate_log_records`) with a no-op
    consumer — the independent recomputation that lets registry oracles
    assert the source's counts as literal values (Test.java's
    golden-count contract, Test.java:117-152)."""
    rng = random.Random(seed)
    base = start or datetime(2024, 1, 1)
    total = LogfileSummary()
    for day in range(n_files):
        fmt = "AB"[rng.randrange(2)]
        day_start = base + timedelta(days=day)
        day_end = day_start + timedelta(seconds=seconds_per_file)
        total = total.merge(
            generate_log_records(fmt, day_start, day_end, lambda _: None, rng)
        )
    return total


def replay_log_corpus_records(
    *,
    n_files: int = 4,
    seconds_per_file: float = 2.0,
    seed: int = 42,
    start: datetime | None = None,
) -> List[Tuple[str, int, str]]:
    """``(filename, byte_offset, record_text)`` triples of the corpus
    :func:`write_log_corpus` would write — replayed from the RNG with
    no IO and no scanner involvement.

    Each generator entry IS one logical record (ERROR entries embed
    their stack-trace continuation lines inside the entry string);
    ``byte_offset`` is the position of the entry's first byte within
    its file and ``record_text`` drops the trailing newline — exactly
    the ``(offset, record)`` contract of the logfile source.  This is
    the record-level generator-replay oracle (the golden-count
    summaries only cover aggregates).
    """
    rng = random.Random(seed)
    base = start or datetime(2024, 1, 1)
    out: List[Tuple[str, int, str]] = []
    for day in range(n_files):
        fmt = "AB"[rng.randrange(2)]
        day_start = base + timedelta(days=day)
        day_end = day_start + timedelta(seconds=seconds_per_file)
        entries: List[str] = []
        generate_log_records(fmt, day_start, day_end, entries.append, rng)
        fname = f"app_{day_start:%Y-%m-%d}.log"  # write_log_corpus naming
        off = 0
        for e in entries:
            out.append((fname, off, e[:-1]))
            off += len(e.encode("utf-8"))
    return out


def write_log_corpus(
    out_dir: str,
    *,
    n_files: int = 4,
    seconds_per_file: float = 2.0,
    seed: int = 42,
    gzip_duals: bool = True,
    start: datetime | None = None,
) -> Tuple[LogfileSummary, Dict[str, str], List[str]]:
    """Write an ``n_files``-day corpus of ``.log`` (+ byte-identical
    ``.log.gz``) files with per-file random format A/B (Test.java:167-209
    parity, scaled down via ``seconds_per_file``).

    Returns ``(expected_summary, {path: format}, paths)`` — golden counts
    plus the per-path pattern registration the reader needs
    (Test.java:109-112 parity).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    base = start or datetime(2024, 1, 1)
    total = LogfileSummary()
    path_formats: Dict[str, str] = {}
    paths: List[str] = []
    for day in range(n_files):
        fmt = "AB"[rng.randrange(2)]
        day_start = base + timedelta(days=day)
        day_end = day_start + timedelta(seconds=seconds_per_file)
        chunks: List[str] = []
        summary = generate_log_records(fmt, day_start, day_end, chunks.append, rng)
        data = "".join(chunks).encode("utf-8")
        plain = os.path.join(out_dir, f"app_{day_start:%Y-%m-%d}.log")
        with open(plain, "wb") as f:
            f.write(data)
        path_formats[plain] = fmt
        paths.append(plain)
        if gzip_duals:
            gz = plain + ".gz"
            # mtime=0 => deterministic gzip bytes
            with open(gz, "wb") as rawf:
                with gzip.GzipFile(fileobj=rawf, mode="wb", mtime=0) as zf:
                    zf.write(data)
            path_formats[gz] = fmt
            paths.append(gz)
        total = total.merge(summary)
    return total, path_formats, paths
