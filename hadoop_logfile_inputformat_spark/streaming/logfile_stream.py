"""``logfile-stream``: incremental Structured Streaming source for
multi-line logfiles.

The streaming port of the batch ``logfile`` source (SURVEY.md §2.7):
the reference's ``(path, offset)`` record key (LogfileRecordReader.java:304)
becomes the streaming *offset* — progress markers are
``{path: byte_position}`` per tracked file, which makes exactly-once
replay natural: ``readBetweenOffsets(start, end)`` re-scans exactly
``[start[path], end[path])`` of each file with the same boundary
algorithm the batch source uses.

Multi-line assembly across micro-batches (SURVEY.md §7.3 #5): a record
is not complete until its next first-line (or EOF) arrives.  This
reader only advances the committed offset past *complete* records: the
tail record of a batch is held back (its bytes re-read next batch)
unless the file has stopped growing — the ``tail_stable_batches``
option controls how many polls a file size must be unchanged before
the dangling tail is emitted as a final record.

Scale note: one SimpleDataSourceStreamReader runs on the driver and
prefetches; suitable for tailing rotating app logs (the reference's use
case).  For firehose volumes, partition-per-file ``DataSourceStreamReader``
is the upgrade path — same offset model, planned but not required for
parity.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import re
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from hadoop_logfile_inputformat_spark.sources.logfile import (
    PatternResolver,
    iter_records,
)


class LogfileSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.options = options
        self.resolver = PatternResolver.from_options(options)
        path_spec = options.get("path")
        if not path_spec:
            raise ValueError("logfile-stream source requires a load path")
        self.path_spec = path_spec
        self.tail_stable_batches = int(options.get("tailstablebatches", 2))
        self.encoding = options.get("encoding", "utf-8")
        # per-path count of consecutive polls with unchanged size, and
        # the last size observed (NOT the committed offset — a held-back
        # tail keeps offset < size even when the file stopped growing)
        self._stable_polls: dict = {}
        self._last_size: dict = {}

    def _files(self):
        spec = self.path_spec
        if os.path.isdir(spec):
            spec = os.path.join(spec, "*")
        return sorted(p for p in _glob.glob(spec) if os.path.isfile(p))

    def initialOffset(self) -> dict:
        # start of every currently-visible file; new files join at 0
        return {"files": {}}

    def _scan_new_records(
        self, path: str, start_pos: int, end_pos: int, final: bool
    ) -> Tuple[list, int]:
        """Records of [start_pos, end_pos); returns (rows, safe_pos).

        ``safe_pos`` is the position after the last *complete* record —
        the offset the stream commits.  When ``final`` (file stopped
        growing), the dangling tail is emitted and safe_pos = end_pos.
        """
        pattern = self.resolver.resolve(path)
        regex = re.compile(pattern)
        rows = []
        with open(path, "rb", buffering=io.DEFAULT_BUFFER_SIZE * 16) as f:
            recs = list(
                iter_records(
                    f, start=start_pos, end=end_pos, regex=regex,
                    encoding=self.encoding,
                )
            )
        if not recs:
            return [], start_pos
        if final:
            return [(path, off, rec) for off, rec in recs], end_pos
        # hold back the tail record: it may still be growing
        *complete, (tail_off, _) = recs
        return [(path, off, rec) for off, rec in complete], tail_off

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        tracked = dict(start.get("files", {}))
        rows: list = []
        new_offsets: dict = {}
        for path in self._files():
            pos = int(tracked.get(path, 0))
            size = os.path.getsize(path)
            if size == self._last_size.get(path):
                self._stable_polls[path] = self._stable_polls.get(path, 0) + 1
            else:
                self._stable_polls[path] = 0
            self._last_size[path] = size
            final = self._stable_polls.get(path, 0) >= self.tail_stable_batches
            if size > pos:
                batch_rows, safe = self._scan_new_records(path, pos, size, final)
                rows.extend(batch_rows)
                new_offsets[path] = safe
            else:
                new_offsets[path] = pos
        # keep offsets for files that vanished (rotation): frozen
        for path, pos in tracked.items():
            new_offsets.setdefault(path, pos)
        return iter(rows), {"files": new_offsets}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Deterministic replay of [start, end) per file (recovery)."""
        s = start.get("files", {})
        e = end.get("files", {})
        rows: list = []
        for path, end_pos in e.items():
            start_pos = int(s.get(path, 0))
            end_pos = int(end_pos)
            if end_pos > start_pos and os.path.exists(path):
                batch_rows, _ = self._scan_new_records(
                    path, start_pos, end_pos, final=True
                )
                rows.extend(batch_rows)
        return iter(rows)


class LogfileStreamDataSource(DataSource):
    """``spark.readStream.format("logfile-stream")`` — see module doc.

    Same options as the batch ``logfile`` source (``pattern``,
    ``pattern.<path>``) plus ``tailStableBatches``.
    """

    @classmethod
    def name(cls) -> str:
        return "logfile-stream"

    def schema(self) -> str:
        return "path string, offset bigint, record string"

    def simpleStreamReader(self, schema) -> LogfileSimpleStreamReader:
        return LogfileSimpleStreamReader(self.options)


def register_logfile_stream_source(spark) -> None:
    spark.dataSource.register(LogfileStreamDataSource)
