"""User-defined table functions (PySpark 4 ``@udtf``).

SURVEY.md §2.8 marks UDTFs "not present" in the reference and names the
natural extension: a record-exploding table function for stack frames.
``ExplodeStackFrames`` turns one multi-line log record into one row per
``\\tat pkg.Class.method(File.java:123)`` frame — the lateral-join shape
that lets stack-trace analytics (hottest frame, dedup by top frame) run
as plain aggregations.

UDTFs are row-path Python; use them for genuinely row-exploding logic
on already-filtered slices (here: ERROR records, ~1/1000 of a corpus),
never as a scan-wide stage.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_FRAME_RE = re.compile(
    r"^\s*at\s+([\w$.]+)\.([\w$<>]+)\(([^:()]*?):?(\d+)?\)\s*$"
)

FRAME_SCHEMA = "frame_idx int, cls string, method string, file string, line int"


@udtf(returnType=FRAME_SCHEMA)
class ExplodeStackFrames:
    """(record) -> one row per stack frame inside the record."""

    def eval(self, record: str):  # noqa: D102 - UDTF contract
        if record is None:
            return
        idx = 0
        for ln in record.split("\n"):
            m = _FRAME_RE.match(ln)
            if m:
                yield (
                    idx,
                    m.group(1),
                    m.group(2),
                    m.group(3) or None,
                    int(m.group(4)) if m.group(4) else None,
                )
                idx += 1


def register_udtfs(spark) -> None:
    """Register SQL-callable table functions (idempotent)."""
    spark.udtf.register("explode_stack_frames", ExplodeStackFrames)


def stack_frame_hotspots(spark, records_df, record_col: str = "record"):
    """Top stack frames across ERROR records: lateral-join the UDTF,
    aggregate by (cls, method).  The UDTF only sees pre-filtered rows."""
    import uuid

    if not record_col.isidentifier():
        raise ValueError(f"record_col must be a plain identifier: {record_col!r}")
    register_udtfs(spark)
    # unique view per call: a fixed name would let two concurrently
    # built queries silently read each other's input
    view = f"_frames_in_{uuid.uuid4().hex}"
    records_df.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT f.cls, f.method, count(*) AS n_frames,
               count(DISTINCT f.frame_idx) AS depths_seen
        FROM {view},
        LATERAL explode_stack_frames({record_col}) AS f
        GROUP BY f.cls, f.method
        ORDER BY n_frames DESC, f.cls, f.method
        """
    )
