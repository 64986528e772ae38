"""Typed parse layer over raw (path, offset, record) log DataFrames.

Spark-native re-statement of the reference's downstream parse step
(Test.java:119-121, 211-215 map function; LogfileType.java:47-51 DOTALL
regex with named groups).  Where the reference dispatches on a
driver-side ``HashMap<path, LogfileType>`` closed over by a lambda, we
stay entirely in Catalyst: both record layouts are attempted with
``regexp_extract`` and coalesced, so the whole parse is JVM-side,
codegen-friendly, and needs no per-path configuration at all.

Layouts (LogfileType.java:21-23 parity):

- A: ``<timestamp> | <level> | <logger> | <message...>``
- B: ``<level> | <timestamp> | <logger> | <message...>``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TS = r"[0-9]{4}-[0-9]{2}-[0-9]{2}\s[0-2][0-9]:[0-5][0-9]:[0-5][0-9],[0-9]{3}"
_LV = r"INFO|WARN|ERROR"
#: (?s) = Pattern.DOTALL parity (LogfileType.java:32): the lazy logger
#: group and greedy message group span continuation lines.
_LAYOUT_A = rf"(?s)^({_TS})\s\|\s({_LV})\s\|\s(.*?)\s\|\s(.*)$"
_LAYOUT_B = rf"(?s)^({_LV})\s\|\s({_TS})\s\|\s(.*?)\s\|\s(.*)$"

#: yyyy-MM-dd HH:mm:ss,SSS (LogfileType.java:28)
TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss,SSS"


def _first_nonempty(*cols: Column) -> Column:
    out = None
    for c in cols:
        c = F.nullif(c, F.lit(""))
        out = c if out is None else F.coalesce(out, c)
    return out


def parse_log_records(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Add ``ts TIMESTAMP, level STRING, logger STRING, message STRING``
    parsed from either record layout (null on no match).

    Pure column expressions — at 100 TB this stays inside whole-stage
    codegen; never a Python UDF (SURVEY.md §2.8 U1 mapping).
    """
    r = F.col(record_col)
    ts_str = _first_nonempty(
        F.regexp_extract(r, _LAYOUT_A, 1), F.regexp_extract(r, _LAYOUT_B, 2)
    )
    level = _first_nonempty(
        F.regexp_extract(r, _LAYOUT_A, 2), F.regexp_extract(r, _LAYOUT_B, 1)
    )
    logger = _first_nonempty(
        F.regexp_extract(r, _LAYOUT_A, 3), F.regexp_extract(r, _LAYOUT_B, 3)
    )
    message = _first_nonempty(
        F.regexp_extract(r, _LAYOUT_A, 4), F.regexp_extract(r, _LAYOUT_B, 4)
    )
    return (
        df.withColumn("ts", F.to_timestamp(ts_str, TIMESTAMP_FORMAT))
        .withColumn("level", level)
        .withColumn("logger", logger)
        .withColumn("message", message)
    )


def format_record_lines(df: DataFrame) -> DataFrame:
    """`"%s@%016d:\\n\\n%s\\n\\n"` projection of Sample.java:100 parity —
    one formatted string column per record, ready for a text sink."""
    return df.select(
        F.format_string("%s@%016d:\n\n%s\n\n", "path", "offset", "record").alias("value")
    )
