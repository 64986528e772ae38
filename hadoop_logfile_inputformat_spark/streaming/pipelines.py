"""Streaming transformation pipelines: watermarked windows and
sessionization over an event stream.

Streaming twins of the batch operators in ``operators.relational``
(``q_events_hourly`` / ``q_events_sessionize``) — same aggregation
logic, expressed over an unbounded source with late-data handling.
Tested in ``tests/test_streaming.py`` with a file/rate source feeding
deterministic events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_hourly_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data bound.

    State is dropped once the watermark passes a window's end — bounded
    state at any input volume.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    silence (built-in ``session_window`` — the streaming analogue of
    the batch gaps-and-islands operator)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
