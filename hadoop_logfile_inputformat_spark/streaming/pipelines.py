"""Streaming transformation pipelines: watermarked windows,
sessionization, bounded-state dedup, and stream joins over an event
stream.

Streaming twins of the batch operators (``q_events_hourly`` /
``q_events_sessionize`` / ``dedup_exact`` / ``asof_purchase_last_click``)
— same logic, expressed over an unbounded source with late-data
handling and provably bounded state.  Tested in
``tests/test_streaming.py`` with a file source feeding deterministic
events.
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


def dedup_stream(
    events: DataFrame,
    keys: list | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    the key's state once the watermark passes its last-seen event time —
    the streaming twin of ``dedup.exact_dedup``.  With plain
    ``dropDuplicates`` the key set grows forever; the watermarked form
    is the only shape that survives an unbounded stream.  Duplicates
    arriving farther apart than the watermark delay are NOT caught —
    that is the documented trade for bounded state; run the batch
    exact dedup over the sink for a full pass.
    """
    keys = keys or ["user_id", "event_type", "value"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def purchases_joined_to_clicks_stream(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    clicks at most ``horizon`` before it.

    The streaming twin of the batch as-of join
    (``relational_ext.asof_purchase_last_click``), with the one-match
    relaxation streams require: an as-of "latest click only" needs the
    full click history per user (unbounded state), while the interval
    form lets Spark expire any click older than watermark+horizon.
    Both sides carry watermarks and the join condition bounds event
    time on both ends, so state is provably bounded — the planner
    rejects the query otherwise.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("user_id", "purchase_ts", "click_ts", "click_value")


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment.

    The static side re-resolves per micro-batch (a dim refresh is
    picked up without restarting the query) and broadcasts, so the
    stream side never shuffles — the standard shape for attaching
    bounded reference data to an unbounded stream.
    """
    from pyspark.sql.functions import broadcast

    return events.join(broadcast(dim), "user_id", "left")


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
