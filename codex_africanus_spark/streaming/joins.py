"""Stream-stream event-time interval join (SURVEY §2.10 extension).

The batch engine's as-of/interval joins (operators/asof.py, the
events_asof_prior_join RANGE-window pass) answer "which earlier event
explains this one" over data at rest. The live form of the same question
— view→purchase attribution within a horizon — is a *stream-stream* join:
both sides are unbounded, so Spark buffers each side in the state store
and the event-time range condition plus the watermarks bound how much
state is retained (rows older than `watermark + horizon` are evicted).

Kappa parity: `attribution_batch` applies the identical join condition
to the same frames at rest, so a backfill and the live stream agree
row-for-row — the property the tests assert with an AvailableNow pass
over the events table.

At 100 TB/day the state-store footprint is the product of (ingest rate ×
horizon) per side, independent of history length — that is the whole
point of the watermark bound; the join itself shuffles both sides on
user_id once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HORIZON = "1 hour"
WATERMARK = "2 hours"


def _attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Shared join condition: purchase strictly after the view, within
    the horizon, same user. Works on streaming and batch frames alike."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("event_time").alias("view_time"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("event_time").alias("purchase_time"),
        F.col("value").alias("purchase_value"),
    )
    joined = v.join(
        p,
        F.expr(
            "v_user = p_user AND "
            "purchase_time > view_time AND "
            f"purchase_time <= view_time + INTERVAL {HORIZON}"
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_time"))
            - F.unix_micros(F.col("view_time"))
        ).alias("gap_us"),
        "purchase_value",
    )


def attribution_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming view→purchase attribution: split the event stream by
    type, watermark both sides, interval-join. State per side is bounded
    by watermark + horizon."""
    views = events_stream.filter(F.col("event_type") == "view").withWatermark(
        "event_time", WATERMARK
    )
    purchases = events_stream.filter(
        F.col("event_type") == "purchase"
    ).withWatermark("event_time", WATERMARK)
    return _attribution_join(views, purchases)


def attribution_batch(events: DataFrame) -> DataFrame:
    """Batch twin over the same frames at rest — identical condition,
    identical output schema (the Kappa backfill path)."""
    return _attribution_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
    )
