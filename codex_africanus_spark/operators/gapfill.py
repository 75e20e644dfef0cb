"""Gap-filled hourly activity profile — shared core (r13).

The registered batch query `events_hourly_gap_fill` and the streaming
incremental twin (streaming/gapfill.py) compose these SAME functions,
so batch/stream parity holds by construction: the stream maintains the
`hourly` frame incrementally (integer count merge — exact and
commutative under any micro-batch split) and the gap statistics are
recomputed by the identical `gap_fill_stats` on every step.

Scale: `hourly` is span-bounded ((types x hours), thousands of rows at
any event cardinality) — the dense grid generator (data-dependent
sequence + explode) runs at type grain, and nothing event-grain ever
crosses it (plan-locked in tests/test_plans_scale.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def hourly_counts(ev: DataFrame) -> DataFrame:
    """Event-grain collapse to the (event_type, hour) state frame."""
    return ev.groupBy(
        "event_type", F.expr(f"ts_us DIV {HOUR_US}").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def gap_fill_stats(hourly: DataFrame) -> DataFrame:
    """Dense-grid gap statistics per type over a (event_type, h, n)
    frame: sequence(min, max) + explode generates the grid, the sparse
    counts left-join in, and only per-type statistics leave."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
    )
    filled = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.count(F.when(F.col("n") == 0, 1)).cast("long")
            .alias("n_gap_hours"),
            F.max("n").cast("long").alias("peak_hour_events"),
            F.sum("n").cast("long").alias("total_events"),
        )
        .orderBy("event_type")
    )
