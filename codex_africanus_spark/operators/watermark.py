"""Exact batch replay of Structured Streaming's watermark rule for a
windowed aggregation — the TRUE engine rule, pinned empirically.

The r13 `events_watermark_late_drop` query replays a ROW-grain drop
rule (ts < wm). The actual Spark rule for `withWatermark + groupBy
(window(...))` is WINDOW-grain, and was bisected on this Spark (4.1)
with file-source probes before this module was written:

- The committed watermark reported for batch N (progress
  `eventTime.watermark`) is max event time over batches < N minus the
  delay (ms-truncated; neutral here — see below).
- The LATE-ROW FILTER in batch N uses the watermark reported for batch
  N-1 (one batch behind the committed value), i.e. max event time over
  batches <= N-2 minus delay. A probe with a late row in the first
  batch after an advance is kept; the same row one batch later drops.
- A row is dropped iff its window END <= that lagged watermark
  (INCLUSIVE — probed at exact equality).
- Append-mode finalization uses the CURRENT batch's watermark,
  emitting windows with end <= wm (INCLUSIVE — probed at equality),
  and `Trigger.AvailableNow` runs a final empty batch that commits the
  terminal watermark, so the final table holds exactly the windows
  with end <= (global max event time - delay) that kept >= 1 row.
- No resurrection hazard: a window evicted at batch M has
  end <= wm_M <= every later lagged filter watermark, so late rows
  for emitted windows always drop — the replay needs no
  emitted-window bookkeeping.
- Spark tracks max event time in MILLISECONDS (floor); window ends
  here are hour-aligned, and for an ms-aligned bound E,
  E <= floor_ms(wm) iff E <= wm — the truncation can never flip a
  comparison, so the replay uses exact microseconds.

The streaming twin (tests/test_streaming_window_drop.py) runs the real
`withWatermark` plan over mtime-ordered arrival-batch files and must
match this replay bit-for-bit, drop count included — if a future Spark
changes the lag or a boundary, that test fails, not the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# shared defaults (the registered query's constants — the streaming
# twin test passes coarser batches through the SAME functions)
WM_JITTER_US = 1_800_000_000   # 0.5 h per event_id%7 step -> 0..3 h
WM_BATCH_US = 3_600_000_000    # hourly arrival batches
WM_DELAY_US = 7_200_000_000    # 2 h watermark delay
WM_HOUR_US = 3_600_000_000     # tumbling-window width


def arrival_batch_expr(jitter_us: int = WM_JITTER_US,
                       batch_us: int = WM_BATCH_US) -> str:
    """Deterministic arrival-batch id: streams arrive roughly, not
    exactly, time-ordered — event_id jitters arrival by 0..6 steps.
    ONE definition consumed by the replay, the oracle text, and the
    streaming twin's file stager."""
    return f"(ts_us + (event_id % 7) * {jitter_us}) DIV {batch_us}"


def window_drop_tagged(
    ev: DataFrame,
    jitter_us: int = WM_JITTER_US,
    batch_us: int = WM_BATCH_US,
    delay_us: int = WM_DELAY_US,
    hour_us: int = WM_HOUR_US,
) -> DataFrame:
    """Event-grain tagged frame (b, hour_bin, dropped, vc) — the shared
    derivation under the hour-grain replay AND the metric-parity test.
    The test needs the (b, hour_bin) grain because Spark's
    numRowsDroppedByWatermark increments per POST-PARTIAL-AGG buffer
    row, not per input row: with one file per trigger (one map
    partition) that is one count per distinct dropped
    (trigger, window) pair — bisected on the r13 fuzz corpus
    (123 input rows dropped, metric 98 = distinct pairs)."""
    bat = ev.select(
        F.expr(arrival_batch_expr(jitter_us, batch_us)).alias("b"),
        "ts_us",
        "value",
    )
    bm = bat.groupBy("b").agg(F.max("ts_us").alias("bmax"))
    # lagged filter watermark: committed-at-N-1 = max over batches <= N-2.
    # The empty frame (first two triggers) must stay NULL on BOTH
    # engines — Spark's greatest() SKIPS nulls while DuckDB's returns
    # null, so the clamp is guarded instead of folded into greatest.
    lagw = W.orderBy("b").rowsBetween(W.unboundedPreceding, -2)
    mx = F.max("bmax").over(lagw)
    fwm = bm.select(
        "b",
        F.when(
            mx.isNotNull(), F.greatest(mx - F.lit(delay_us), F.lit(0))
        ).alias("fwm"),
    )
    return bat.join(fwm, "b").select(
        "b",
        F.expr(f"ts_us DIV {hour_us}").alias("hour_bin"),
        (
            F.col("fwm").isNotNull()
            & ((F.expr(f"(ts_us DIV {hour_us} + 1)") * hour_us) <= F.col("fwm"))
        ).alias("dropped"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )


def window_drop_replay(
    ev: DataFrame,
    jitter_us: int = WM_JITTER_US,
    batch_us: int = WM_BATCH_US,
    delay_us: int = WM_DELAY_US,
    hour_us: int = WM_HOUR_US,
) -> DataFrame:
    """Per hour-window: kept-row count/value sum, dropped-row count, and
    the append-mode emission flag — the exact replay of the pinned
    Spark rule (module docstring). Plan shape: batch-grain partial max
    (linear), ONE unpartitioned running-max window over the
    arrival-batch frame with the 2-PRECEDING lag (rows = span batches,
    thousands not events), a join back to event grain, one scalar
    broadcast (final watermark), and the tumbling agg."""
    tagged = window_drop_tagged(ev, jitter_us, batch_us, delay_us, hour_us)
    gmax = ev.agg(
        F.greatest(F.max("ts_us") - F.lit(delay_us), F.lit(0)).alias(
            "final_wm"
        )
    )
    return (
        tagged.crossJoin(F.broadcast(gmax))
        .groupBy("hour_bin")
        .agg(
            F.count(F.when(~F.col("dropped"), 1)).cast("long").alias("n_events"),
            F.sum(F.when(~F.col("dropped"), F.col("vc")).otherwise(F.lit(0)))
            .cast("long")
            .alias("val_c_sum"),
            F.count(F.when(F.col("dropped"), 1)).cast("long")
            .alias("n_late_dropped"),
            F.first("final_wm").alias("_fw"),
        )
        .select(
            "hour_bin",
            "n_events",
            "val_c_sum",
            "n_late_dropped",
            (
                (F.col("n_events") > 0)
                & (((F.col("hour_bin") + 1) * hour_us) <= F.col("_fw"))
            )
            .cast("int")
            .alias("is_emitted"),
        )
        .orderBy("hour_bin")
    )


def window_drop_oracle_body(
    jitter_us: int = WM_JITTER_US,
    batch_us: int = WM_BATCH_US,
    delay_us: int = WM_DELAY_US,
    hour_us: int = WM_HOUR_US,
) -> str:
    """DuckDB oracle body (appended to the standard `ev` CTE prefix) —
    the same replay, term for term."""
    return f"""
    , bat AS (
      SELECT (ts_us + (event_id % 7) * {jitter_us}) // {batch_us} AS b,
             ts_us, value
      FROM ev
    ),
    bm AS (SELECT b, MAX(ts_us) AS bmax FROM bat GROUP BY b),
    fwm AS (
      SELECT b,
             CASE WHEN mx IS NULL THEN NULL
                  ELSE GREATEST(mx - {delay_us}, 0) END AS fwm
      FROM (
        SELECT b,
               MAX(bmax) OVER (ORDER BY b
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 2 PRECEDING) AS mx
        FROM bm
      )
    ),
    gmax AS (SELECT GREATEST(MAX(ts_us) - {delay_us}, 0) AS final_wm FROM ev),
    tagged AS (
      SELECT t.ts_us // {hour_us} AS hour_bin,
             (w.fwm IS NOT NULL
              AND (t.ts_us // {hour_us} + 1) * {hour_us} <= w.fwm) AS dropped,
             CAST(ROUND(t.value * 100) AS BIGINT) AS vc
      FROM bat t JOIN fwm w ON w.b = t.b
    )
    SELECT hour_bin,
           CAST(COUNT(CASE WHEN NOT dropped THEN 1 END) AS BIGINT)
             AS n_events,
           CAST(SUM(CASE WHEN NOT dropped THEN vc ELSE 0 END) AS BIGINT)
             AS val_c_sum,
           CAST(COUNT(CASE WHEN dropped THEN 1 END) AS BIGINT)
             AS n_late_dropped,
           CAST((COUNT(CASE WHEN NOT dropped THEN 1 END) > 0
                 AND (hour_bin + 1) * {hour_us}
                     <= (SELECT final_wm FROM gmax)) AS INT) AS is_emitted
    FROM tagged GROUP BY hour_bin ORDER BY hour_bin
    """
