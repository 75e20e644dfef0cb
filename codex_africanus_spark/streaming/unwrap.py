"""Streaming twin of the salted phase-unwrap class (r11 verdict item 4 /
ROADMAP r12 candidate).

Kappa shape, the streaming/salted.py idiom: `phase_unwrap_increment` is
a pure (batch phase frame, carry frame) → (running summary, new carry)
function — directly usable from `foreachBatch` (see
`streaming_unwrap_sink`) and directly testable without the streaming
machinery. Each micro-batch runs the SAME bucket-summary/stitch core as
the batch query (operators/unwrap.py — shared projections, parity by
construction), then stitches against an O(#baselines) carry with the
SAME consecutive-pair wrap rule the batch window applies, so the
running summary after the last batch is bit-equal to the batch query
over the concatenated input WHEREVER the batch boundaries fall
(tests/test_streaming_unwrap.py fuzzes the splits).

Ordered-time contract (the repo's standing streaming contract,
SURVEY §2.10): rows arrive non-decreasing in (time, row_id) per
baseline across batches — the cross-batch corrector is exactly the
batch rule only under that order. Everything is integer milliradians:
no float accumulates across batches, so there is nothing to drift.

Carry per baseline: running count, net/total wraps, last raw phase,
k at the stream end, and globally-shifted last/min/max unwrapped
values — 9 integers, independent of history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.operators import unwrap as unwrap_op

CARRY_SCHEMA = (
    "antenna1 int, antenna2 int, n long, net long, total long, "
    "last_p long, k_end long, last_unw long, min_unw long, max_unw long"
)


def empty_carry(spark) -> DataFrame:
    return spark.createDataFrame([], CARRY_SCHEMA)


def phase_unwrap_increment(
    batch_ph: DataFrame, carry: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch step: internally unwrap the batch with the shared
    salted core (k = 0 at the batch's first row per baseline), then
    shift by the carried global state.

    The cross-batch boundary corrector c_edge = wrap(first_p_batch −
    last_p_carry) is the identical consecutive-pair rule the batch
    window applies between those two rows, and the batch's internal
    values shift by offset = k_end_carry + c_edge — exact because
    cumsum is associative (the same argument as the bucket stitch).

    Returns (summary, new_carry); summary has the registered batch
    query's exact output shape (n_samples, net_wraps, total_wraps,
    final_unw_mrad, span_mrad per baseline)."""
    spark = batch_ph.sparkSession
    bs = unwrap_op.baseline_summary(
        unwrap_op.stitch_buckets(unwrap_op.bucket_summary(batch_ph))
    )
    c = carry.select(
        "antenna1", "antenna2",
        F.col("n").alias("c_n"), F.col("net").alias("c_net"),
        F.col("total").alias("c_total"), F.col("last_p").alias("c_last_p"),
        F.col("k_end").alias("c_k_end"), F.col("last_unw").alias("c_last_unw"),
        F.col("min_unw").alias("c_min_unw"), F.col("max_unw").alias("c_max_unw"),
    )
    j = bs.join(c, ["antenna1", "antenna2"], "full_outer")
    has_batch = F.col("n_b").isNotNull()
    has_carry = F.col("c_n").isNotNull()
    c_edge = F.when(
        has_batch & has_carry,
        unwrap_op.wrap_correction(F.col("first_p") - F.col("c_last_p")),
    ).otherwise(F.lit(0))
    offset = F.coalesce(F.col("c_k_end"), F.lit(0)) + c_edge
    shift = F.lit(unwrap_op.WRAP_GRID) * offset
    upd = j.select(
        "antenna1", "antenna2",
        (F.coalesce(F.col("c_n"), F.lit(0)) + F.coalesce(F.col("n_b"), F.lit(0)))
        .alias("n"),
        (F.coalesce(F.col("c_net"), F.lit(0))
         + F.coalesce(F.col("net_b"), F.lit(0)) + c_edge).alias("net"),
        (F.coalesce(F.col("c_total"), F.lit(0))
         + F.coalesce(F.col("abs_b"), F.lit(0)) + F.abs(c_edge)).alias("total"),
        F.when(has_batch, F.col("last_p")).otherwise(F.col("c_last_p"))
        .alias("last_p"),
        F.when(has_batch, offset + F.col("net_b")).otherwise(F.col("c_k_end"))
        .alias("k_end"),
        F.when(has_batch, F.col("last_unw") + shift)
        .otherwise(F.col("c_last_unw")).alias("last_unw"),
        F.when(
            has_batch & has_carry,
            F.least(F.col("c_min_unw"), F.col("min_unw") + shift),
        )
        .when(has_batch, F.col("min_unw") + shift)
        .otherwise(F.col("c_min_unw")).alias("min_unw"),
        F.when(
            has_batch & has_carry,
            F.greatest(F.col("c_max_unw"), F.col("max_unw") + shift),
        )
        .when(has_batch, F.col("max_unw") + shift)
        .otherwise(F.col("c_max_unw")).alias("max_unw"),
    )
    new_carry = spark.createDataFrame(upd.collect(), CARRY_SCHEMA)
    summary = new_carry.select(
        "antenna1", "antenna2",
        F.col("n").alias("n_samples"),
        F.col("net").cast("long").alias("net_wraps"),
        F.col("total").cast("long").alias("total_wraps"),
        F.col("last_unw").cast("long").alias("final_unw_mrad"),
        (F.col("max_unw") - F.col("min_unw")).cast("long").alias("span_mrad"),
    )
    return summary, new_carry


def streaming_unwrap_sink(
    stream_vis: DataFrame, out_dir: str, checkpoint_dir: str
):
    """foreachBatch wiring with the repo's exactly-once batch-id marker
    idiom: each micro-batch derives the phase frame, steps the
    increment, and overwrites the running per-baseline summary under a
    batch-unique directory before publishing a marker — replay after a
    crash rewrites the same directory idempotently.

    The carry is DURABLE (r12 ADVICE, high): it is written as
    ``carry_<batch_id>.parquet`` beside the summaries and every batch
    reloads the latest marker-committed carry from disk — the
    streaming/salted.py idiom — so a driver restart replays against the
    true stream state instead of an empty carry. The marker is written
    LAST: a crash between summary/carry writes and the marker makes the
    replay rewrite both (batch-unique targets, mode=overwrite), and a
    committed batch is a no-op."""
    import json
    import os

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = os.path.join(out_dir, f"_marker_{batch_id}.json")
        if os.path.exists(marker):  # replayed batch: already applied
            return
        os.makedirs(out_dir, exist_ok=True)
        done = sorted(
            int(f[len("_marker_"):-len(".json")])
            for f in os.listdir(out_dir)
            if f.startswith("_marker_") and f.endswith(".json")
        )
        prev = [b for b in done if b < batch_id]
        if prev:
            carry = spark.read.schema(CARRY_SCHEMA).parquet(
                os.path.join(out_dir, f"carry_{prev[-1]}.parquet")
            )
        else:
            carry = empty_carry(spark)
        ph = unwrap_op.phase_frame(batch_df)
        summary, carry_new = phase_unwrap_increment(ph, carry)
        target = os.path.join(out_dir, f"summary_batch_{batch_id}")
        summary.write.mode("overwrite").parquet(target)
        carry_new.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"carry_{batch_id}.parquet")
        )
        with open(marker, "w") as fh:
            json.dump({"batch_id": batch_id, "rows": summary.count()}, fh)

    return (
        stream_vis.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
