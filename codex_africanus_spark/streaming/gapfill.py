"""Streaming twin of the gap-filled hourly profile (r13, ROADMAP r14
candidate "gap-fill: incremental grid maintenance").

Kappa shape, the streaming/cdc.py idiom: the carry IS the sparse
(event_type, hour) count state — span-bounded (types x hours), never
event-grain — maintained by an exact commutative integer merge, so the
running state after batch N equals `hourly_counts` over the
concatenated prefix WHEREVER the micro-batch boundaries fall. Each
step recomputes the gap statistics through the SAME
operators/gapfill.gap_fill_stats the registered batch query uses —
every published summary is the batch query's exact answer over the
data seen so far (the dense grid re-derives from the merged bounds, so
a batch that extends a type's span retroactively lengthens its grid,
exactly as the batch query would).

Durable carry: ``carry_<batch_id>.parquet`` beside the summaries,
reloaded from the latest marker-committed batch each step, marker
written LAST (the r12-ADVICE restart discipline) — a driver restart
replays against the true stream state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.operators import gapfill as gapfill_op

CARRY_SCHEMA = "event_type string, h long, n long"


def empty_carry(spark) -> DataFrame:
    return spark.createDataFrame([], CARRY_SCHEMA)


def gap_fill_increment(
    batch_ev: DataFrame, carry: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch step: collapse the batch to hourly counts, merge
    into the carry (exact integer add), recompute the gap statistics
    from the merged state. Returns (summary, new_carry)."""
    spark = batch_ev.sparkSession
    inc = gapfill_op.hourly_counts(batch_ev)
    c = carry.select("event_type", "h", F.col("n").alias("c_n"))
    merged = (
        inc.join(c, ["event_type", "h"], "full_outer")
        .select(
            "event_type",
            "h",
            (
                F.coalesce(F.col("c_n"), F.lit(0))
                + F.coalesce(F.col("n"), F.lit(0))
            ).alias("n"),
        )
    )
    new_carry = spark.createDataFrame(merged.collect(), CARRY_SCHEMA)
    return gapfill_op.gap_fill_stats(new_carry), new_carry


def streaming_gap_fill_sink(
    stream_ev: DataFrame, out_dir: str, checkpoint_dir: str
):
    """foreachBatch wiring — exactly-once marker idiom with the durable
    carry (the streaming/cdc.py sink, minus the dim resolution)."""
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
        summary, carry_new = gap_fill_increment(batch_df, carry)
        target = os.path.join(out_dir, f"summary_batch_{batch_id}")
        summary.write.mode("overwrite").parquet(target)
        carry_new.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"carry_{batch_id}.parquet")
        )
        with open(marker, "w") as fh:
            json.dump({"batch_id": batch_id, "rows": summary.count()}, fh)

    return (
        stream_ev.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
