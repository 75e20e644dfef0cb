"""Streaming gap-fill twin (r13): incremental grid maintenance must
reproduce the registered batch query BIT-EXACTLY across arbitrary
micro-batch splits — including splits that EXTEND a type's hour span
retroactively (the grid re-derives from merged bounds every step) —
and the sink must survive a driver restart (durable carry) and batch
replay (marker idiom)."""

import os

import numpy as np
import pandas as pd
import pytest

from codex_africanus_spark.operators import gapfill as gapfill_op
from codex_africanus_spark.queries import registry
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.streaming import gapfill as sgap

EV_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, value double"
)


def _want(spark, sf_dir):
    return (
        registry()["events_hourly_gap_fill"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def _summarize(df):
    return df.toPandas().sort_values("event_type").reset_index(drop=True)


@pytest.mark.parametrize("splits,shuffle", [(1, False), (4, True), (9, True)])
@pytest.mark.slow
def test_streaming_gapfill_matches_batch_query(
    spark, sf_dir, tmp_path, splits, shuffle
):
    """Final running summary == the registered batch query for any
    split count; shuffled arrival makes later batches extend spans
    BACKWARD (the retroactive-grid case)."""
    ev = tpch_ms.events_table(spark, sf_dir)
    pdf = ev.toPandas()
    if shuffle:
        pdf = pdf.sample(frac=1.0, random_state=11).reset_index(drop=True)
    carry = sgap.empty_carry(spark)
    summary = None
    for chunk in np.array_split(pdf, splits):
        if len(chunk) == 0:
            continue
        batch = spark.createDataFrame(chunk.reset_index(drop=True), EV_SCHEMA)
        summary, carry = sgap.gap_fill_increment(batch, carry)
    pd.testing.assert_frame_equal(
        _summarize(summary), _want(spark, sf_dir), check_dtype=False
    )


@pytest.mark.slow
def test_streaming_gapfill_every_prefix_is_a_valid_answer(spark, sf_dir):
    """Each intermediate summary must equal the batch core applied to
    the exact prefix seen so far — the Kappa point-in-time property
    (not just final-state parity)."""
    ev = tpch_ms.events_table(spark, sf_dir)
    pdf = ev.toPandas().sample(frac=1.0, random_state=3).reset_index(drop=True)
    carry = sgap.empty_carry(spark)
    seen = []
    for chunk in np.array_split(pdf, 4):
        if len(chunk) == 0:
            continue
        seen.append(chunk)
        batch = spark.createDataFrame(chunk.reset_index(drop=True), EV_SCHEMA)
        summary, carry = sgap.gap_fill_increment(batch, carry)
        prefix = spark.createDataFrame(
            pd.concat(seen).reset_index(drop=True), EV_SCHEMA
        )
        want = _summarize(
            gapfill_op.gap_fill_stats(gapfill_op.hourly_counts(prefix))
        )
        pd.testing.assert_frame_equal(
            _summarize(summary), want, check_dtype=False
        )


@pytest.mark.slow
def test_streaming_gapfill_sink_exactly_once_and_restart(
    spark, sf_dir, tmp_path
):
    """End-to-end readStream/foreachBatch: two micro-batches under one
    sink instance, then a FRESH sink (fresh closure = restarted driver)
    over the same out_dir/checkpoint for the third. The durable carry
    must survive; the final summary equals the batch query; a marked
    batch replays as a no-op."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import await_done

    ev = tpch_ms.events_table(spark, sf_dir)
    src = tmp_path / "ev_src"
    src.mkdir()
    pdf = ev.toPandas().sort_values(["ts_us", "event_id"])
    chunks = np.array_split(pdf, 3)
    for i, chunk in enumerate(chunks[:2]):
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            src / f"part-{i:03d}.parquet",
        )
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def _run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            sgap.streaming_gap_fill_sink(stream, out_dir, ck)
            .trigger(availableNow=True)
            .start()
        )
        await_done(q)

    _run_once()  # batches 0..1, first driver
    pq.write_table(
        pa.Table.from_pandas(chunks[2], preserve_index=False),
        src / "part-002.parquet",
    )
    _run_once()  # batch 2, "restarted" driver
    markers = [f for f in os.listdir(out_dir) if f.startswith("_marker_")]
    last_id = max(int(m.split("_")[2].split(".")[0]) for m in markers)
    assert last_id >= 2
    got = (
        spark.read.parquet(os.path.join(out_dir, f"summary_batch_{last_id}"))
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _want(spark, sf_dir), check_dtype=False)
    with open(os.path.join(out_dir, f"_marker_{last_id}.json")) as fh:
        assert json.load(fh)["batch_id"] == last_id