"""Streaming CDC-dim-join twin (r13, r12 verdict item 3): the
foreachBatch increment must reproduce the registered batch query
BIT-EXACTLY across arbitrary micro-batch splits (integer partial
aggregates merge exactly), the dimension refresh between batches must
be visible without a stream restart, the dim-watermark contract must
raise loudly, and the sink must survive a driver restart (durable
carry) and batch replay (marker idiom)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from codex_africanus_spark.operators import cdc as cdc_op
from codex_africanus_spark.queries import registry
from codex_africanus_spark.sources import snapshot as snap
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.streaming import cdc as scdc

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow

EV_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, value double"
)


def _build_dim(spark, ev, root, upto=3):
    """The batch query's v1..v3 dim appends (same predicates)."""
    users = ev.select("user_id").distinct()
    seg = F.col("user_id") % 5
    specs = [
        users.filter(F.col("user_id") % 4 != 3)
        .select("user_id", seg.alias("segment")),
        users.filter((F.col("user_id") % 4 == 3) & (F.col("user_id") % 8 != 7))
        .select("user_id", F.lit(5).cast("long").alias("segment")),
        users.filter(F.col("user_id") % 8 == 7)
        .select("user_id", F.lit(6).cast("long").alias("segment")),
    ]
    return [snap.commit(d, root, mode="append") for d in specs[:upto]]


def _want(spark, sf_dir):
    return (
        registry()["events_cdc_dim_state_join"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["epoch", "segment"])
        .reset_index(drop=True)
    )


def _drive_increment(spark, ev_pdf, root, splits):
    carry = scdc.empty_carry(spark)
    summary = None
    for chunk in np.array_split(ev_pdf, splits):
        if len(chunk) == 0:
            continue
        batch = spark.createDataFrame(chunk.reset_index(drop=True), EV_SCHEMA)
        summary, carry = scdc.cdc_dim_increment(batch, carry, root)
    return (
        summary.toPandas()
        .sort_values(["epoch", "segment"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("splits", [1, 4, 9])
def test_streaming_cdc_matches_batch_query(spark, sf_dir, tmp_path, splits):
    """Final running summary == the registered batch query for any
    split count — events in ANY order across batches (all three dim
    versions pre-committed, so the watermark admits everything)."""
    ev = tpch_ms.events_table(spark, sf_dir)
    root = str(tmp_path / "dim")
    _build_dim(spark, ev, root)
    pdf = ev.toPandas().sample(frac=1.0, random_state=7).reset_index(drop=True)
    got = _drive_increment(spark, pdf, root, splits)
    pd.testing.assert_frame_equal(got, _want(spark, sf_dir), check_dtype=False)


def test_streaming_cdc_refresh_between_batches(spark, sf_dir, tmp_path):
    """The realistic CDC schedule: version e+1 commits just before
    epoch-e events stream in. Each batch re-resolves the root (the
    foreachBatch broadcast refresh), so no restart is needed and the
    final summary still equals the batch query."""
    ev = tpch_ms.events_table(spark, sf_dir)
    root = str(tmp_path / "dim")
    pdf = ev.toPandas()
    epoch = np.minimum(
        (pdf["ts_us"] - cdc_op.EPOCH0_US) // cdc_op.WEEK_US, 2
    ).astype(int)
    carry = scdc.empty_carry(spark)
    summary = None
    users = ev.select("user_id").distinct()
    seg = F.col("user_id") % 5
    specs = [
        users.filter(F.col("user_id") % 4 != 3)
        .select("user_id", seg.alias("segment")),
        users.filter((F.col("user_id") % 4 == 3) & (F.col("user_id") % 8 != 7))
        .select("user_id", F.lit(5).cast("long").alias("segment")),
        users.filter(F.col("user_id") % 8 == 7)
        .select("user_id", F.lit(6).cast("long").alias("segment")),
    ]
    for e in (0, 1, 2):
        snap.commit(specs[e], root, mode="append")  # CDC ahead of facts
        chunk = pdf[epoch == e]
        if len(chunk) == 0:
            continue
        batch = spark.createDataFrame(chunk.reset_index(drop=True), EV_SCHEMA)
        summary, carry = scdc.cdc_dim_increment(batch, carry, root)
    got = (
        summary.toPandas()
        .sort_values(["epoch", "segment"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _want(spark, sf_dir), check_dtype=False)


def test_streaming_cdc_watermark_violation_raises(spark, sf_dir, tmp_path):
    """An event whose epoch's dim version has not committed must raise,
    never silently drop (the per-epoch filters would otherwise eat it)."""
    ev = tpch_ms.events_table(spark, sf_dir)
    root = str(tmp_path / "dim")
    _build_dim(spark, ev, root, upto=1)  # only v1 (epoch 0) committed
    pdf = ev.toPandas()
    epoch = np.minimum(
        (pdf["ts_us"] - cdc_op.EPOCH0_US) // cdc_op.WEEK_US, 2
    ).astype(int)
    late = pdf[epoch >= 1]
    assert len(late) > 0
    batch = spark.createDataFrame(late.reset_index(drop=True), EV_SCHEMA)
    with pytest.raises(ValueError, match="watermark"):
        scdc.cdc_dim_increment(batch, scdc.empty_carry(spark), root)
    # and with NO version at all
    with pytest.raises(ValueError, match="no committed dim version"):
        scdc.cdc_dim_increment(
            batch, scdc.empty_carry(spark), str(tmp_path / "nothing")
        )


def test_streaming_cdc_sink_exactly_once_and_restart(spark, sf_dir, tmp_path):
    """End-to-end readStream/foreachBatch: run two micro-batches under
    one sink instance, then a FRESH sink (fresh closure = restarted
    driver) over the same out_dir/checkpoint for the third. The durable
    carry must survive; the final summary equals the batch query; a
    marked batch replays as a no-op."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import await_done

    ev = tpch_ms.events_table(spark, sf_dir)
    root = str(tmp_path / "dim")
    _build_dim(spark, ev, root)
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
            scdc.streaming_cdc_dim_sink(stream, root, out_dir, ck)
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
    markers = [
        f for f in os.listdir(out_dir) if f.startswith("_marker_")
    ]
    last_id = max(int(m.split("_")[2].split(".")[0]) for m in markers)
    assert last_id >= 2
    got = (
        spark.read.parquet(os.path.join(out_dir, f"summary_batch_{last_id}"))
        .toPandas()
        .sort_values(["epoch", "segment"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _want(spark, sf_dir), check_dtype=False)
    with open(os.path.join(out_dir, f"_marker_{last_id}.json")) as fh:
        assert json.load(fh)["batch_id"] == last_id
