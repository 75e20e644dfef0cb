"""Stream-stream interval join: Kappa parity with the batch twin, and
state-eviction bookkeeping under multi-batch progress."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codex_africanus_spark.streaming import joins, windowed

from tests.conftest import await_done
import pytest

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def test_stream_matches_batch_twin(spark, sf_dir, tmp_path):
    """AvailableNow over the real events table must reproduce the batch
    join row-for-row (no watermark drops in a single replay)."""
    stream = windowed.read_events_stream(spark, sf_dir)
    out = joins.attribution_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = spark.sql("SELECT * FROM attr_stream").toPandas()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from codex_africanus_spark.sources.tpch_ms import events_ts_us

    ev = ev.withColumn("event_time", F.timestamp_micros(events_ts_us(ev)))
    want = joins.attribution_batch(ev).toPandas()

    assert len(got) > 0, "attribution horizon should capture pairs"
    key = ["user_id", "view_id", "purchase_id"]
    got_s = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want_s = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def _write(path, rows, mtime):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts_us", "value"]
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


def test_interval_and_state_eviction(spark, tmp_path):
    """Hand-built micro-batches: only in-horizon purchases match, and the
    state store reports evictions once the watermark passes old views."""
    src = tmp_path / "ev"
    src.mkdir()
    H = 3_600_000_000  # 1h in µs
    # batch 0: a view at t=10h, purchases at 10.5h (in horizon) and 12h (out)
    _write(
        src / "p0.parquet",
        [
            (1, 7, "view", 10 * H, 0.0),
            (2, 7, "purchase", 10 * H + H // 2, 5.0),
            (3, 7, "purchase", 12 * H, 9.0),
        ],
        1_000_000_000,
    )
    # batches 1-3: far-future events on BOTH sides — the global watermark
    # is the MIN over the two sides' watermark nodes, so a view-only
    # advance would leave it pinned at the last purchase. It is also
    # committed from the previous batch's max and applied one batch
    # later, hence two extra batches before batch-0's buffered rows are
    # past `watermark > event_time + horizon` and actually evicted.
    # (user 9's view/purchase pairs are 5h apart — no new matches.)
    _write(
        src / "p1.parquet",
        [(4, 9, "view", 30 * H, 0.0), (5, 9, "purchase", 25 * H, 1.0)],
        1_000_000_100,
    )
    _write(
        src / "p2.parquet",
        [(6, 9, "view", 31 * H, 0.0), (7, 9, "purchase", 26 * H, 1.0)],
        1_000_000_200,
    )
    _write(
        src / "p3.parquet",
        [(8, 9, "view", 32 * H, 0.0), (9, 9, "purchase", 27 * H, 1.0)],
        1_000_000_300,
    )

    schema = "event_id long, user_id long, event_type string, ts_us long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    )
    out = joins.attribution_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    rows = spark.sql(
        "SELECT view_id, purchase_id, gap_us FROM attr_evict"
    ).collect()
    assert [(r.view_id, r.purchase_id, r.gap_us) for r in rows] == [(1, 2, H // 2)]
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert removed > 0, "watermark advance must evict buffered join state"


def test_attribution_stream_lands_in_snapshot_table(spark, sf_dir, tmp_path):
    """Full streaming-lakehouse path: the stream-stream join's output is
    committed to the transactional snapshot table via the exactly-once
    foreachBatch committer, and the table's content matches the batch
    twin computed directly."""
    from codex_africanus_spark.sources import snapshot as snap

    root = str(tmp_path / "attr_table")
    stream = windowed.read_events_stream(spark, sf_dir)
    out = joins.attribution_stream(stream)
    q = (
        out.writeStream.foreachBatch(snap.foreach_batch_committer(root))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)

    got = snap.read_snapshot(spark, root).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from codex_africanus_spark.sources.tpch_ms import events_ts_us

    ev = ev.withColumn("event_time", F.timestamp_micros(events_ts_us(ev)))
    want = joins.attribution_batch(ev).toPandas()
    key = ["user_id", "view_id", "purchase_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key).reset_index(drop=True)[sorted(want.columns)],
        check_dtype=False,
    )
    assert snap.committed_batch_ids(root), "commits must carry batch ids"
