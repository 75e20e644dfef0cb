"""Watermark semantics: rows later than the committed watermark are
dropped before the stateful aggregation (SURVEY §2.10 — the streaming
analogue of the reference's monotone-time contract, where late rows are
the flagged-row case)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codex_africanus_spark.streaming import windowed

from tests.conftest import await_done
import pytest


def _write(path, rows, mtime):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts_us", "value"]
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))  # the file source orders batches by mtime


@pytest.mark.slow
def test_late_rows_dropped_beyond_watermark(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    H = 3_600_000_000  # 1h in µs
    # batch 0: hours 10, 11 → watermark commits to 9h
    _write(src / "part-000.parquet",
           [(1, 1, "a", 10 * H, 1.0), (2, 1, "a", 11 * H, 1.0)], 1_000_000_000)
    # batch 1: hour 12 (on time) → watermark commits to 10h
    _write(src / "part-001.parquet", [(3, 1, "a", 12 * H, 1.0)], 1_000_000_100)
    # batch 2: hour 1 — far beyond the watermark → dropped pre-aggregation
    _write(src / "part-002.parquet", [(4, 1, "a", 1 * H, 99.0)], 1_000_000_200)

    schema = "event_id long, user_id long, event_type string, ts_us long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    )
    agg = windowed.tumbling_window_stats(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # exactly the hour-1 straggler
    vals = [r.value_sum for r in spark.sql("SELECT value_sum FROM late_test").collect()]
    assert 99.0 not in vals  # the late row reached no finalized window
