"""Streaming SumThreshold twin (r9): finalized cell flags must
reproduce operators/flagging.sumthreshold_cell_flags bit-for-bit across
arbitrary micro-batch splits, and the idle timeout must flush the tail
with end-of-series (incomplete window = 0) semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import pyspark.sql.functions as F

from codex_africanus_spark.operators import flagging as flag_op
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.streaming import flagging as sflag

from tests.conftest import await_done

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow

CELL_SCHEMA = (
    "antenna1 int, antenna2 int, chan int, time double, mean_mq long"
)


def _write_splits(src, pdf, n_files):
    src.mkdir()
    for k, chunk in enumerate(np.array_split(pdf, n_files)):
        if chunk.empty:
            continue
        path = src / f"part-{k:04d}.parquet"
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), path)
        os.utime(path, (1_000_000_000 + k * 100,) * 2)


def _run_stream(spark, src, ck, qname, timeout=None, watermark=False):
    stream = (
        spark.readStream.schema(CELL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    if watermark:
        stream = stream.withColumn(
            "event_time", F.timestamp_seconds(F.col("time"))
        ).withWatermark("event_time", "1 second")
    out = sflag.streaming_sumthreshold(stream, idle_timeout_secs=timeout)
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    return spark.sql(f"SELECT * FROM {qname}").toPandas()


def _latest(pdf):
    """update-mode memory sink keeps every emission; keep the LAST per
    cell (provisional rows are superseded by the closed one)."""
    return (
        pdf.groupby(["antenna1", "antenna2", "chan", "time"], as_index=False)
        .last()
    )


@pytest.mark.parametrize("n_files", [1, 4, 9])
def test_streaming_sumthreshold_matches_batch(spark, tmp_path, n_files):
    vis = tpch_ms.vis_table(spark, "/root/testdata/sf0.001")
    cells = (
        flag_op._cells(vis)
        .toPandas()
        .sort_values(["time", "antenna1", "antenna2", "chan"])
        .reset_index(drop=True)
        .astype({"antenna1": "int32", "antenna2": "int32", "chan": "int32"})
    )
    batch = (
        flag_op.sumthreshold_cell_flags(vis)
        .toPandas()
        .sort_values(["antenna1", "antenna2", "chan", "time"])
        .reset_index(drop=True)
    )
    src = tmp_path / f"cells_{n_files}"
    _write_splits(src, cells, n_files)
    raw = _run_stream(spark, src, tmp_path / f"ck_{n_files}", f"st_{n_files}")
    assert (~raw.closed).any()  # provisional tails were emitted
    got = (
        _latest(raw)
        .sort_values(["antenna1", "antenna2", "chan", "time"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch)
    # tail cells (last 3 per series) stay provisional without a timeout;
    # their h-windows are incomplete on BOTH sides, so flags still match
    for c in ["f1", "f2", "f4", "fany", "mean_mq"]:
        assert (
            got[c].to_numpy() == batch[c].to_numpy()
        ).all(), (n_files, c)


def test_streaming_sumthreshold_timeout_finalizes_tail(spark, tmp_path):
    """With an event-time timeout, an idle series' provisional tail is
    re-emitted closed, with incomplete windows scoring 0 (end-of-series
    semantics)."""
    rows = [(0, 1, 0, 1000.0 + 10 * i, 3_000_000 if i == 2 else 10_000)
            for i in range(5)]
    # keep the watermark moving with a second, later series
    rows += [(1, 2, 0, 50_000.0 + 10 * i, 10_000) for i in range(3)]
    pdf = pd.DataFrame(
        rows, columns=["antenna1", "antenna2", "chan", "time", "mean_mq"]
    ).astype({"antenna1": "int32", "antenna2": "int32", "chan": "int32"})
    src = tmp_path / "cells_to"
    _write_splits(src, pdf, 3)
    raw = _run_stream(
        spark, src, tmp_path / "ck_to", "st_to", timeout=500.0, watermark=True
    )
    s01 = raw[(raw.antenna1 == 0) & (raw.closed)]
    assert len(_latest(s01)) == 5  # every cell of the idle series closed
    # the spike cell (f1) was flagged
    spike = _latest(s01)
    assert spike[spike.time == 1020.0].iloc[0].f1 == 1
