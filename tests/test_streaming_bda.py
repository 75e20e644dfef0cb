"""Streaming BDA (ROADMAP #3): the decorrelation accumulator carried
across micro-batches must reproduce the batch operator exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from codex_africanus_spark.operators import bda as bda_op
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.streaming import stateful

from tests.conftest import await_done

TOL = 120.0  # small tolerance → several bins per baseline at sf0.001


def _final_bins(pdf: pd.DataFrame) -> pd.DataFrame:
    """Memory sink keeps every update-mode emission; the final state of
    each bin is its emission with the most rows."""
    idx = pdf.groupby(["antenna1", "antenna2", "bin_idx"])["n_rows"].idxmax()
    return (
        pdf.loc[idx]
        .drop(columns=["closed"])
        .sort_values(["antenna1", "antenna2", "bin_idx"])
        .reset_index(drop=True)
    )


def test_streaming_bda_idle_timeout_flushes_open_bin(spark, tmp_path):
    """ROADMAP #3 remainder: a baseline idle past the event-time timeout
    has its open bin flushed as closed when the watermark passes its
    deadline (GroupState EventTimeTimeout)."""
    import os

    import pyspark.sql.functions as F

    src = tmp_path / "vis"
    src.mkdir()
    cols = ["row_id", "time", "antenna1", "antenna2", "u", "v", "w",
            "vis_re", "vis_im", "weight"]

    def w(path, rows, mtime):
        pdf = pd.DataFrame(rows, columns=cols).astype(
            {"antenna1": "int32", "antenna2": "int32"}
        )
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        os.utime(path, (mtime, mtime))

    # baseline (0,1): 3 rows early, then silence → must be flushed
    # baseline (1,2): keeps the watermark moving
    # (times start well above 0: a t=0 event collides with the initial
    # watermark and is discarded as late)
    w(src / "p0.parquet",
      [(i, 1000.0 + 10.0 * i, 0, 1, 1.0, 1.0, 0.0, 1.0, 0.5, 1.0) for i in range(3)]
      + [(10, 1020.0, 1, 2, 5.0, 5.0, 0.0, 2.0, 1.0, 1.0)], 1_000_000_000)
    w(src / "p1.parquet",
      [(11, 100_000.0, 1, 2, 5.0, 5.0, 0.0, 2.0, 1.0, 1.0)], 1_000_000_100)
    w(src / "p2.parquet",
      [(12, 100_010.0, 1, 2, 5.0, 5.0, 0.0, 2.0, 1.0, 1.0)], 1_000_000_200)

    schema = ("row_id long, time double, antenna1 int, antenna2 int, "
              "u double, v double, w double, vis_re double, vis_im double, "
              "weight double")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_seconds(F.col("time")))
        .withWatermark("event_time", "1 second")
    )
    out = stateful.streaming_bda(stream, decorr_tol=1e9, idle_timeout_secs=500.0)
    q = (
        out.writeStream.format("memory")
        .queryName("bda_timeout")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    res = spark.sql(
        "SELECT * FROM bda_timeout WHERE antenna1 = 0 AND antenna2 = 1"
    ).toPandas()
    closed = res[res.closed]
    assert len(closed) == 1  # the idle flush, and nothing else
    assert closed.iloc[0].n_rows == 3 and closed.iloc[0].time_end == 1020.0


# Sweep decorrelation tolerance (the reference sweeps decorrelation in
# africanus/averaging/tests/): tight → many short bins (state closes
# nearly every batch), loose → few long bins (state survives across
# micro-batches) — the two regimes stress opposite state-store paths.
@pytest.mark.parametrize("tol", [40.0, TOL, 600.0])
def test_streaming_bda_matches_batch_across_microbatches(spark, sf_dir, tmp_path, tol):
    vis = tpch_ms.vis_table(spark, sf_dir).filter("antenna1 < 3 AND antenna2 < 6")
    cols = ["row_id", "time", "antenna1", "antenna2", "u", "v", "w",
            "vis_re", "vis_im", "weight"]
    batch = (
        bda_op.bda_average(vis, decorr_tol=tol)
        .toPandas()
        .sort_values(["antenna1", "antenna2", "bin_idx"])
        .reset_index(drop=True)
    )
    if tol <= TOL:
        assert batch.bin_idx.max() > 0  # tight rules actually close bins

    # Split time-ordered into 4 files → 4 micro-batches; the global time
    # split keeps every baseline's rows time-ordered across batches.
    src = tmp_path / "vis_stream"
    src.mkdir()
    pdf = vis.select(*cols).toPandas().sort_values(
        ["time", "row_id", "u", "v", "w", "vis_re"]
    )
    for i, chunk in enumerate(np.array_split(pdf, 4)):
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False),
                       src / f"part-{i:03d}.parquet")

    schema = ("row_id long, time double, antenna1 int, antenna2 int, "
              "u double, v double, w double, vis_re double, vis_im double, "
              "weight double")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = stateful.streaming_bda(stream, decorr_tol=tol)
    qname = f"bda_stream_{int(tol)}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    raw = spark.sql(f"SELECT * FROM {qname}").toPandas()
    assert (~raw.closed).any()
    if tol <= TOL:
        assert raw.closed.any()
    got = _final_bins(raw)

    assert len(got) == len(batch)
    for c in ["antenna1", "antenna2", "bin_idx", "n_rows"]:
        assert (got[c].to_numpy() == batch[c].to_numpy()).all(), c
    for c in ["time_start", "time_end", "vis_re_avg", "vis_im_avg", "weight_sum"]:
        np.testing.assert_allclose(
            got[c].to_numpy(), batch[c].to_numpy(), rtol=1e-9, err_msg=c
        )
