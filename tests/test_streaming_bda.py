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


# ---------------------------------------------------------------------------
# r9: the vectorized scan kernel (salted Phase-A jump table lifted into
# the state-store update fn) must be bit-identical to the quantized
# sequential loop across arbitrary batch splits, and O(rows) numpy.
# ---------------------------------------------------------------------------

import math

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def _scalar_reference(batches, tol, span, MG=1e6, VG=1e6):
    """Sequential quantized binner (bda_average_quantized's loop) with
    cross-batch state carry — the scalar twin of the vectorized kernel."""
    tol_q = int(math.floor(tol * MG + 0.5))
    bin_idx, start_t = 0, None
    pu = pv = pw = 0.0
    acc_q = 0
    n, t_min, t_max, w_acc, re_acc, im_acc = 0, 0.0, 0.0, 0, 0, 0
    out = []

    def qv(x):
        x = x * VG
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    for pdf in batches:
        for r in pdf.sort_values(
            ["time", "row_id", "u", "v", "w", "vis_re"]
        ).itertuples():
            if start_t is None:
                start_t, acc_q = r.time, 0
            else:
                step = abs(r.u - pu) + abs(r.v - pv) + abs(r.w - pw)
                acc_q += int(math.floor(step * MG + 0.5))
                if acc_q > tol_q or (r.time - start_t) > span:
                    out.append((bin_idx, n, t_min, t_max,
                                re_acc, im_acc, w_acc))
                    bin_idx += 1
                    start_t, acc_q = r.time, 0
                    n, w_acc, re_acc, im_acc = 0, 0, 0, 0
            if n == 0:
                t_min = t_max = r.time
            n += 1
            t_min, t_max = min(t_min, r.time), max(t_max, r.time)
            w_acc += qv(r.weight)
            re_acc += qv(r.vis_re * r.weight)
            im_acc += qv(r.vis_im * r.weight)
            pu, pv, pw = r.u, r.v, r.w
    open_bin = (bin_idx, n, t_min, t_max, re_acc, im_acc, w_acc, acc_q,
                pu, pv, pw, start_t)
    return out, open_bin


def _run_kernel(batches, tol, span):
    scan = stateful._make_scan_kernel(tol, span)
    st = (0, None, 0.0, 0.0, 0.0, 0, 0, 0.0, 0.0, 0, 0, 0)

    def q(x):
        x = x * 1e6
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype("int64")

    closed = []
    for pdf in batches:
        pdf = pdf.sort_values(["time", "row_id", "u", "v", "w", "vis_re"])
        wt = pdf["weight"].to_numpy(dtype="float64")
        c, st = scan(
            pdf["u"].to_numpy(dtype="float64"),
            pdf["v"].to_numpy(dtype="float64"),
            pdf["w"].to_numpy(dtype="float64"),
            pdf["time"].to_numpy(dtype="float64"),
            q(wt),
            q(pdf["vis_re"].to_numpy(dtype="float64") * wt),
            q(pdf["vis_im"].to_numpy(dtype="float64") * wt),
            st,
        )
        # array-block format -> (bin_idx, n, tmin, tmax, re_q, im_q, w_q)
        ids, ns, tmins, tmaxs, res, ims, ws = c
        closed.extend(zip(ids.tolist(), ns.tolist(), tmins.tolist(),
                          tmaxs.tolist(), res.tolist(), ims.tolist(),
                          ws.tolist()))
    return closed, st


def _fuzz_frame(rng, n):
    return pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "time": np.sort(rng.uniform(0, 5000, n)),
            "u": rng.uniform(-300, 300, n),
            "v": rng.uniform(-300, 300, n),
            "w": rng.uniform(-40, 40, n),
            "vis_re": rng.uniform(-5, 5, n),
            "vis_im": rng.uniform(-5, 5, n),
            "weight": rng.uniform(0.25, 4.0, n),
        }
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("nsplit", [1, 3, 7])
def test_scan_kernel_bit_identical_to_scalar_loop(seed, nsplit):
    rng = np.random.RandomState(seed)
    pdf = _fuzz_frame(rng, 600)
    # duplicated (time, row_id) rows — the testdata tie trap
    pdf = pd.concat([pdf, pdf.iloc[:17]], ignore_index=True)
    batches = np.array_split(pdf, nsplit)
    for tol in (40.0, 250.0, 1e9):
        for span in (900.0, 1e12):
            ref_closed, ref_open = _scalar_reference(batches, tol, span)
            got_closed, got_st = _run_kernel(batches, tol, span)
            assert len(got_closed) == len(ref_closed), (tol, span)
            for g, r in zip(got_closed, ref_closed):
                # ints exact; time floats bit-identical (copied values)
                assert g[0] == r[0] and g[1] == r[1], (g, r)
                assert g[4] == r[4] and g[5] == r[5] and g[6] == r[6], (g, r)
                for gf, rf in ((g[2], r[2]), (g[3], r[3])):
                    assert np.float64(gf).view(np.int64) == np.float64(
                        rf
                    ).view(np.int64), (g, r)
            (bin_idx, start_t, pu, pv, pw, acc_q,
             n, t_min, t_max, w_acc, re_acc, im_acc) = got_st
            (r_bin, r_n, r_tmin, r_tmax, r_re, r_im, r_w, r_acc,
             r_pu, r_pv, r_pw, r_start) = ref_open
            assert (bin_idx, n) == (r_bin, r_n)
            assert (acc_q, w_acc, re_acc, im_acc) == (r_acc, r_w, r_re, r_im)
            for gf, rf in [(t_min, r_tmin), (t_max, r_tmax), (pu, r_pu),
                           (pv, r_pv), (pw, r_pw), (start_t, r_start)]:
                assert np.float64(gf).view(np.int64) == np.float64(
                    rf
                ).view(np.int64)


def test_scan_kernel_state_only_entry_closure():
    """First row of a batch immediately triggers closure of the carried
    bin: the state-only bin must emit with zero batch rows merged."""
    b1 = pd.DataFrame({
        "row_id": [0, 1], "time": [10.0, 20.0],
        "u": [0.0, 1.0], "v": [0.0, 0.0], "w": [0.0, 0.0],
        "vis_re": [2.0, 4.0], "vis_im": [1.0, 1.0], "weight": [1.0, 1.0],
    })
    b2 = pd.DataFrame({
        "row_id": [2], "time": [30.0],
        "u": [1000.0], "v": [0.0], "w": [0.0],
        "vis_re": [8.0], "vis_im": [1.0], "weight": [1.0],
    })
    ref_closed, ref_open = _scalar_reference([b1, b2], 50.0, 1e12)
    got_closed, got_st = _run_kernel([b1, b2], 50.0, 1e12)
    assert got_closed == ref_closed
    assert len(got_closed) == 1 and got_closed[0][1] == 2  # 2-row bin
    assert got_st[6] == 1  # single-row open bin from batch 2


def test_scan_kernel_throughput_is_vectorized():
    """O(rows) numpy, not a Python row loop: 1M rows in well under the
    ~5 s the itertuples loop needs (generous 1.5 s bound for shared
    hosts; the kernel runs this in tens of milliseconds)."""
    import time

    rng = np.random.RandomState(7)
    pdf = _fuzz_frame(rng, 1_000_000).sort_values(
        ["time", "row_id", "u", "v", "w", "vis_re"]
    )
    wt = pdf["weight"].to_numpy(dtype="float64")

    def q(x):
        x = x * 1e6
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype("int64")

    args = (
        pdf["u"].to_numpy(dtype="float64"),
        pdf["v"].to_numpy(dtype="float64"),
        pdf["w"].to_numpy(dtype="float64"),
        pdf["time"].to_numpy(dtype="float64"),
        q(wt),
        q(pdf["vis_re"].to_numpy(dtype="float64") * wt),
        q(pdf["vis_im"].to_numpy(dtype="float64") * wt),
    )
    st0 = (0, None, 0.0, 0.0, 0.0, 0, 0, 0.0, 0.0, 0, 0, 0)
    scan = stateful._make_scan_kernel(250.0, 1e12)
    scan(*args, st0)  # warm numpy
    t0 = time.perf_counter()
    closed, st = scan(*args, st0)
    dt = time.perf_counter() - t0
    assert len(closed[0]) > 100  # real bin structure, not one giant bin
    assert dt < 1.5, f"scan kernel took {dt:.2f}s for 1M rows"
