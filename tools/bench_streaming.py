"""Streaming-twin micro-bench (r14 verdict item 9).

The foreachBatch/withWatermark streaming twins reuse the optimized batch
operators but have no bench.py row (the driver bench can't host a
multi-trigger streaming run), so optimization rounds had no recorded
number to move. This tool times the three twin families end-to-end:

- cdc_increment:   N-way micro-batch drive of streaming/cdc.cdc_dim_increment
                   against a freshly committed 3-version dim snapshot
                   (the events_cdc_dim_state_join twin);
- gapfill_increment: same drive of streaming/gapfill.gap_fill_increment
                   (the events_hourly_gap_fill twin);
- watermark_window_drop: the REAL `withWatermark` availableNow run over
                   mtime-staged arrival batches (streaming/windowed.
                   streaming_window_drop — the events_watermark_window_drop
                   twin), one trigger per arrival batch.

Methodology mirrors bench.py: min-of-RUNS wall per twin, fresh
checkpoint/output dirs per run (a reused checkpoint would replay markers
and time nothing), ONE JSON line on stdout:
  {"metric": "streaming_twin_wall_time", "value": total,
   "queries": {name: sec}, "sf": ..., "batches": N}

Usage: python tools/bench_streaming.py [SF_DIR] [--runs=N] [--batches=N]
Baseline (this box, idle, 2026-08-18, sf0.1, 32 cores, runs=2,
batches=6): see OPTIMIZATION_r14.md "streaming twins" entry.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from codex_africanus_spark.session import get_spark  # noqa: E402
from codex_africanus_spark.sources import snapshot as snap  # noqa: E402
from codex_africanus_spark.sources import tpch_ms  # noqa: E402
from codex_africanus_spark.streaming import cdc as scdc  # noqa: E402
from codex_africanus_spark.streaming import gapfill as sgap  # noqa: E402
from codex_africanus_spark.streaming import windowed  # noqa: E402

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
OPTS = {a.split("=")[0]: a.split("=", 1)[1] for a in sys.argv[1:] if "=" in a}
SF_DIR = ARGS[0] if ARGS else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(OPTS.get("--runs", 2))
BATCHES = int(OPTS.get("--batches", 6))

EV_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, value double"
)


def _build_dim(spark, ev, root):
    """The cdc twin's three dim-snapshot versions (same predicates as
    tests/test_streaming_cdc.py — the registered query's referent)."""
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
    for d in specs:
        snap.commit(d, root, mode="append")


def _drive_cdc(spark, ev_pdf, root):
    carry = scdc.empty_carry(spark)
    summary = None
    for chunk in np.array_split(ev_pdf, BATCHES):
        if len(chunk) == 0:
            continue
        batch = spark.createDataFrame(chunk.reset_index(drop=True), EV_SCHEMA)
        summary, carry = scdc.cdc_dim_increment(batch, carry, root)
    summary.write.format("noop").mode("overwrite").save()


def _drive_gapfill(spark, ev_pdf):
    carry = sgap.empty_carry(spark)
    summary = None
    for chunk in np.array_split(ev_pdf, BATCHES):
        if len(chunk) == 0:
            continue
        batch = spark.createDataFrame(chunk.reset_index(drop=True), EV_SCHEMA)
        summary, carry = sgap.gap_fill_increment(batch, carry)
    summary.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("codex-africanus-spark-bench-streaming")
    spark.sparkContext.setLogLevel("WARN")
    ev = tpch_ms.events_table(spark, SF_DIR)
    # one driver-side event frame reused by the increment drives (the
    # micro-batch splitter needs a stable row order; inside the timed
    # region each run re-creates every batch DataFrame from it)
    ev_pdf = ev.toPandas().sort_values("event_id").reset_index(drop=True)
    work = tempfile.mkdtemp(prefix="bench_streaming_")
    timings: dict[str, float] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"bench_streaming: {name}")
        best = None
        for r in range(RUNS):
            t0 = time.perf_counter()
            fn(r)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr, flush=True)

    # cdc: dim committed once (fixture, untimed — the twin consumes a
    # pre-existing dim table); each timed run drives all N batches
    dim_root = os.path.join(work, "dim")
    _build_dim(spark, ev, dim_root)
    timed("cdc_increment", lambda r: _drive_cdc(spark, ev_pdf, dim_root))
    timed("gapfill_increment", lambda r: _drive_gapfill(spark, ev_pdf))

    def run_wm(r):
        src = os.path.join(work, f"wm_src_{r}")
        ck = os.path.join(work, f"wm_ck_{r}")
        windowed.stage_arrival_batches(
            ev, src,
            jitter_us=1_800_000_000, batch_us=3_600_000_000 * 24 * 14,
        )
        got, _dropped = windowed.streaming_window_drop(
            spark, src, ck,
            delay_us=7_200_000_000, hour_us=3_600_000_000 * 24,
            name=f"bench_wm_{r}",
        )
        got.write.format("noop").mode("overwrite").save()

    timed("watermark_window_drop", run_wm)

    print(json.dumps({
        "metric": "streaming_twin_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "batches": BATCHES,
        "runs": RUNS,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
