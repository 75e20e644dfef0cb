"""Streaming salted BDA (r9 verdict item 5): the foreachBatch salted
increment must reproduce the unsalted stateful streaming twin
BIT-EXACTLY under the adversarial skew fuzz, across arbitrary
micro-batch splits — while its fact-scale stages stay keyed by
(baseline, bucket), never by baseline alone."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from codex_africanus_spark.streaming import salted as ssalt
from codex_africanus_spark.streaming import stateful

from tests.conftest import await_done
from tests.test_salted_bda import SCHEMA, _fuzz_frame

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def _unsalted_final_bins(spark, tmp_path, pdf, splits, tol, span, tag):
    """Run the unsalted streaming twin over `splits` micro-batches and
    return the final state of every bin."""
    src = tmp_path / f"vis_{tag}"
    src.mkdir()
    ordered = pdf.sort_values(["time", "row_id", "u", "v", "w", "vis_re"])
    for i, chunk in enumerate(np.array_split(ordered, splits)):
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False),
                       src / f"part-{i:03d}.parquet")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful.streaming_bda(stream, decorr_tol=tol, max_span_secs=span)
        .writeStream.format("memory")
        .queryName(f"sbda_{tag}")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    out = spark.sql(f"SELECT * FROM sbda_{tag}").toPandas()
    idx = out.groupby(["antenna1", "antenna2", "bin_idx"])["n_rows"].idxmax()
    return (
        out.loc[idx]
        .drop(columns=["closed"])
        .sort_values(["antenna1", "antenna2", "bin_idx"])
        .reset_index(drop=True)
    )


def _salted_final_bins(spark, pdf, splits, tol, span, bucket):
    """Drive salted_bda_increment over the same global-time splits."""
    ordered = pdf.sort_values(["time", "row_id", "u", "v", "w", "vis_re"])
    carry = ssalt.empty_carry(spark)
    emitted = []
    for chunk in np.array_split(ordered, splits):
        batch = spark.createDataFrame(chunk.reset_index(drop=True), SCHEMA)
        bins, carry = ssalt.salted_bda_increment(
            batch, carry, decorr_tol=tol, max_span_secs=span,
            bucket_secs=bucket,
        )
        emitted.append(bins.toPandas())
        carry = spark.createDataFrame(carry.toPandas(), ssalt.CARRY_SCHEMA)
    out = pd.concat(emitted, ignore_index=True)
    idx = out.groupby(["antenna1", "antenna2", "bin_idx"])["n_rows"].idxmax()
    return (
        out.loc[idx]
        .drop(columns=["closed"])
        .sort_values(["antenna1", "antenna2", "bin_idx"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("seed", [7, 42])
@pytest.mark.parametrize("splits", [1, 4])
@pytest.mark.parametrize(
    "tol,span,bucket",
    [
        (60.0, 900.0, 300.0),   # bins straddle buckets AND batches
        (6.0, 1e12, 37.0),      # motion-only closure, tiny buckets
    ],
)
def test_salted_increment_matches_unsalted_twin(
    spark, tmp_path, seed, splits, tol, span, bucket
):
    pdf = _fuzz_frame(seed, n=600)
    ref = _unsalted_final_bins(
        spark, tmp_path, pdf, splits, tol, span,
        f"{seed}_{splits}_{int(tol)}_{int(bucket)}",
    )
    got = _salted_final_bins(spark, pdf, splits, tol, span, bucket)
    assert ref.bin_idx.max() > 0
    pd.testing.assert_frame_equal(ref, got, check_dtype=False)


def test_salted_increment_fact_stages_keyed_by_bucket(spark):
    """Scale lock (the verdict's 'no state partition holds >1 bucket'
    analogue): both fact-scale pandas stages (Phase A, Phase C) are
    sorted-stream MapInPandas over (baseline, __bucket) repartitions;
    the ONLY baseline-keyed pandas stage is the Phase-B stitch, whose
    input is the one-row-per-bucket summary frame."""
    pdf = _fuzz_frame(3, n=200)
    batch = spark.createDataFrame(pdf, SCHEMA)
    bins, carry = ssalt.salted_bda_increment(
        batch, ssalt.empty_carry(spark), 60.0, 900.0, 300.0, _cut=False
    )
    plan = bins._jdf.queryExecution().analyzed().toString()
    # ≥2: Phase A + Phase C sorted streams (the un-cut resolution
    # subtree renders twice in the analyzed tree, so exact counts vary)
    assert plan.count("MapInPandas") >= 2
    reparts = [
        ln for ln in plan.splitlines() if "RepartitionByExpression" in ln
    ]
    assert len(reparts) >= 2
    # THE salt lock: every fact-row repartition carries __bucket — no
    # pandas stage is ever keyed by baseline alone over fact rows
    assert all("__bucket" in r for r in reparts)
    # the only baseline-keyed pandas stage is the Phase-B stitch, whose
    # child is the summary MapInPandas stream (one row per bucket)
    for ln in plan.splitlines():
        if "FlatMapGroupsInPandas" in ln:
            assert "phase_b" in ln


def test_foreach_batch_sink_exactly_once(spark, tmp_path):
    """The foreachBatch consumer commits bins + carry with a batch-id
    marker: a replayed batch id is a no-op (no duplicate bins)."""
    pdf = _fuzz_frame(11, n=300)
    ordered = pdf.sort_values(["time", "row_id", "u", "v", "w", "vis_re"])
    out_root = str(tmp_path / "bins")
    state_root = str(tmp_path / "state")
    fn = ssalt.streaming_salted_bda_sink(
        out_root, state_root, decorr_tol=60.0, max_span_secs=900.0,
        bucket_secs=300.0,
    )
    chunks = np.array_split(ordered, 3)
    for i, chunk in enumerate(chunks):
        fn(spark.createDataFrame(chunk.reset_index(drop=True), SCHEMA), i)
    first = spark.read.parquet(out_root).toPandas()
    fn(spark.createDataFrame(chunks[1].reset_index(drop=True), SCHEMA), 1)
    replay = spark.read.parquet(out_root).toPandas()
    assert len(replay) == len(first)  # replayed batch committed nothing
    # and the sink's bins match the direct increment protocol
    direct = _salted_final_bins(spark, pdf, 3, 60.0, 900.0, 300.0)
    idx = first.groupby(["antenna1", "antenna2", "bin_idx"])["n_rows"].idxmax()
    sunk = (
        first.loc[idx]
        .drop(columns=["closed", "batch_id"])
        .sort_values(["antenna1", "antenna2", "bin_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, sunk, check_dtype=False)
