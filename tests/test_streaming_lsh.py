"""Streaming LSH near-dup candidate gate: the candidate pairs emitted
across micro-batches must equal the batch twin over the same rows within
the horizon (Kappa parity — streaming/lsh.py)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codex_africanus_spark.streaming import lsh as slsh

from tests.conftest import await_done
import pytest

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts_us"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


DUP = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
OTHER = "completely different content with no overlapping shingles at all here"


def test_streaming_lsh_candidates_match_batch(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    M = 60_000_000  # 1 min in µs
    B = 1_000_000_000_000_000
    # duplicates arrive in DIFFERENT micro-batches (state-store join) and
    # a far-apart copy falls outside the horizon
    batches = [
        [(1, DUP, B + 0 * M), (2, OTHER, B + 1 * M)],
        [(3, NEAR, B + 5 * M), (4, "unrelated words " * 5, B + 6 * M)],
        [(5, DUP, B + 10 * M), (6, DUP, B + 200 * M)],  # 6 is > 1h after 1
    ]
    for i, rows in enumerate(batches):
        _write(src / f"b{i}.parquet", rows, 1_000_000_000 + i * 100)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    )
    q = (
        slsh.streaming_lsh_candidates(stream)
        .writeStream.format("memory")
        .queryName("lsh_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM lsh_stream").collect()
    }

    all_rows = [r for b in batches for r in b]
    batch_df = spark.createDataFrame(
        all_rows, "doc_id long, text string, ts_us long"
    ).withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    want = {
        (r["doc_a"], r["doc_b"])
        for r in slsh.lsh_candidates_batch(batch_df).collect()
    }
    assert got == want
    # semantic spot checks: exact/near dup pairs found across batches;
    # doc 6 (B+200 min) is outside the 1 h horizon of EVERY copy
    # (1 at +0, 3 at +5, 5 at +10) so it pairs with nothing
    assert (1, 5) in got and (1, 3) in got
    assert not any(6 in pair for pair in got)
    assert all(a < b for a, b in got)


def test_streaming_lsh_drops_late_arrivals(spark, tmp_path):
    """A duplicate arriving with an event time far behind the advanced
    watermark must be evicted, not paired — the state bound in action."""
    src = tmp_path / "docs_late"
    src.mkdir()
    M = 60_000_000
    B = 1_000_000_000_000_000
    # batch 0 advances the watermark to ~(B+300min − 2h); batch 1 lets
    # the join EVICT the B+0 state under that watermark (eviction lands
    # at batch boundaries, one batch behind the max event time); batch 2
    # then delivers a copy of DUP stamped at B+1min — hours behind the
    # watermark, in the guaranteed-drop region with no state to meet
    _write(src / "b0.parquet", [(1, DUP, B + 0 * M), (2, DUP, B + 300 * M)],
           1_000_000_000)
    _write(src / "b1.parquet", [(5, OTHER, B + 301 * M)], 1_000_000_100)
    _write(src / "b2.parquet", [(9, DUP, B + 1 * M)], 1_000_000_200)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    )
    from codex_africanus_spark.streaming import lsh as slsh2

    q = (
        slsh2.streaming_lsh_candidates(stream)
        .writeStream.format("memory")
        .queryName("lsh_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM lsh_late").collect()
    }
    # doc 9 is late beyond the watermark: no pair involving it survives;
    # 1↔2 are 300 min apart (outside the horizon) so nothing is emitted
    assert not any(9 in p for p in got)
    assert (1, 2) not in got
