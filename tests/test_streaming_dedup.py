"""Streaming exact dedup across micro-batches: first arrival wins,
in-watermark copies dropped via the state store, batch/stream digest
parity (streaming/dedup.py)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codex_africanus_spark.streaming import dedup as sdedup

from tests.conftest import await_done


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts_us"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))  # file-source batch order follows mtime


def _stream(spark, src):
    return (
        spark.readStream.schema("doc_id long, text string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    )


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    M = 60_000_000  # 1 min in µs
    B = 1_000_000_000_000_000  # epoch base: rows at epoch 0 == initial watermark get dropped as late
    # batch 0: three distinct docs
    _write(src / "b0.parquet",
           [(1, "alpha", B + 0 * M), (2, "beta", B + 1 * M), (3, "gamma", B + 2 * M)],
           1_000_000_000)
    # batch 1: copies of alpha/beta under NEW doc_ids (cross-batch state
    # must drop them) + one new doc
    _write(src / "b1.parquet",
           [(11, "alpha", B + 3 * M), (12, "beta", B + 4 * M), (13, "delta", B + 5 * M)],
           1_000_000_100)
    # batch 2: same-batch duplicate pair + copy of gamma
    _write(src / "b2.parquet",
           [(21, "epsilon", B + 6 * M), (22, "epsilon", B + 6 * M), (23, "gamma", B + 7 * M)],
           1_000_000_200)

    out = sdedup.streaming_exact_dedup(_stream(spark, src), watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    rows = spark.sql("SELECT doc_id, text FROM dedup_stream").collect()
    kept = {r.text: r.doc_id for r in rows}
    # one row per distinct text, and the FIRST arrival's doc_id
    assert len(rows) == len(kept) == 5
    assert kept == {"alpha": 1, "beta": 2, "gamma": 3, "delta": 13, "epsilon": 21}


def test_stream_batch_digest_parity(spark, tmp_path):
    """The streaming digest is the same expression as the batch
    exact_dedup — a backfill agrees with the live stream on what is a
    duplicate (the Kappa property)."""
    from codex_africanus_spark.operators.dedup import exact_dedup

    src = tmp_path / "docs2"
    src.mkdir()
    _write(src / "b0.parquet",
           [(1, "x", 10**15), (2, "y", 10**15 + 1), (3, "x", 10**15 + 2)], 1_000_000_000)

    out = sdedup.streaming_exact_dedup(_stream(spark, src), watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    stream_digests = {
        r.content_digest
        for r in spark.sql("SELECT content_digest FROM dedup_parity").collect()
    }
    batch = exact_dedup(spark.read.parquet(str(src)))
    batch_digests = {r.content_digest for r in batch.collect()}
    assert stream_digests == batch_digests
