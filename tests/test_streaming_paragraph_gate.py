"""r11 streaming paragraph-dedup gate: cross-document near-dup
PARAGRAPH pairs emitted across micro-batches must equal the batch twin
over the same rows within the horizon (Kappa parity — streaming/lsh.py
paragraph tier), and the document-grain semantics must hold: a shared
paragraph inside otherwise-different documents is caught; distinct
content is not; the horizon bounds matching."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codex_africanus_spark.streaming import lsh as slsh

from tests.conftest import await_done
import pytest


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts_us"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


BOILER = "subscribe to our newsletter for the latest updates and offers today"
UNIQ_A = "astronomy results show the galaxy rotation curves remain flat outward"
UNIQ_B = "cooking rice well requires patience a heavy pot and gentle steady heat"
UNIQ_C = "tax law changed in april affecting small business quarterly filings"


@pytest.mark.slow
def test_streaming_paragraph_gate_matches_batch(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    M = 60_000_000
    B = 1_000_000_000_000_000
    # the shared boilerplate paragraph rides inside otherwise-different
    # documents arriving in different micro-batches; doc 6's copy is
    # outside the horizon of every other
    batches = [
        [(1, f"{UNIQ_A}. {BOILER}", B + 0 * M),
         (2, f"{UNIQ_B}. {UNIQ_C}", B + 1 * M)],
        [(3, f"{BOILER}. {UNIQ_C}", B + 5 * M)],
        [(5, f"{UNIQ_B}. {BOILER}", B + 10 * M),
         (6, f"{BOILER}. {UNIQ_A}", B + 200 * M)],
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
        slsh.streaming_paragraph_candidates(stream)
        .writeStream.format("memory")
        .queryName("para_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = {
        (r["uid_a"], r["uid_b"], r["doc_a"], r["doc_b"])
        for r in spark.sql(
            "SELECT DISTINCT uid_a, uid_b, doc_a, doc_b FROM para_stream"
        ).collect()
    }

    all_rows = [r for b in batches for r in b]
    batch_df = spark.createDataFrame(
        all_rows, "doc_id long, text string, ts_us long"
    ).withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    want = {
        (r["uid_a"], r["uid_b"], r["doc_a"], r["doc_b"])
        for r in slsh.paragraph_candidates_batch(batch_df).collect()
    }
    assert got == want
    docs_paired = {(a, b) for _, _, a, b in got}
    # boilerplate paragraph caught across 1-3, 1-5, 3-5 (all in horizon)
    assert {(1, 3), (1, 5), (3, 5)} <= docs_paired
    # doc 6 is 200 min after every other copy — outside the 1 h horizon
    assert not any(6 in p for p in docs_paired)
    # the unique paragraphs never pair: UNIQ_C appears in docs 2 and 3
    # inside the horizon -> that IS a legitimate cross-doc dup, but
    # UNIQ_A's second copy lives only in doc 6 (out of horizon)
    assert (2, 3) in docs_paired
    # uid packing: every pair is cross-document with uid_a < uid_b
    assert all(a < b for a, b, *_ in got)


def test_paragraph_gate_distinct_content_silent(spark):
    rows = [
        (1, f"{UNIQ_A}. {UNIQ_B}", 1_000_000_000_000_000),
        (2, f"{UNIQ_C}. completely other words entirely here now",
         1_000_000_000_000_000 + 60_000_000),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts_us long"
    ).withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    assert slsh.paragraph_candidates_batch(df).count() == 0
