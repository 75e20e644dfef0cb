"""Streaming CMS cell maintenance: the final state-store cell table
after N micro-batches must equal the batch sketch over the same rows
(Kappa parity — streaming/sketches.py)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from codex_africanus_spark.streaming import sketches as ssk

from tests.conftest import await_done
import pytest


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


@pytest.mark.slow
def test_streaming_cms_cells_match_batch(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    batches = [
        [(1, "the cat sat on the mat"), (2, "the dog ran")],
        [(3, "a cat and a dog"), (4, "the the the")],
        [(5, "mat cat dog the")],
    ]
    for i, rows in enumerate(batches):
        _write(src / f"b{i}.parquet", rows, 1_000_000_000 + i * 100)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        ssk.streaming_cms_cells(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = {
        (r["row"], r["cell"]): r["n"]
        for r in spark.sql("SELECT row, cell, n FROM cms_stream").collect()
    }

    all_rows = [r for b in batches for r in b]
    batch_df = spark.createDataFrame(all_rows, "doc_id long, text string")
    want = {
        (r["row"], r["cell"]): r["n"] for r in ssk.batch_cms_cells(batch_df).collect()
    }
    assert got == want
    # CMS invariant: total count per hash row == total token count
    n_tokens = sum(len(t.split(" ")) for _, t in all_rows)
    for row in range(4):
        assert sum(n for (r, _), n in got.items() if r == row) == n_tokens
