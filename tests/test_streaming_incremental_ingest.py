"""Streaming incremental dedup ingestion (r8): the batch probe as a
foreachBatch consumer with exactly-once snapshot commits.

Locks: (1) cross-batch survivor consultation — a doc appended by an
earlier micro-batch is found as the duplicate source by a later one;
(2) exactly-once — replaying a committed batch id is a no-op on every
table; (3) partial-crash replay — a batch whose sets commit landed but
whose prefix/report didn't completes idempotently on replay.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from codex_africanus_spark.operators import dedup as dedup_op
from codex_africanus_spark.sources import snapshot as snap
from codex_africanus_spark.sources.tables import load
from codex_africanus_spark.streaming import dedup as sdedup

from tests.conftest import await_done
import pytest


def _write(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


@pytest.mark.slow
def test_streaming_ingest_cross_batch_and_exactly_once(spark, sf_dir, tmp_path):
    docs = load(spark, "documents", sf_dir)
    index_root = str(tmp_path / "idx")
    report_root = str(tmp_path / "rep")
    # base index (cold build + first batch append, the batch tier)
    dedup_op.incremental_dedup_ingest(spark, docs, index_root).count()

    base_doc = (
        docs.filter(
            (F.col("doc_id") % dedup_op.INGEST_MODULUS != 0)
            & (F.size(F.split("text", " ")) >= 5)
        )
        .orderBy("doc_id")
        .first()
    )
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    a_id, b_id, c_id, d_id = mx + 101, mx + 102, mx + 203, mx + 204
    uniq_b = "zqxa zqxb zqxc zqxd zqxe zqxf"
    uniq_d = "ywpa ywpb ywpc ywpd ywpe"
    src = tmp_path / "stream_src"
    src.mkdir()
    # batch 0: one copy of a committed base doc (dup), one unique (survivor)
    _write(src / "b0.parquet",
           [(a_id, base_doc.text), (b_id, uniq_b)], 1_000_000_000)
    # batch 1: a copy of batch 0's SURVIVOR (must be flagged against it)
    # plus another unique doc
    _write(src / "b1.parquet",
           [(c_id, uniq_b), (d_id, uniq_d)], 1_000_000_100)

    ingest = sdedup.streaming_incremental_ingest(index_root, report_root)
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)

    rep = {
        r.doc_id: r
        for r in snap.read_snapshot(spark, report_root).collect()
    }
    assert set(rep) == {a_id, b_id, c_id, d_id}
    assert rep[a_id].is_dup == 1 and rep[a_id].best_match == base_doc.doc_id
    assert rep[b_id].is_dup == 0
    # THE contract: the later micro-batch consults the earlier batch's
    # appended survivor
    assert rep[c_id].is_dup == 1 and rep[c_id].best_match == b_id
    assert rep[c_id].jaccard_q == 1.0
    assert rep[d_id].is_dup == 0
    # survivors (and only survivors) were appended to the index
    idx_ids = {
        r.doc_id
        for r in snap.read_snapshot(spark, f"{index_root}/sets")
        .select("doc_id").collect()
    }
    assert b_id in idx_ids and d_id in idx_ids
    assert a_id not in idx_ids and c_id not in idx_ids

    # exactly-once: replaying batch 0 by hand is a no-op everywhere
    versions = {
        t: snap.latest_version(t)
        for t in (f"{index_root}/sets", f"{index_root}/prefix", report_root)
    }
    ingest(spark.read.parquet(str(src / "b0.parquet")), 0)
    for t, v in versions.items():
        assert snap.latest_version(t) == v, f"replay committed to {t}"

    # partial-crash replay: batch 7's sets landed, prefix/report didn't —
    # the rerun must skip sets and complete the rest
    e_id = mx + 307
    b7 = spark.createDataFrame([(e_id, "kqra kqrb kqrc kqrd")],
                               "doc_id long, text string")
    report7, sh7, ranks7 = dedup_op._probe_committed(spark, b7, index_root)
    sets7 = dedup_op._rarest_first_sets(sh7, F.broadcast(ranks7))
    snap.foreach_batch_committer(f"{index_root}/sets")(sets7, 7)
    v_sets = snap.latest_version(f"{index_root}/sets")
    ingest(b7, 7)
    assert snap.latest_version(f"{index_root}/sets") == v_sets  # skipped
    rep7 = {r.doc_id for r in snap.read_snapshot(spark, report_root)
            .filter(F.col("batch_id") == 7).collect()}
    assert rep7 == {e_id}
    assert snap.read_snapshot(spark, f"{index_root}/prefix").filter(
        F.col("doc_id") == e_id
    ).count() > 0
