"""Algorithmic invariants of the corpus-curation operators — properties
the SQL oracle can't express as equality (guarantees, bounds, coverage)."""

import pandas as pd
from pyspark.sql import functions as F

from codex_africanus_spark.operators import curation as cur_op
from codex_africanus_spark.operators import dedup as dedup_op
from codex_africanus_spark.sources.tables import load


def test_chunk_dedup_conservation(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    out = cur_op.chunk_dedup(docs).toPandas()
    ch = cur_op._chunk_frame(docs)
    n_chunks = ch.count()
    n_distinct = ch.select(F.md5("chunk")).distinct().count()
    assert out.n_chunks.sum() == n_chunks
    # exactly one chunk kept per distinct digest, never more than present
    assert out.n_kept.sum() == n_distinct
    assert (out.n_kept <= out.n_chunks).all()
    assert len(out) == docs.count()  # every doc survives


def test_repetition_flags_degenerate_docs(spark):
    """0/1-word documents must not crash the bigram branch (Spark's
    sequence(1, 0) is descending → element_at(w, 0) throws unguarded)
    and must report top_bigram_frac = 0 like the oracle's empty
    range(1, len(w))."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "two words")], ["doc_id", "text"]
    )
    out = (
        cur_op.repetition_flags(docs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "top_bigram_frac"] == 0.0  # '' → 1 empty word
    assert out.loc[2, "top_bigram_frac"] == 0.0
    assert out.loc[3, "top_bigram_frac"] == 1.0
    assert out.loc[3, "n_words"] == 2


def test_winnowing_window_coverage_guarantee(spark, sf_dir):
    """The defining winnowing property: every w-window of grams contains
    a selected fingerprint, so consecutive selections per doc are at
    most w apart (Schleimer et al. 2003, §2)."""
    docs = load(spark, "documents", sf_dir)
    out = cur_op.winnowing_fingerprints(docs).toPandas()
    for doc_id, grp in out.groupby("doc_id"):
        pos = sorted(grp.sel_pos)
        assert pos[0] < cur_op.WINNOW_W  # first window covered
        gaps = [b - a for a, b in zip(pos, pos[1:])]
        assert all(g <= cur_op.WINNOW_W for g in gaps), (doc_id, max(gaps))


def test_sequence_packing_is_exact_prefix_sum(spark, sf_dir):
    out = (
        cur_op.sequence_packing(load(spark, "documents", sf_dir))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = out.n_tokens.cumsum().shift(1, fill_value=0)
    assert (out.global_off == expect).all()
    assert (out.seq_off < cur_op.SEQ_BUDGET).all()
    assert (out.n_seqs_spanned >= 1).all()


def test_decontamination_bounds(spark, sf_dir):
    out = cur_op.eval_decontamination(load(spark, "documents", sf_dir)).toPandas()
    assert (out.containment > 0).all() and (out.containment <= 1.0).all()
    # eval docs never appear on the corpus side
    assert (out.doc_id % cur_op.EVAL_MODULUS != 0).all()
    assert (out.eval_doc_id % cur_op.EVAL_MODULUS == 0).all()


def test_keep_best_covers_every_cluster_once(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    clusters = dedup_op.near_dup_clusters(docs).toPandas()
    best = cur_op.keep_best_per_cluster(docs).toPandas()
    assert set(best.cluster_id) == set(clusters.cluster_id)
    assert best.cluster_id.is_unique
    # the kept doc really is the longest in its cluster
    n_chars = load(spark, "documents", sf_dir).select("doc_id", "n_chars").toPandas()
    merged = clusters.merge(n_chars, on="doc_id")
    mx = merged.groupby("cluster_id").n_chars.max()
    got = best.set_index("cluster_id").best_n_chars
    pd.testing.assert_series_equal(
        got.sort_index(), mx.sort_index(), check_names=False
    )
