"""Algorithmic invariants of the corpus-curation operators — properties
the SQL oracle can't express as equality (guarantees, bounds, coverage)."""

import pandas as pd
from pyspark.sql import functions as F

from codex_africanus_spark.operators import curation as cur_op
from codex_africanus_spark.operators import dedup as dedup_op
from codex_africanus_spark.sources.tables import load
import pytest


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


def test_cross_doc_dup_spans_hand_computed(spark):
    """Known-answer check: doc 1 and 2 share exactly their first 5-word
    span; doc 3 is unique; doc 4 is too short for any span."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e x y"),       # spans: abcde, bcdex, cdexy
            (2, "a b c d e p q"),       # spans: abcde, bcdep, cdepq
            (3, "u v w x y z"),         # spans: uvwxy, vwxyz (unique)
            (4, "too short"),           # no spans
        ],
        ["doc_id", "text"],
    )
    out = cur_op.cross_doc_dup_spans(docs).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_spans"] == 3 and out.loc[1, "n_dup_spans"] == 1
    assert out.loc[2, "n_spans"] == 3 and out.loc[2, "n_dup_spans"] == 1
    assert round(out.loc[1, "dup_span_frac"], 6) == round(1 / 3, 6)
    assert out.loc[3, "n_dup_spans"] == 0 and out.loc[3, "dup_span_frac"] == 0.0
    assert out.loc[4, "n_spans"] == 0 and out.loc[4, "dup_span_frac"] == 0.0
    # every document appears exactly once, spans or not
    assert sorted(out.index) == [1, 2, 3, 4]


def test_boilerplate_top_spans_counts_doc_frequency_not_instances(spark):
    """A span repeated many times INSIDE one doc must count once — the
    detector ranks by document frequency."""
    docs = spark.createDataFrame(
        [
            (1, "s p a m x " * 4),        # 'spamx' repeated within doc 1
            (2, "s p a m x only here"),
            (3, "n o i s e words here"),
        ],
        ["doc_id", "text"],
    )
    out = cur_op.boilerplate_top_spans(docs).toPandas()
    top = out.iloc[0]
    assert top["gram"] == "s p a m x"
    assert top["n_docs"] == 2  # docs 1 and 2, not 5 instances


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


@pytest.mark.slow
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


def test_cut_lineage_bounds_checkpoint_disk(spark, sf_dir, tmp_path):
    """Reliable-checkpoint mode (r5 advice): superseded propagation
    rounds must be deleted eagerly, leaving O(1) on-disk state (the
    converged labels) instead of O(iterations) after a clusters run."""
    import os

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    try:
        out = dedup_op.near_dup_clusters(load(spark, "documents", sf_dir))
        assert out.count() > 0
        root = dedup_op._CKPT_ROOT[spark.sparkContext.applicationId]
        base = root.replace("file:", "")
        live = [
            d for d in os.listdir(base)
            if os.listdir(os.path.join(base, d))
        ]
        assert len(live) <= 1, f"leaked checkpoint dirs: {live}"
    finally:
        dedup_op._CKPT_ROOT.clear()


def test_ngram_jaccard_stop_shingle_cap_bounds_fanout(spark):
    """One boilerplate trigram shared by ALL docs must not pair every
    probe with every doc: with the df cap the hot shingle is dropped
    from the universe, so only genuinely-similar pairs survive."""
    from codex_africanus_spark.operators import dedup as dd

    boiler = "click here to subscribe"
    rows = [
        # docs 0 and 53 are probes (doc_id % 53 == 0); doc 0 and 1 share
        # real content, every doc shares the boilerplate
        (0, "s", f"alpha beta gamma delta {boiler}"),
        (1, "s", f"alpha beta gamma delta {boiler}"),
    ] + [(i, "s", f"unique{i} filler{i} junk{i} noise{i} {boiler}") for i in range(2, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    capped = dd.ngram_jaccard_pairs(docs, df_max=10).collect()
    uncapped = dd.ngram_jaccard_pairs(docs, df_max=10**9).collect()
    # without the cap the hot shingle makes every doc a candidate of
    # probe 0 (39 join hits); with it, only the true near-dup survives
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(0, 1)}
    # the capped universe drops the boilerplate shingles from the sizes
    # too, so jaccard over the filtered universe is exact 1.0
    assert capped[0]["jaccard"] == 1.0
    assert len(uncapped) >= len(capped)
