"""Hashing-trick linear classifier: known-answer scoring, plan shape."""

from __future__ import annotations

import hashlib

import pandas as pd

from codex_africanus_spark.operators import classifier as clf
from codex_africanus_spark.functions.text import HASH_P
import pytest


def _py_score(text: str):
    """Independent reimplementation of the scoring contract."""
    toks = text.split(" ")
    raw = clf.BIAS
    for t in toks:
        h60 = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        raw += clf.WEIGHTS[(h60 % HASH_P) % clf.N_BUCKETS]
    logit = raw / (1000.0 * len(toks))
    return raw, round(0.5 + 0.5 * logit / (1.0 + abs(logit)), 9)


def test_known_answer_scoring(spark):
    rows = [(1, "the fast join"), (2, "sort merge sort merge sort"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clf.classify(df).orderBy("doc_id").toPandas()
    for _, r in out.iterrows():
        text = dict(rows)[r.doc_id]
        raw, score = _py_score(text)
        assert r.raw_score == raw, text
        assert r.quality_score == score, text
        assert r.keep == (1 if raw >= 0 else 0)
        assert r.n_tokens == len(text.split(" "))


def test_classifier_is_shuffle_free(spark, sf_dir):
    """The scoring tier must be a pure projection riding the scan —
    any Exchange in the plan means the hashing trick grew a shuffle."""
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = clf.classify(doc)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_rollup_conserves_documents(spark, sf_dir):
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    roll = clf.source_rollup(doc).toPandas()
    assert roll.n_docs.sum() == doc.count()
    assert (roll.n_keep <= roll.n_docs).all()
    assert roll.mean_quality.between(0, 1).all()


def test_weights_are_spread(spark):
    """Degenerate weight tables (all-same-sign) would make the decision
    column constant; the Knuth spread must produce both signs."""
    assert min(clf.WEIGHTS) < 0 < max(clf.WEIGHTS)
    assert len(set(w % clf.N_BUCKETS for w in range(clf.N_BUCKETS))) == clf.N_BUCKETS


@pytest.mark.slow
def test_scoring_portable_over_random_corpora(spark):
    """Property check: for randomized corpora (varied token shapes,
    unicode, repeats), the Spark pipeline must agree exactly with the
    independent Python scorer — one batched example, no per-doc jobs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x024F
        ),
        min_size=1,
        max_size=8,
    )
    doc = st.lists(token, min_size=1, max_size=30).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=40))
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = clf.classify(df).orderBy("doc_id").toPandas()
        for (i, t), (_, r) in zip(rows, out.iterrows()):
            raw, score = _py_score(t)
            assert r.raw_score == raw, repr(t)
            assert r.quality_score == score, repr(t)

    run()
