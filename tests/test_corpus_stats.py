"""Zipf lexical stats: hand-checked regression + shape invariants."""

from __future__ import annotations

import math

from codex_africanus_spark.operators import corpus_stats as cs


def test_known_answer_slope(spark):
    """A corpus built to follow freq = 64 / rank exactly must fit a slope
    of -1 (up to the ln-quantization grid)."""
    words = []
    for rank in range(1, 9):
        words += [f"w{rank:02d}"] * (64 // rank)
    rows = [(1, " ".join(words), "en", "s0", len(" ".join(words)))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = cs.zipf_lexical_stats(df).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    # independent least-squares on the same quantized grid
    pts = [
        (
            round(math.log(rank) * 1e6),
            round(math.log(64 // rank) * 1e6),
        )
        for rank in range(1, 9)
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts); sxx = sum(p[0] * p[0] for p in pts)
    want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
    assert r.zipf_slope == want
    assert abs(r.zipf_slope + 1.0) < 0.02  # 64//rank truncation wiggle
    assert r.vocab_size == 8
    assert r.total_tokens == sum(64 // k for k in range(1, 9))


def test_shape_invariants(spark, sf_dir):
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cs.zipf_lexical_stats(doc).toPandas()
    assert (out.vocab_size <= out.total_tokens).all()
    assert out.ttr.between(0, 1).all()
    assert out.hapax_frac.between(0, 1).all()
    assert (out.zipf_slope < 0).all()  # frequency must decay with rank


def test_source_overlap_known_answer(spark):
    """Two sources sharing exactly one 3-gram out of 2 each -> J=1/3;
    a third disjoint source pairs at J=0 (or is absent entirely)."""
    rows = [
        (1, "a b c d", "s1", ""),   # shingles: abc, bcd
        (2, "b c d e", "s2", ""),   # shingles: bcd, cde
        (3, "x y z", "s3", ""),     # shingle: xyz (disjoint)
    ]
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s, _ in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = cs.source_overlap_matrix(df).toPandas().set_index(["source_a", "source_b"])
    assert out.loc[("s1", "s2")].n_common == 1
    assert out.loc[("s1", "s2")].jaccard == round(1 / 3, 9)
    # disjoint pairs produce no row (inner join) — absence is the assertion
    assert ("s1", "s3") not in out.index and ("s2", "s3") not in out.index


def test_source_overlap_bounds(spark, sf_dir):
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cs.source_overlap_matrix(doc).toPandas()
    assert (out.n_common <= out[["n_a", "n_b"]].min(axis=1)).all()
    assert out.jaccard.between(0, 1).all()
