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
