"""Cross-engine fuzz parity for the round-6 text operators.

The driver's fixed testdata cannot exercise data-dependent forks (the
self-review found several masked ones: short-doc descending sequences,
CAST-vs-ROUND, source/parity correlation). This suite generates small
adversarial corpora — empty docs, 1-2 token docs, heavy duplication,
single-char alphabets, skewed sources — registers them as the DuckDB
`documents` view, and asserts the Spark operator matches its oracle SQL
bit-exactly on every one. A fork class the fixed corpus masks fails
HERE first.
"""

import numpy as np
import pandas as pd
import pytest
import duckdb

from codex_africanus_spark import queries as Q
from codex_africanus_spark.operators import dedup as dedup_op
from codex_africanus_spark.operators import retrieval as retr_op
from codex_africanus_spark.operators import classifier as clf_op
from codex_africanus_spark.operators import tokenizer as tok_op

WORDS = ["spark", "query", "join", "merge", "vector", "row", "scan", "a",
         "the", "batch", "hash", "table"]


def _corpus(seed: int, n_docs: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_docs):
        kind = rng.randint(0, 6)
        if kind == 0:
            text = ""                                # empty
        elif kind == 1:
            text = WORDS[rng.randint(len(WORDS))]    # single token
        elif kind == 2:
            text = " ".join(WORDS[rng.randint(len(WORDS))] for _ in range(2))
        elif kind == 3:                              # exact duplicate pool
            text = "spark query join merge spark query join merge"
        elif kind == 4:                              # long, repetitive
            w = WORDS[rng.randint(len(WORDS))]
            text = " ".join([w] * rng.randint(5, 40))
        else:                                        # normal
            text = " ".join(
                WORDS[rng.randint(len(WORDS))] for _ in range(rng.randint(3, 30))
            )
        rows.append(
            (i, text, "en", f"src{i % max(2, rng.randint(2, 5))}", len(text))
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame, ctx: str):
    assert len(sdf) == len(odf), f"{ctx}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), ctx

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == bool:
                df[c] = df[c].astype("int64")
            if df[c].dtype.kind in "iu":
                df[c] = df[c].astype("int64")
            if df[c].dtype.kind == "f":
                df[c] = df[c].astype("float64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    left, right = norm(sdf), norm(odf)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=0, atol=0)
    for c in left.columns:
        if left[c].dtype.kind == "f":
            lv, rv = left[c].to_numpy(), right[c].to_numpy()
            both_nan = np.isnan(lv) & np.isnan(rv)
            bad = int(
                (lv.view(np.int64) != rv.view(np.int64))[~both_nan].sum()
            )
            assert bad == 0, f"{ctx}: {c} has {bad} bit-level float diffs"


CASES = [
    ("bm25_keyword_topk", lambda d: retr_op.bm25_topk(d), retr_op.BM25_SQL),
    ("pmi_collocations_topk",
     lambda d: retr_op.pmi_collocations(d, min_count=2, k=10),
     retr_op._pmi_sql(min_count=2, k=10)),
    ("char_trigram_entropy", lambda d: retr_op.char_trigram_entropy(d),
     retr_op.CHAR_TRIGRAM_ENTROPY_SQL),
    ("prefix_filter_jaccard_join",
     lambda d: dedup_op.prefix_filter_jaccard_join(d),
     dedup_op.PREFIX_JACCARD_SQL),
    ("dedup_storage_savings", lambda d: dedup_op.dedup_storage_savings(d),
     dedup_op.DEDUP_SAVINGS_SQL),
    ("lsh_band_bucket_stats", lambda d: dedup_op.lsh_band_bucket_stats(d),
     dedup_op.LSH_BAND_STATS_SQL),
    ("length_quality_correlation",
     lambda d: clf_op.length_quality_correlation(d),
     clf_op.LENGTH_QUALITY_CORR_SQL),
    ("lm_train_test_gap", lambda d: tok_op.lm_train_test_gap(d),
     tok_op.LM_TRAIN_TEST_GAP_SQL),
    ("minhash_calibration_curve",
     lambda d: dedup_op.minhash_calibration_curve(d),
     dedup_op.MINHASH_CALIBRATION_SQL),
]


@pytest.mark.parametrize("seed", [7, 23, 91])
@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_fuzz_corpus_parity(spark, seed, name, fn, sql):
    pdf = _corpus(seed, n_docs=60)
    sdocs = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)
    sdf = fn(sdocs).toPandas()
    odf = con.execute(sql).df()
    _compare(sdf, odf, f"{name} seed={seed}")
