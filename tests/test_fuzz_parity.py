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


from tests.conftest import fuzz_compare as _compare

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


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


# -------- registry-driven sweep over the wider LLM/dedup surface --------

LLM_QUERIES = [
    "exact_dedup_documents", "minhash_signatures",
    "minhash_lsh_near_dup_pairs", "simhash_fingerprints",
    "simhash_near_dup_pairs", "near_dup_clusters", "ngram_jaccard_pairs",
    "containment_dup_pairs", "cross_doc_dup_spans", "chunk_dedup_corpus",
    "dedup_keep_best_quality", "doc_fingerprints", "doc_token_quality",
    "lang_id_heuristic", "zipf_lexical_stats", "repetition_quality_flags",
    "unigram_logprob_quality", "bigram_surprisal_quality",
    "trigram_backoff_quality", "bpe_pair_merge_counts", "bpe_token_estimate",
    "oov_rate_scores", "ngram_novelty_scores", "tfidf_top_terms",
    "winnowing_fingerprints", "boilerplate_top_spans",
    "quality_classifier_scores", "quality_classifier_source_rollup",
    "pii_redaction_stats", "mixture_temperature_weights",
    "doc_token_quantiles_by_source", "dedup_storage_savings",
    "lsh_band_bucket_stats", "simhash_hamming_histogram",
    "dup_cluster_size_histogram", "embedding_cosine_topk",
    "embedding_dim_stats", "embedding_near_dup_pairs",
    "semantic_dedup_embeddings", "embedding_centroid_outliers",
    "embedding_pca_power_iteration", "lm_train_test_gap",
    "minhash_calibration_curve", "length_quality_correlation",
    # round-7 additions (documents/embeddings-only surface)
    "distinctive_ngrams_by_source", "length_outliers_mad",
    "simhash_bit_balance_report", "ngram_coverage_curve",
    "lexical_diversity_by_source", "winnowing_density_sweep",
    "template_cohort_quality", "token_length_histogram",
    "source_quality_drift", "embedding_norm_outliers",
    "contamination_run_diff", "cross_source_template_matrix",
    "stopword_profile_by_lang",
    # round-8 additions (documents/embeddings-only surface)
    "suffix_prefix_stitch_pairs", "knn_graph_degree_stats",
    "domain_balance_gini", "mixture_temperature_reweighting",
    "tokens_per_byte_by_source", "lsh_params_planner",
    "duplicate_text_cross_lang", "embedding_dim_stats",
    "char_trigram_entropy",
    # round-8 wave 2-4 additions
    "classifier_reliability_bins", "rag_context_packing",
    "filter_rule_ablation_matrix", "contrastive_triplet_mining",
    "label_centroid_similarity_matrix",
    # round-10 additions
    "paragraph_minhash_dedup",
    "dedup_rate_ingest_curve",
    "av_sync_drift_report",
    "embedding_sq8_error_by_label",
    "near_dup_chain_audit",
    "cross_source_fuzzy_matrix",
    "embedding_norm_ingest_drift",
    "pq_codebook_retrain_drift",
    "cross_modal_retrieval_eval",
    # round-9 additions
    "heldout_perplexity_topk",
    "heaps_law_vocab_growth",
    "multimodal_frame_dedup",
    "quality_vs_dedup_interaction",
    "ann_pq_appended_topk",
    # round-11 additions
    "corpus_rollup_source_lang",
    "ann_probe_at_flag_version",
]


@pytest.fixture(scope="module")
def fuzz_doc_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("fuzz_docs")
    pdf = _corpus(seed=11, n_docs=80)
    # widen the lang column so lang-keyed queries see variety
    rng = np.random.RandomState(17)
    pdf["lang"] = [["en", "fr", "de"][rng.randint(3)] for _ in range(len(pdf))]
    pdf.to_parquet(root / "documents.parquet", index=False)
    rng = np.random.RandomState(3)
    t = pa.table({
        "vec_id": pa.array(np.arange(120, dtype=np.int64)),
        "embedding": pa.array(
            [list(map(float, np.round(rng.randn(64), 4))) for _ in range(120)],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array((np.arange(120) % 5).astype(np.int32)),
    })
    pq.write_table(t, root / "embeddings.parquet")
    return str(root)


@pytest.mark.parametrize("name", LLM_QUERIES)
def test_fuzz_llm_surface_parity(spark, fuzz_doc_dir, name):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_doc_dir}/{t}.parquet'"
        )
    qd = Q.registry()[name]
    sdf = qd.fn(spark, fuzz_doc_dir).toPandas()
    odf = con.execute(qd.oracle).df()
    _compare(sdf, odf, name)
