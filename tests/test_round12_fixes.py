"""Round-12 fixes.

1. prefix_filter_jaccard_join rebuild (the r11 verdict's one red): the
   broadcast/group-collapse path and the pre-r12 shuffle fallback must be
   result-identical, and the group collapse must stay exact on a
   duplication-dense corpus (the sf10 failure regime: many near-identical
   copies of each base doc) — checked against the all-pairs brute force.
"""

from pyspark.sql import functions as F

from codex_africanus_spark.operators import dedup as dedup_op
from codex_africanus_spark.sources.tables import load


def _brute_force(docs):
    """All-pairs exact jaccard >= 1/2 ground truth (no prefix filter)."""
    sh = dedup_op._shingle_frame(docs).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    return {
        (r.doc_a, r.doc_b): r.inter
        for r in (
            sh.alias("a")
            .join(
                sh.alias("b"),
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("inter"))
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("s").alias("sa")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"),
                               F.col("s").alias("sb")), "doc_b")
            .filter(F.col("inter") * 3 >= F.col("sa") + F.col("sb"))
            .collect()
        )
    }


def test_prefix_broadcast_and_fallback_paths_identical(spark, sf_dir):
    """The r12 broadcast/group-collapse path and the pre-r12 shuffle
    fallback (forced via broadcast_max_bytes=0) must emit byte-identical
    results on the real corpus."""
    docs = load(spark, "documents", sf_dir)
    new = [
        tuple(r)
        for r in dedup_op.prefix_filter_jaccard_join(docs)
        .orderBy("doc_a", "doc_b")
        .collect()
    ]
    old = [
        tuple(r)
        for r in dedup_op.prefix_filter_jaccard_join(docs, broadcast_max_bytes=0)
        .orderBy("doc_a", "doc_b")
        .collect()
    ]
    assert new == old
    assert len(new) > 0


def test_prefix_group_collapse_exact_on_duplication_dense_corpus(spark, sf_dir):
    """The sf10 failure regime in miniature: 12 perturbed copies of each
    base doc (copy k appends ' copyk' — the same perturbation the sf10
    generator uses, so cross-copy exact dups disappear but prefixes
    collapse). Group collapse must lose no pair and invent none vs the
    all-pairs brute force."""
    base = load(spark, "documents", sf_dir).limit(40)
    copies = spark.range(12).select(F.col("id").alias("k"))
    docs = (
        base.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") * 100 + F.col("k")).alias("doc_id"),
            F.when(F.col("k") == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(" copy"), F.col("k")))
            .alias("text"),
            "lang",
            "source",
            F.length(
                F.when(F.col("k") == 0, F.col("text"))
                .otherwise(F.concat("text", F.lit(" copy"), F.col("k")))
            ).alias("n_chars"),
        )
        .localCheckpoint(eager=True)
    )
    got = {
        (r.doc_a, r.doc_b): r.inter
        for r in dedup_op.prefix_filter_jaccard_join(docs).collect()
    }
    want = _brute_force(docs)
    assert got == want
    # the copies really are near-dups: every base doc contributes its
    # C(12,2) cross-copy pairs, so the pair space is duplication-quadratic
    assert len(got) >= 40 * (12 * 11) // 2


def test_prefix_within_group_pairs_still_verified(spark):
    """Identical prefixes do NOT imply jaccard >= 1/2: two docs sharing
    their rare-token prefix but with disjoint majority suffixes must be
    candidates (same group) yet fail the verify."""
    rare = "zqx1 zqx2 zqx3 zqx4"  # 2 shingles, globally unique -> prefix
    a = rare + " " + " ".join(f"aw{i}" for i in range(30))
    b = rare + " " + " ".join(f"bw{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = dedup_op.prefix_filter_jaccard_join(docs).collect()
    assert out == []  # candidates generated, verify rejects
    want = _brute_force(docs)
    assert want == {}
