"""Corpus-curation operators for 100 TB training-data pipelines.

Four additions to the dedup ladder in operators/dedup.py, each shaped for
a 1000-executor cluster:

1. **Chunk-level corpus dedup** (C4/RefinedWeb-style): split every document
   into fixed-size word chunks, drop every chunk whose exact content
   appeared earlier in the corpus (first occurrence by (doc_id, chunk_idx)
   wins), and reassemble the surviving text per document. One shuffle keyed
   by chunk digest (uniform — it's a hash), one shuffle back by doc_id.
2. **Repetition quality flags** (Gopher-style): per-document duplicate-word
   fraction, top-word fraction, and top-bigram fraction — the cheap
   "is this page boilerplate/spam" signals. Pure explode + two
   partial-aggregated shuffles at word/bigram cardinality.
3. **Keep-best-per-cluster**: the final step of near-dup dedup — from each
   MinHash-LSH connected component keep the single highest-quality member
   (longest text, ties to lowest doc_id). Reuses the cluster operator;
   adds one doc-cardinality argmax shuffle.
4. **Eval-set decontamination**: flag corpus documents that contain too
   much of any held-out eval document, by word-3-gram shingle containment.
   The eval side is tiny by construction → broadcast; the corpus side is
   one distinct-shingle aggregation. No O(n²) pair explosion.

All tiers are engine-portable integer/md5 expressions → every operator is
exactly DuckDB-oracle-checkable; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from codex_africanus_spark.functions.text import hash31, hash31_sql
from codex_africanus_spark.operators import dedup as dedup_op
from codex_africanus_spark.sources.tables import fan_out

CHUNK_WORDS = 10


# --------------------------------------------------------------------------
# 1. chunk-level exact dedup across the corpus
# --------------------------------------------------------------------------

def _chunk_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk): consecutive CHUNK_WORDS-word spans.
    The last chunk may be short. Note split('', ' ') is [''] in BOTH
    Spark and DuckDB, so a truly empty doc yields ONE empty chunk (and
    an empty doc whose text duplicates another's keeps 0 of 1 chunks) —
    engine-consistent, so oracle parity holds."""
    chunks = F.expr(
        f"transform(sequence(0, CAST(ceil(size(split(text, ' ')) / {CHUNK_WORDS}.0) "
        f"AS INT) - 1), i -> concat_ws(' ', slice(split(text, ' '), "
        f"i * {CHUNK_WORDS} + 1, {CHUNK_WORDS})))"
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


def chunk_dedup(docs: DataFrame) -> DataFrame:
    """C4-style chunk-level corpus dedup: per doc, the number of chunks
    kept/dropped and the md5 of the deduplicated reassembled text.

    First-occurrence-wins is a row_number over (chunk digest) ordered by
    (doc_id, chunk_idx): one shuffle keyed by the digest (uniform), then
    one shuffle by doc_id to reassemble — the same two-shuffle shape at
    any corpus size. All docs survive in the output (a fully-duplicated
    doc keeps 0 chunks and reassembles to the empty string).
    """
    ch = _chunk_frame(fan_out(docs))
    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy("doc_id", "chunk_idx")
    ranked = ch.withColumn("rn", F.row_number().over(w))
    kept = ranked.filter(F.col("rn") == 1)
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr("transform(array_sort(collect_list(struct(chunk_idx, chunk))), s -> s.chunk)"),
            )
        ).alias("dedup_digest"),
    )
    totals = ch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("dedup_digest"), F.md5(F.lit(""))).alias("dedup_digest"),
        )
    )


CHUNK_DEDUP_SQL = f"""
  WITH chunks AS (
    SELECT doc_id, i AS chunk_idx,
           array_to_string(w[i * {CHUNK_WORDS} + 1 : (i + 1) * {CHUNK_WORDS}], ' ') AS chunk
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         UNNEST(range(0, CAST(ceil(len(w) / {CHUNK_WORDS}.0) AS BIGINT))) AS t(i)
  ),
  ranked AS (
    SELECT *, row_number() OVER (PARTITION BY md5(chunk)
                                 ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks
  ),
  kept AS (
    SELECT doc_id, COUNT(*) AS n_kept,
           md5(string_agg(chunk, ' ' ORDER BY chunk_idx)) AS dedup_digest
    FROM ranked WHERE rn = 1 GROUP BY doc_id
  ),
  totals AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id)
  SELECT d.doc_id,
         COALESCE(t.n_chunks, 0) AS n_chunks,
         COALESCE(k.n_kept, 0) AS n_kept,
         COALESCE(k.dedup_digest, md5('')) AS dedup_digest
  FROM documents d
  LEFT JOIN totals t USING (doc_id)
  LEFT JOIN kept k USING (doc_id)
  ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# 2. Gopher-style repetition quality flags
# --------------------------------------------------------------------------

def repetition_flags(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals: duplicate-word fraction,
    top-word fraction, top-bigram fraction (each round 6).

    Two explode pipelines (words, adjacent bigrams), each one
    partial-aggregated groupBy at (doc, term) then (doc) cardinality —
    map-side combine keeps the shuffles at distinct-term size."""
    docs = fan_out(docs)
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    wstats = (
        words.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_unique"),
            F.max("c").alias("top_c"),
        )
    )
    # Guard the 0/1-word case: sequence(1, 0) is DESCENDING in Spark
    # (step -1 → [1, 0]) and element_at(w, 0) throws, where the oracle's
    # range(1, len(w)) is simply empty — gate the transform so both
    # engines yield no bigrams (explode drops the empty array).
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat_ws(' ', element_at(split(text, ' '), i), "
                "element_at(split(text, ' '), i + 1))) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("b"),
    )
    bstats = (
        bigrams.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bc"))
    )
    return (
        wstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round((F.col("n_words") - F.col("n_unique")) / F.col("n_words"), 6).alias(
                "dup_word_frac"
            ),
            F.round(F.col("top_c") / F.col("n_words"), 6).alias("top_word_frac"),
            F.round(
                F.coalesce(F.col("top_bc") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )


REPETITION_SQL = """
  WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
  ),
  wc AS (SELECT doc_id, t, COUNT(*) AS c FROM words GROUP BY doc_id, t),
  wstats AS (
    SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_unique, MAX(c) AS top_c
    FROM wc GROUP BY doc_id
  ),
  bigrams AS (
    SELECT doc_id, concat_ws(' ', w[i], w[i + 1]) AS b
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         UNNEST(range(1, len(w))) AS t(i)
  ),
  bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bigrams GROUP BY doc_id, b),
  bstats AS (
    SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bc FROM bc GROUP BY doc_id
  )
  SELECT w.doc_id,
         CAST(w.n_words AS BIGINT) AS n_words,
         round((w.n_words - w.n_unique) / CAST(w.n_words AS DOUBLE), 6) AS dup_word_frac,
         round(w.top_c / CAST(w.n_words AS DOUBLE), 6) AS top_word_frac,
         round(COALESCE(b.top_bc / CAST(b.n_bigrams AS DOUBLE), 0.0), 6) AS top_bigram_frac
  FROM wstats w LEFT JOIN bstats b USING (doc_id)
  ORDER BY w.doc_id
"""


# --------------------------------------------------------------------------
# 3. keep-best-per-cluster (near-dup dedup final step)
# --------------------------------------------------------------------------

def keep_best_per_cluster(docs: DataFrame) -> DataFrame:
    """From each MinHash-LSH near-dup cluster keep the best document
    (max n_chars, ties → min doc_id): (cluster_id, cluster_size,
    best_doc_id, best_n_chars, n_dropped).

    The cluster assignment is the iterative label-propagation operator
    (dedup.near_dup_clusters); the argmax is one groupBy at cluster
    cardinality via max(struct) — no window, no second pass."""
    clusters = dedup_op.near_dup_clusters(docs)
    joined = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    best = joined.groupBy("cluster_id").agg(
        F.max("cluster_size").alias("cluster_size"),
        F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))).alias("b"),
    )
    return best.select(
        "cluster_id",
        "cluster_size",
        (-F.col("b.neg_id")).alias("best_doc_id"),
        F.col("b.n_chars").alias("best_n_chars"),
        (F.col("cluster_size") - 1).alias("n_dropped"),
    )


# The cluster CTE chain is dedup.NEAR_DUP_CLUSTERS_SQL's recursive
# connected-components; strip its trailing SELECT and extend with the argmax.
KEEP_BEST_SQL = f"""
  WITH RECURSIVE {dedup_op._SHINGLE_CTE},
  sigs AS ({dedup_op._sig_select()}),
  banded AS ({dedup_op._BAND_UNION}),
  pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  ),
  edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION SELECT doc_b, doc_a FROM pairs
  ),
  reach(doc, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT rr.doc, e.d FROM reach rr JOIN edges e ON e.s = rr.r
  ),
  cc AS (SELECT doc AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc),
  sized AS (
    SELECT c.doc_id, c.cluster_id, s.cluster_size, d.n_chars
    FROM cc c
    JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id) s
      USING (cluster_id)
    JOIN documents d USING (doc_id)
  )
  SELECT cluster_id, cluster_size,
         doc_id AS best_doc_id, n_chars AS best_n_chars,
         cluster_size - 1 AS n_dropped
  FROM sized
  QUALIFY row_number() OVER (PARTITION BY cluster_id
                             ORDER BY n_chars DESC, doc_id) = 1
  ORDER BY cluster_id
"""


# --------------------------------------------------------------------------
# 4. eval-set decontamination by shingle containment
# --------------------------------------------------------------------------

EVAL_MODULUS = 50  # doc_id % 50 == 0 plays the held-out eval set
CONTAIN_TAU = 0.05


def eval_decontamination(docs: DataFrame) -> DataFrame:
    """Flag (corpus doc, eval doc) pairs whose word-3-gram shingle
    containment |sh(doc) ∩ sh(eval)| / |sh(doc)| ≥ τ — the standard
    test-set-decontamination sweep before training.

    The eval set (here doc_id % {EVAL_MODULUS} == 0) is tiny relative to
    the corpus → its distinct-shingle frame broadcasts; the corpus side
    is one distinct + one broadcast-join + one (doc, eval_doc) count —
    no pairwise corpus×corpus work at any scale."""
    sh = (
        fan_out(docs).filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 2), "
                    "j -> concat_ws(' ', slice(split(text, ' '), j, 3)))"
                )
            ).alias("sh"),
        )
        .select("doc_id", hash31(F.col("sh")).alias("h"))
        .distinct()
    )
    ev = (
        sh.filter(F.col("doc_id") % EVAL_MODULUS == 0)
        .select(F.col("doc_id").alias("eval_doc_id"), "h")
    )
    corpus = sh.filter(F.col("doc_id") % EVAL_MODULUS != 0)
    doc_sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    overlap = (
        corpus.join(F.broadcast(ev), "h")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        overlap.join(doc_sizes, "doc_id")
        .withColumn("containment", F.round(F.col("n_overlap") / F.col("n_sh"), 6))
        .filter(F.col("containment") >= CONTAIN_TAU)
        .select("doc_id", "eval_doc_id", "n_overlap", "containment")
    )


DECONTAM_SQL = f"""
  WITH sh AS (
    SELECT DISTINCT doc_id, {hash31_sql('sh')} AS h
    FROM (
      SELECT doc_id,
             unnest([concat_ws(' ', w[j], w[j+1], w[j+2])
                     for j in generate_series(1, len(w) - 2)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= 3)
    )
  ),
  ev AS (SELECT doc_id AS eval_doc_id, h FROM sh WHERE doc_id % {EVAL_MODULUS} = 0),
  corpus AS (SELECT * FROM sh WHERE doc_id % {EVAL_MODULUS} != 0),
  sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM corpus GROUP BY doc_id),
  overlap AS (
    SELECT c.doc_id, e.eval_doc_id, COUNT(*) AS n_overlap
    FROM corpus c JOIN ev e USING (h)
    GROUP BY c.doc_id, e.eval_doc_id
  )
  SELECT o.doc_id, o.eval_doc_id, o.n_overlap,
         round(o.n_overlap / CAST(s.n_sh AS DOUBLE), 6) AS containment
  FROM overlap o JOIN sizes s USING (doc_id)
  WHERE round(o.n_overlap / CAST(s.n_sh AS DOUBLE), 6) >= {CONTAIN_TAU}
  ORDER BY o.doc_id, o.eval_doc_id
"""


CONTAM_NGRAM = 3  # shingle width for the positional-overlap tier
CONTAM_MIN_RUN = 3  # >=3 consecutive trigrams = >=5 shared consecutive words
CONTAM_DF_MAX = 64  # boilerplate guard: shingles in more docs are dropped


def contamination_span_report(docs: DataFrame) -> DataFrame:
    """Longest VERBATIM shared span between each corpus doc and each
    eval doc — the suffix-array-style contamination check that catches
    what set-containment (eval_decontamination) cannot: a doc quoting a
    50-word eval passage once has low shingle containment but an
    unmistakable contiguous run.

    Relational suffix-matching: positional trigram shingles on both
    sides; matches on a (corpus_doc, eval_doc) pair at positions
    (pc, pe) lie on diagonal d = pc − pe, and CONSECUTIVE matches along
    a diagonal are exactly the verbatim runs — recovered with the
    islands trick (pc − row_number() per (pair, d) group is constant
    within a run). Reported span length in words = run + NGRAM − 1.

    100 TB shape: the eval side here is a fixed 1/EVAL_MODULUS slice of
    the corpus — corpus-PROPORTIONAL, so it must NOT be broadcast (a
    hint would OOM the driver at scale); the match is a plain h-equi
    join and AQE picks broadcast only when the eval side is actually
    small (a real held-out set would be). A global df-cap
    (CONTAM_DF_MAX, computed with one partial-agg pass) drops
    boilerplate shingles so one hot trigram cannot fan every corpus doc
    into every eval doc — the same guard as the n-gram Jaccard tier's
    stop-shingle cap. The run window runs at matched-pair cardinality
    (post-join, post-cap), partitioned by (doc, eval_doc, d) — bounded
    groups, no corpus-wide sort."""
    toks = fan_out(docs).filter(
        F.size(F.split(F.col("text"), " ")) >= CONTAM_NGRAM
    )
    sh = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')) - {CONTAM_NGRAM - 1}), "
                f"j -> concat_ws(' ', slice(split(text, ' '), j, {CONTAM_NGRAM})))"
            )
        ).alias("pos", "gram"),
    ).select("doc_id", "pos", hash31(F.col("gram")).alias("h"))
    df_cap = (
        sh.select("doc_id", "h").distinct()
        .groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") <= CONTAM_DF_MAX)
        .select("h")
    )
    sh = sh.join(df_cap, "h")
    ev = sh.filter(F.col("doc_id") % EVAL_MODULUS == 0).select(
        F.col("doc_id").alias("eval_doc_id"), F.col("pos").alias("pe"), "h"
    )
    corpus = sh.filter(F.col("doc_id") % EVAL_MODULUS != 0)
    m = corpus.join(ev, "h").select(
        "doc_id", "eval_doc_id",
        F.col("pos").alias("pc"),
        (F.col("pos") - F.col("pe")).alias("d"),
    )
    w = Window.partitionBy("doc_id", "eval_doc_id", "d").orderBy("pc")
    runs = (
        m.withColumn("island", F.col("pc") - F.row_number().over(w))
        .groupBy("doc_id", "eval_doc_id", "d", "island")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    return (
        runs.groupBy("doc_id", "eval_doc_id")
        .agg(
            F.max("run").alias("max_run"),
            F.count(F.lit(1)).alias("n_runs"),
        )
        .filter(F.col("max_run") >= CONTAM_MIN_RUN)
        .select(
            "doc_id", "eval_doc_id", "max_run",
            (F.col("max_run") + F.lit(CONTAM_NGRAM - 1)).alias("span_words"),
            "n_runs",
        )
    )


def contamination_span_sql(where: str = "TRUE") -> str:
    """Parameterized twin of contamination_span_report: `where` is a
    predicate over `documents` (doc_id, text, n_chars, ...) selecting
    the corpus revision — the shared-SQL-text rule (one definition,
    the diff query composes two revisions of it)."""
    return f"""
  WITH sh0 AS (
    SELECT doc_id, j AS pos, {hash31_sql("concat_ws(' ', w[j], w[j+1], w[j+2])")} AS h
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE ({where}) AND len(string_split(text, ' ')) >= {CONTAM_NGRAM}),
         UNNEST(range(1, len(w) - {CONTAM_NGRAM - 2})) AS t(j)
  ),
  keep AS (
    SELECT h FROM (SELECT DISTINCT doc_id, h FROM sh0)
    GROUP BY h HAVING COUNT(*) <= {CONTAM_DF_MAX}
  ),
  sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (h)),
  ev AS (SELECT doc_id AS eval_doc_id, pos AS pe, h FROM sh
         WHERE doc_id % {EVAL_MODULUS} = 0),
  corpus AS (SELECT * FROM sh WHERE doc_id % {EVAL_MODULUS} != 0),
  m AS (
    SELECT c.doc_id, e.eval_doc_id, c.pos AS pc, c.pos - e.pe AS d
    FROM corpus c JOIN ev e USING (h)
  ),
  runs AS (
    SELECT doc_id, eval_doc_id, d, island, COUNT(*) AS run
    FROM (
      SELECT doc_id, eval_doc_id, d, pc,
             pc - row_number() OVER (
               PARTITION BY doc_id, eval_doc_id, d ORDER BY pc) AS island
      FROM m
    ) GROUP BY doc_id, eval_doc_id, d, island
  )
  SELECT doc_id, eval_doc_id, MAX(run) AS max_run,
         MAX(run) + {CONTAM_NGRAM - 1} AS span_words,
         COUNT(*) AS n_runs
  FROM runs GROUP BY doc_id, eval_doc_id
  HAVING MAX(run) >= {CONTAM_MIN_RUN}
  ORDER BY doc_id, eval_doc_id
"""


CONTAM_SPAN_SQL = contamination_span_sql()


# --------------------------------------------------------------------------
# 5. TF-IDF top terms per document
# --------------------------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_top_terms(docs: DataFrame) -> DataFrame:
    """Top-k TF-IDF terms per document (score = tf · ln(N/df), ties → term
    asc): the classic keyword-extraction / feature-weighting primitive.

    Shuffle shape: (doc, term) count agg, term-level df agg (vocab-sized →
    broadcast back), then one window at doc cardinality for the top-k.
    The corpus-size scalar N rides a 1-row broadcast cross join."""
    docs = fan_out(docs)
    tf = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "t")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("t"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= TFIDF_TOP_K)
        .select("doc_id", "term_rank", F.col("t").alias("term"), "tfidf")
    )


TFIDF_SQL = f"""
  WITH tf AS (
    SELECT doc_id, t, COUNT(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
    GROUP BY doc_id, t
  ),
  df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
  n AS (SELECT COUNT(*) AS n_docs FROM documents),
  scored AS (
    SELECT tf.doc_id, tf.t,
           round(tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6) AS tfidf
    FROM tf JOIN df USING (t), n
  ),
  ranked AS (
    SELECT doc_id, t, tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, t) AS term_rank
    FROM scored
  )
  SELECT doc_id, term_rank, t AS term, tfidf
  FROM ranked WHERE term_rank <= {TFIDF_TOP_K}
  ORDER BY doc_id, term_rank
"""


# --------------------------------------------------------------------------
# 6. winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — MOSS)
# --------------------------------------------------------------------------

WINNOW_W = 4  # window of word-3-gram hashes; guarantee: any match of
              # length ≥ w+2 words shares a selected fingerprint

# Position field width for the packed (hash, reversed-pos) key:
# key = hash31·2^32 + (2^32-1-pos). hash31 ≤ 2^31-2, so key ≤ 2^63-2^32-1
# stays inside signed BIGINT, and the cap of 2^32 shingle positions per
# document (~4 billion words) exceeds any real document.
_POS_BITS = 32


def winnowing_fingerprints(docs: DataFrame, w_win: int = WINNOW_W) -> DataFrame:
    """Winnowing document fingerprints: per window of w consecutive
    word-3-gram hashes select the RIGHTMOST minimal hash; the distinct
    selected (position, hash) set is the document's fingerprint sketch.

    The rightmost-min tie rule packs (hash, reversed position) into one
    BIGINT so the selection is a plain min() over a ROWS window — no
    struct ordering needed, portable to the SQL oracle verbatim. One
    window pass per document partition, then a distinct at sketch
    cardinality (~n/w per doc)."""
    sh = fan_out(docs).filter(F.size(F.split(F.col("text"), " ")) >= 3).select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 2), "
                "j -> concat_ws(' ', slice(split(text, ' '), j, 3)))"
            )
        ).alias("pos", "sh"),
    )
    keyed = sh.select(
        "doc_id",
        "pos",
        (
            hash31(F.col("sh")) * F.lit(1 << _POS_BITS)
            + (F.lit((1 << _POS_BITS) - 1) - F.col("pos"))
        ).alias("key"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n_sh"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w_win - 1)
    )
    wins = keyed.withColumn("wmin", F.min("key").over(w)).filter(
        F.col("pos") <= F.col("n_sh") - w_win  # full windows only
    )
    return (
        wins.select(
            "doc_id",
            (F.lit((1 << _POS_BITS) - 1) - F.col("wmin") % F.lit(1 << _POS_BITS)).alias(
                "sel_pos"
            ),
            F.expr(f"wmin DIV {1 << _POS_BITS}").alias("sel_hash"),
        )
        .distinct()
    )


def winnowing_sql(w_win: int = WINNOW_W) -> str:
    """Parameterized SQL twin of winnowing_fingerprints (one text,
    shared by the fixed-w query and the density sweep)."""
    return f"""
  WITH sh AS (
    SELECT doc_id, j - 1 AS pos,
           concat_ws(' ', w[j], w[j+1], w[j+2]) AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
         UNNEST(range(1, len(w) - 1)) AS t(j)
  ),
  keyed AS (
    SELECT doc_id, pos,
           {hash31_sql('gram')} * {1 << _POS_BITS}
             + ({(1 << _POS_BITS) - 1} - pos) AS key,
           COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
    FROM sh
  ),
  wins AS (
    SELECT doc_id,
           min(key) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {w_win - 1} FOLLOWING) AS wmin
    FROM keyed
    QUALIFY pos <= n_sh - {w_win}
  )
  SELECT DISTINCT doc_id,
         {(1 << _POS_BITS) - 1} - (wmin % {1 << _POS_BITS}) AS sel_pos,
         wmin // {1 << _POS_BITS} AS sel_hash
  FROM wins
  ORDER BY doc_id, sel_pos
"""


WINNOWING_SQL = winnowing_sql()


# --------------------------------------------------------------------------
# 7. unigram log-probability quality (CCNet-style LM filter, self-trained)
# --------------------------------------------------------------------------

def unigram_logprob_quality(docs: DataFrame) -> DataFrame:
    """Per-document mean token surprisal −log₂ p(t) under the corpus's own
    unigram model — the CCNet/perplexity-bucket quality filter with the
    LM degenerate to unigrams so the whole pipeline stays in SQL. Low
    score ⇒ common boilerplate tokens; high ⇒ rare-token noise.

    Each surprisal term is fixed-point-quantized (1e-9) before summing so
    the per-doc mean is partition-order-independent and exactly
    oracle-checkable. The unigram table is vocab-sized → broadcast; the
    corpus-total N rides a 1-row cross join."""
    docs = fan_out(docs)
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    vocab = words.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n_total"))
    surprisal_q = F.round(
        (F.log2(F.col("n_total")) - F.log2(F.col("c"))) * 1e9
    ).cast("long")
    return (
        words.join(F.broadcast(vocab), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(surprisal_q) / 1e9 / F.count(F.lit(1)), 6).alias(
                "mean_surprisal_bits"
            ),
        )
    )


UNIGRAM_LOGPROB_SQL = """
  WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
  ),
  vocab AS (SELECT t, COUNT(*) AS c FROM words GROUP BY t),
  total AS (SELECT SUM(c) AS n_total FROM vocab)
  SELECT w.doc_id,
         COUNT(*) AS n_tokens,
         round(SUM(CAST(ROUND((log2(tt.n_total) - log2(v.c)) * 1e9) AS BIGINT))
               / 1e9 / COUNT(*), 6) AS mean_surprisal_bits
  FROM words w JOIN vocab v USING (t), total tt
  GROUP BY w.doc_id
  ORDER BY w.doc_id
"""


# --------------------------------------------------------------------------
# 8. sequence packing (concat-and-chunk into fixed token budgets)
# --------------------------------------------------------------------------

SEQ_BUDGET = 512    # tokens per packed training sequence
PREFIX_BUCKET = 64  # docs per prefix-sum bucket (two-phase scan)


def sequence_packing(docs: DataFrame) -> DataFrame:
    """Pack the corpus (in doc_id order) into fixed-budget training
    sequences — the concat-and-chunk step of an LLM data pipeline. Each
    doc gets its global token offset, its starting sequence id, its
    offset within that sequence, and how many sequences it spans.

    The global prefix sum is the scale trap here: a naive
    `sum().over(Window.orderBy(...))` collapses to ONE task. This uses
    the textbook two-phase scan instead — per-bucket local cumsums run
    in parallel (window partitioned by bucket), bucket totals form a
    tiny frame whose own prefix sum is cheap, and the broadcast join of
    bucket offsets restores the global scan. Identical values to the
    single-window form, cluster-parallel execution."""
    toks = fan_out(docs).select(
        "doc_id",
        (F.col("doc_id") / F.lit(PREFIX_BUCKET)).cast("long").alias("bucket"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    wloc = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn(
        "local_off", F.coalesce(F.sum("n_tokens").over(wloc), F.lit(0))
    )
    btot = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.withColumn(
        "bucket_off", F.coalesce(F.sum("btok").over(wb), F.lit(0))
    ).select("bucket", "bucket_off")
    packed = local.join(F.broadcast(boff), "bucket").select(
        "doc_id",
        "n_tokens",
        (F.col("bucket_off") + F.col("local_off")).alias("global_off"),
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "global_off",
        F.expr(f"global_off DIV {SEQ_BUDGET}").alias("seq_id"),
        (F.col("global_off") % SEQ_BUDGET).alias("seq_off"),
        (
            F.expr(f"(global_off + n_tokens - 1) DIV {SEQ_BUDGET}")
            - F.expr(f"global_off DIV {SEQ_BUDGET}")
            + F.lit(1)
        ).alias("n_seqs_spanned"),
    )


SEQUENCE_PACKING_SQL = f"""
  WITH toks AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
  ),
  packed AS (
    SELECT doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS global_off
    FROM toks
  )
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(global_off AS BIGINT) AS global_off,
         CAST(global_off // {SEQ_BUDGET} AS BIGINT) AS seq_id,
         CAST(global_off % {SEQ_BUDGET} AS BIGINT) AS seq_off,
         CAST((global_off + n_tokens - 1) // {SEQ_BUDGET}
              - global_off // {SEQ_BUDGET} + 1 AS BIGINT) AS n_seqs_spanned
  FROM packed ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# 9. cross-document duplicated-span fraction (Lee et al. 2021,
#    "Deduplicating Training Data Makes Language Models Better")
# --------------------------------------------------------------------------

SPAN_WORDS = 5  # word-5-gram spans — the substring-dedup granularity


def cross_doc_dup_spans(docs: DataFrame) -> DataFrame:
    """Per-document fraction of word-5-gram spans that also occur in at
    least one OTHER document — the substring-level duplication signal
    used to drive exact-substring dedup at corpus scale.

    Shuffle structure (the 100 TB shape): (1) distinct (doc, span-hash)
    pairs — one shuffle at pair cardinality, uniform keys (md5); (2)
    span document-frequency = count over the pair frame — partial-agg,
    immune to hot boilerplate spans because the per-doc distinct already
    collapsed within-doc repeats; (3) co-keyed equi-join of the span
    instances back onto the df table (both sides hash-partitioned on the
    span hash → ReuseExchange); (4) per-doc conditional count. No
    self-join of the corpus, no window.

    Docs shorter than SPAN_WORDS words emit zero spans and report
    dup_frac = 0 via the left join (the 0/1-word guard discipline of
    repetition_flags)."""
    docs = fan_out(docs)
    spans = docs.filter(
        F.size(F.split(F.col("text"), " ")) >= SPAN_WORDS
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')) - {SPAN_WORDS - 1}), "
                f"j -> concat_ws(' ', slice(split(text, ' '), j, {SPAN_WORDS})))"
            )
        ).alias("gram"),
    ).select("doc_id", hash31(F.col("gram")).alias("h"))
    df_per_span = (
        spans.select("doc_id", "h").distinct()
        .groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    )
    per_doc = (
        spans.join(df_per_span, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count(F.when(F.col("nd") > 1, F.lit(1))).alias("n_dup_spans"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.round(
            F.coalesce(F.col("n_dup_spans") / F.col("n_spans"), F.lit(0.0)), 6
        ).alias("dup_span_frac"),
    )


CROSS_DOC_DUP_SQL = f"""
  WITH spans AS (
    SELECT doc_id, {hash31_sql("concat_ws(' ', w[j], w[j+1], w[j+2], w[j+3], w[j+4])")} AS h
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= {SPAN_WORDS}),
         UNNEST(range(1, len(w) - {SPAN_WORDS - 2})) AS t(j)
  ),
  df_per_span AS (
    SELECT h, COUNT(*) AS nd FROM (SELECT DISTINCT doc_id, h FROM spans) GROUP BY h
  ),
  per_doc AS (
    SELECT s.doc_id, COUNT(*) AS n_spans,
           COUNT(*) FILTER (WHERE f.nd > 1) AS n_dup_spans
    FROM spans s JOIN df_per_span f USING (h)
    GROUP BY s.doc_id
  )
  SELECT d.doc_id,
         COALESCE(p.n_spans, 0) AS n_spans,
         COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
         round(COALESCE(p.n_dup_spans / CAST(p.n_spans AS DOUBLE), 0.0), 6) AS dup_span_frac
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
  ORDER BY d.doc_id
"""


BOILERPLATE_TOP_K = 20


def boilerplate_top_spans(docs: DataFrame) -> DataFrame:
    """Top-K most widespread word-5-gram spans across the corpus (by
    document frequency, ties → span text asc) — the boilerplate /
    template detector that feeds stop-span lists for substring dedup.

    Grouping is by span TEXT (not hash) so the output is directly
    actionable; keys are long strings but the aggregation is still
    partial (map-side combine ships (span, count) pairs), and the final
    top-K is a K-row total order — sorting 20 rows, not the corpus."""
    docs = fan_out(docs)
    spans = docs.filter(
        F.size(F.split(F.col("text"), " ")) >= SPAN_WORDS
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')) - {SPAN_WORDS - 1}), "
                f"j -> concat_ws(' ', slice(split(text, ' '), j, {SPAN_WORDS})))"
            )
        ).alias("gram"),
    )
    df_counts = (
        spans.select("doc_id", "gram").distinct()
        .groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("gram"))
    return (
        df_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BOILERPLATE_TOP_K)
        .select("rank", "gram", "n_docs")
    )


BOILERPLATE_TOP_SQL = f"""
  WITH spans AS (
    SELECT DISTINCT doc_id, concat_ws(' ', w[j], w[j+1], w[j+2], w[j+3], w[j+4]) AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= {SPAN_WORDS}),
         UNNEST(range(1, len(w) - {SPAN_WORDS - 2})) AS t(j)
  ),
  counts AS (SELECT gram, COUNT(*) AS n_docs FROM spans GROUP BY gram),
  ranked AS (
    SELECT gram, n_docs,
           row_number() OVER (ORDER BY n_docs DESC, gram) AS rank
    FROM counts
  )
  SELECT rank, gram, n_docs FROM ranked WHERE rank <= {BOILERPLATE_TOP_K}
  ORDER BY rank
"""


# --------------------------------------------------------------------------
# 8. PII-shape token redaction (structural scrubbing pass)
# --------------------------------------------------------------------------

PII_MIN_DIGITS = 7  # all-digit runs this long are phone/account-shaped
REDACTED = "<REDACTED>"


def pii_redaction_stats(docs: DataFrame) -> DataFrame:
    """Structural PII scrub: replace email-shaped tokens (containing '@')
    and long all-digit tokens (≥ 7 digits — phone/account numbers) with a
    redaction marker; emit per-doc counts and the digest of the redacted
    text. The downstream corpus consumes the digest/text, the counts
    feed the compliance dashboard.

    Pure projection — the transform/filter array HOFs ride the scan with
    zero shuffles at any corpus size. Detection is deliberately
    engine-portable (contains + translate-empties arithmetic, no regex:
    regex dialects differ between engines and 100 TB scans want codegen,
    not an NFA per token). The synthetic testdata contains no PII-shaped
    tokens, so the driver row checks the plumbing at zero redactions;
    the toy-data unit tests pin the actual redaction behavior."""
    w = "split(text, ' ')"
    return fan_out(docs).select(
        "doc_id",
        F.expr(f"size({w})").alias("n_tokens"),
        F.expr(f"size(filter({w}, t -> {_pii_cond('t')}))").alias("n_redacted"),
        F.expr(
            f"md5(concat_ws(' ', transform({w}, t -> "
            f"CASE WHEN {_pii_cond('t')} THEN '{REDACTED}' ELSE t END)))"
        ).alias("redacted_digest"),
    )


def _pii_cond(tok: str) -> str:
    """The ONE place the PII-shape predicate lives (both engines: Spark
    `length`/DuckDB `len` — use the shared `length`, valid in both)."""
    return (
        f"contains({tok}, '@') OR (translate({tok}, '0123456789', '') = '' "
        f"AND length({tok}) >= {PII_MIN_DIGITS})"
    )


PII_REDACTION_SQL = f"""
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '), t -> {_pii_cond('t')}))
           AS n_redacted,
         md5(array_to_string(list_transform(string_split(text, ' '),
             t -> CASE WHEN {_pii_cond('t')} THEN '{REDACTED}' ELSE t END), ' '))
           AS redacted_digest
  FROM documents
  ORDER BY doc_id
"""


SLIDE_W = 32   # window length in tokens
SLIDE_S = 24   # stride (overlap = W - S = 8 tokens)


def sliding_window_chunks(docs: DataFrame) -> DataFrame:
    """Overlapping sliding-window chunker — the RAG/context-window
    chunking form (stride < window so consecutive chunks share W−S
    tokens), vs the disjoint C4 chunks of `_chunk_frame`. Per doc:
    chunk_idx, the token span [start, end], token count and digest of
    each chunk. The last window clamps to the document end; documents
    shorter than one window yield a single clamped chunk.

    Pure array-HOF projection (zero shuffle at any corpus size):
    n_chunks = 1 + max(0, ceil((n−W)/S)) materialized with integer
    arithmetic identically in both engines."""
    toks = "split(text, ' ')"
    n = f"size({toks})"
    n_extra = f"greatest(0, CAST(ceil(({n} - {SLIDE_W}) / {SLIDE_S}.0) AS INT))"
    chunk_struct = (
        f"transform(sequence(0, {n_extra}), i -> struct("
        f"i AS chunk_idx, "
        f"i * {SLIDE_S} + 1 AS tok_start, "
        f"least(i * {SLIDE_S} + {SLIDE_W}, {n}) AS tok_end, "
        f"concat_ws(' ', slice({toks}, i * {SLIDE_S} + 1, {SLIDE_W})) AS chunk))"
    )
    return (
        fan_out(docs)
        .select("doc_id", F.explode(F.expr(chunk_struct)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.tok_start").cast("int").alias("tok_start"),
            F.col("c.tok_end").cast("int").alias("tok_end"),
            (F.col("c.tok_end") - F.col("c.tok_start") + 1)
            .cast("int")
            .alias("n_tokens"),
            F.md5(F.col("c.chunk")).alias("chunk_digest"),
        )
    )


SLIDING_CHUNKS_SQL = f"""
  WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
  ),
  expanded AS (
    SELECT doc_id,
           unnest(generate_series(0,
             GREATEST(0, CAST(ceil((len(w) - {SLIDE_W}) / {SLIDE_S}.0) AS INT))))
             AS chunk_idx,
           w
    FROM d
  )
  SELECT doc_id,
         CAST(chunk_idx AS INT) AS chunk_idx,
         CAST(chunk_idx * {SLIDE_S} + 1 AS INT) AS tok_start,
         CAST(LEAST(chunk_idx * {SLIDE_S} + {SLIDE_W}, len(w)) AS INT) AS tok_end,
         CAST(LEAST(chunk_idx * {SLIDE_S} + {SLIDE_W}, len(w))
              - (chunk_idx * {SLIDE_S} + 1) + 1 AS INT) AS n_tokens,
         md5(array_to_string(w[(chunk_idx * {SLIDE_S} + 1):
                               (chunk_idx * {SLIDE_S} + {SLIDE_W})], ' '))
           AS chunk_digest
  FROM expanded
  ORDER BY doc_id, chunk_idx
"""


NOVELTY_NGRAM = 4


def ngram_novelty_scores(docs: DataFrame) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word-4-grams it introduces to the corpus (its doc_id is the global
    minimum over holders of that gram) — the "new content vs recycled
    content" curation signal ordering a crawl by contribution.

    Two partial-agg shuffles at gram cardinality (distinct pairs, then
    min-holder per gram) and one co-keyed join back — the
    cross_doc_dup_spans shuffle shape; no self-join, no window."""
    grams = (
        fan_out(docs).filter(
            F.size(F.split(F.col("text"), " ")) >= NOVELTY_NGRAM
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(split(text, ' ')) - {NOVELTY_NGRAM - 1}), "
                    f"j -> concat_ws(' ', slice(split(text, ' '), j, {NOVELTY_NGRAM})))"
                )
            ).alias("gram"),
        )
        .select("doc_id", hash31(F.col("gram")).alias("h"))
        .distinct()
    )
    first = grams.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id", "n_grams", "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty_frac"),
        )
    )


NOVELTY_SQL = f"""
  WITH grams AS (
    SELECT DISTINCT doc_id,
           {hash31_sql("concat_ws(' ', w[j], w[j+1], w[j+2], w[j+3])")} AS h
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= {NOVELTY_NGRAM}),
         UNNEST(range(1, len(w) - {NOVELTY_NGRAM - 2})) AS t(j)
  ),
  first AS (SELECT h, MIN(doc_id) AS first_doc FROM grams GROUP BY h)
  SELECT g.doc_id, COUNT(*) AS n_grams,
         CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
         round(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_frac
  FROM grams g JOIN first f USING (h)
  GROUP BY g.doc_id ORDER BY g.doc_id
"""


OOV_VOCAB_N = 512


def oov_rate_scores(docs: DataFrame) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-N word vocabulary (frequency-ranked, ties to the lexically
    smaller word — fully deterministic): the tokenizer-coverage signal
    that flags documents a fixed vocab would shred into unknowns.

    The vocabulary is one word-cardinality aggregate cut to N rows by a
    TakeOrdered (per-partition heap, no global sort) and BROADCAST back
    into the token stream — at 100 TB the vocab is still N rows."""
    words = fan_out(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    vocab = (
        words.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "t")
        .limit(OOV_VOCAB_N)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .select(
            "doc_id", "n_tokens", "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


OOV_SQL = f"""
  WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
  ),
  vocab AS (
    SELECT t FROM (SELECT t, COUNT(*) AS c FROM words GROUP BY t)
    ORDER BY c DESC, t LIMIT {OOV_VOCAB_N}
  )
  SELECT w.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         round(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
  FROM words w LEFT JOIN vocab v USING (t)
  GROUP BY w.doc_id ORDER BY w.doc_id
"""


# --------------------------------------------------------------------------
# Cross-run contamination diff: what a re-curation did to the span report
# --------------------------------------------------------------------------

DIFF_MIN_CHARS = 300  # run-B corpus gate (eval stratum always kept)


def contamination_run_diff(docs: DataFrame, min_chars: int = DIFF_MIN_CHARS) -> DataFrame:
    """Diff of the verbatim-span contamination report across two corpus
    revisions — the audit a curation team runs after re-curating: run A
    is the corpus as-is, run B keeps the eval stratum intact but gates
    corpus docs on n_chars ≥ min_chars. Each (doc, eval_doc) span pair
    is classified `removed` (gated away), `persisted` (both runs — span
    lengths may still differ: the df-cap is corpus-relative, so
    re-curation changes which boilerplate shingles are capped), or
    `new` (a pair the SMALLER corpus surfaces because a shared shingle
    dropped under the df-cap — the non-obvious regression this diff
    exists to catch).

    Scale: two span reports (each the bounded-group diagonal-island
    plan) full-outer-joined on (doc_id, eval_doc_id) — pair-cardinality
    inputs, pair-keyed shuffle, nothing corpus-sized."""
    run_a = contamination_span_report(docs)
    gated = docs.filter(
        (F.col("doc_id") % EVAL_MODULUS == 0)
        | (F.col("n_chars") >= min_chars)
    )
    run_b = contamination_span_report(gated)
    a = run_a.select(
        "doc_id", "eval_doc_id",
        F.col("span_words").alias("span_words_before"),
    )
    b = run_b.select(
        "doc_id", "eval_doc_id",
        F.col("span_words").alias("span_words_after"),
    )
    return (
        a.join(b, ["doc_id", "eval_doc_id"], "full_outer")
        .select(
            "doc_id",
            "eval_doc_id",
            "span_words_before",
            "span_words_after",
            F.when(F.col("span_words_after").isNull(), F.lit("removed"))
            .when(F.col("span_words_before").isNull(), F.lit("new"))
            .otherwise(F.lit("persisted"))
            .alias("status"),
        )
    )


def CONTAM_DIFF_SQL(min_chars: int = DIFF_MIN_CHARS) -> str:
    run_a = contamination_span_sql()
    run_b = contamination_span_sql(
        f"doc_id % {EVAL_MODULUS} = 0 OR n_chars >= {min_chars}"
    )
    return f"""
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           COALESCE(a.eval_doc_id, b.eval_doc_id) AS eval_doc_id,
           a.span_words AS span_words_before,
           b.span_words AS span_words_after,
           CASE WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.doc_id IS NULL THEN 'new'
                ELSE 'persisted' END AS status
    FROM ({run_a}) a
    FULL OUTER JOIN ({run_b}) b
      ON a.doc_id = b.doc_id AND a.eval_doc_id = b.eval_doc_id
    ORDER BY 1, 2
    """
