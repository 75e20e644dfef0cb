"""Tokenizer-training primitives: BPE merge induction and bigram-LM scoring.

Large-scale training pipelines train their tokenizer on (a sample of) the
corpus itself. The two kernels a distributed tokenizer trainer needs are
exactly the two here:

- **BPE pair counting** (`bpe_pair_merge_counts`): the inner loop of
  byte-pair-encoding training is "count adjacent symbol pairs weighted by
  word frequency, take the argmax, merge" (Sennrich et al. 2016). One
  induction round is a pure two-stage aggregation: corpus → word-frequency
  table (vocabulary cardinality — Zipf head collapses in the map-side
  partial agg) → adjacent character pairs weighted by word count (pair-
  vocabulary cardinality) → top-N. Driver-side iteration over rounds
  re-runs this on the merged symbol table; the per-round Spark shape below
  is the scalable part.

- **Bigram-LM surprisal** (`bigram_surprisal_quality`): the CCNet-style
  perplexity quality filter one order up from the unigram tier
  (`curation.unigram_logprob_quality`). Per document, the mean of
  −log₂ P(w_i | w_{i−1}) under the corpus's own add-one-smoothed bigram
  model: P = (c(w₁w₂)+1) / (c(w₁·)+V). Low scores flag boilerplate,
  high scores flag noise; the bigram tier additionally penalizes
  scrambled word salad that a unigram model scores as normal.

Exactness discipline (same as the rest of the curation family): every
log term is fixed-point-quantized to a 1e-9 integer BEFORE summing, so
per-document means are partition-order-independent and bit-exactly
reproducible in the DuckDB oracle; libm cross-engine drift (~1 ULP,
1e-15 relative) is far below the quantum.

Scale shapes (100 TB): the word-frequency and bigram-count tables are
vocabulary-sized, orders of magnitude below corpus size — their groupBys
collapse map-side. The per-document bigram scoring joins token-cardinality
bigrams against the count tables: both the unigram-context and bigram
joins are left to AQE (shuffle-hash at TB vocab, broadcast below the
threshold) — both sides are vocabulary-cardinality, so a forced
broadcast would OOM at scale. Top-N is a TakeOrdered (per-partition heap + driver
merge of N), never a global sort.

Reference analogue: the reference engine has no tokenizer surface — this
extends the training-data-pipeline tier the same way dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from codex_africanus_spark.functions.text import hash60, hash60_sql
from codex_africanus_spark.sources.tables import fan_out

TOP_PAIRS = 20
_Q = "1000000000"  # 1e-9 fixed-point quantum for log terms


def bpe_pair_merge_counts(docs: DataFrame, top_n: int = TOP_PAIRS) -> DataFrame:
    """One BPE induction round at character level: the top-N adjacent
    character pairs by corpus frequency (weighted by word count) — the
    merge candidates a BPE trainer would fuse next.

    Words of length < 2 are filtered BEFORE the pair transform: Spark's
    sequence(1, 0) yields a descending [1, 0] and substring at 0 is a
    latent crash class (see curation.repetition bigram guard).
    """
    words = fan_out(docs).select(F.explode(F.split("text", " ")).alias("word"))
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        "c",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("c").alias("merge_count"))
    top = counts.orderBy(F.col("merge_count").desc(), "pair").limit(top_n)
    # rank window runs on top_n rows post-limit — bounded, not a global sort
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("merge_count").desc(), "pair"))
        .alias("rank"),
        "pair",
        "merge_count",
    )


BPE_PAIR_SQL = f"""
  WITH words AS (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ),
  vocab AS (
    SELECT word, COUNT(*) AS c FROM words GROUP BY word HAVING len(word) >= 2
  ),
  pairs AS (
    SELECT substr(word, i, 2) AS pair, c
    FROM (SELECT word, c, unnest(generate_series(1, len(word) - 1)) AS i
          FROM vocab)
  ),
  counts AS (
    SELECT pair, CAST(SUM(c) AS BIGINT) AS merge_count
    FROM pairs GROUP BY pair
  ),
  top AS (
    SELECT pair, merge_count FROM counts
    ORDER BY merge_count DESC, pair LIMIT {TOP_PAIRS}
  )
  SELECT CAST(row_number() OVER (ORDER BY merge_count DESC, pair) AS BIGINT)
           AS rank,
         pair, merge_count
  FROM top ORDER BY rank
"""


def bigram_surprisal_quality(docs: DataFrame) -> DataFrame:
    """Per-document mean bigram surprisal −log₂ P(w_i | w_{i−1}) under the
    corpus's own add-one-smoothed bigram model (see module docstring).
    Documents with < 2 tokens have no bigrams and are dropped (the SQL
    mirror drops them identically); V counts distinct tokens over the
    same bigram-eligible population on both sides."""
    docs = fan_out(docs).filter(F.size(F.split("text", " ")) >= 2)
    bigram_expr = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat_ws(' ', element_at(split(text, ' '), i), "
        "element_at(split(text, ' '), i + 1)))"
    )
    bg = docs.select("doc_id", F.explode(bigram_expr).alias("bgram")).withColumn(
        "w1", F.element_at(F.split("bgram", " "), 1)
    )
    bgc = bg.groupBy("bgram").agg(F.count(F.lit(1)).alias("c12"))
    ctx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # V = distinct token count over the bigram-eligible documents
    v = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    surprisal_q = F.round(
        (F.log2(F.col("c1") + F.col("v")) - F.log2(F.col("c12") + F.lit(1))) * float(_Q)
    ).cast("long")
    return (
        bg.join(bgc, "bgram")
        .join(ctx, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(surprisal_q) / float(_Q) / F.count(F.lit(1)), 6
            ).alias("mean_bigram_surprisal"),
        )
    )


BIGRAM_SURPRISAL_SQL = f"""
  WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
    WHERE len(string_split(text, ' ')) >= 2
  ),
  bg AS (
    SELECT doc_id, concat_ws(' ', w[i], w[i + 1]) AS bgram, w[i] AS w1
    FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
          FROM d)
  ),
  bgc AS (SELECT bgram, COUNT(*) AS c12 FROM bg GROUP BY bgram),
  ctx AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
  vocab AS (
    SELECT COUNT(DISTINCT t) AS v
    FROM (SELECT unnest(string_split(text, ' ')) AS t
          FROM documents WHERE len(string_split(text, ' ')) >= 2)
  )
  SELECT b.doc_id,
         COUNT(*) AS n_bigrams,
         round(SUM(CAST(ROUND((log2(c.c1 + vv.v) - log2(g.c12 + 1)) * {_Q})
                        AS BIGINT))
               / {_Q} / COUNT(*), 6) AS mean_bigram_surprisal
  FROM bg b JOIN bgc g USING (bgram) JOIN ctx c USING (w1), vocab vv
  GROUP BY b.doc_id
  ORDER BY b.doc_id
"""


def trigram_backoff_quality(docs: DataFrame) -> DataFrame:
    """Trigram stupid-backoff surprisal quality tier (Brants et al.
    2007, "Large Language Models in Machine Translation") — the order-3
    member of the unigram/bigram LM-quality ladder.

    The model corpus is the even-doc_id half (a deterministic holdout
    split, so the backoff chain is actually exercised: odd documents
    contain trigrams the model never saw). All counts derive from the
    model's trigram-occurrence table, keeping every tier self-consistent:

        S(w₃|w₁w₂) = c₁₂₃/c₁₂                    if the trigram was seen
                   = 0.4 · c₂₃/c₂                elif the (w₂,w₃) suffix was
                   = 0.16 · (c₃+1)/(N+V)         else (add-one unigram floor)

    Per document: n_trigrams, how many fell off the top tier
    (n_backoff), and the mean −log₂ S, each log term fixed-point
    quantized before summing (bit-exact under any partitioning, exactly
    mirrored in SQL).

    Scale: all count tables are vocabulary-cardinality (map-side
    collapse); the scoring joins are token-cardinality vs vocabulary —
    left to AQE, same rationale as the bigram tier. The branch decision
    is NULL-presence (integer-exact), never a float compare."""
    return (
        _trigram_scored(docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("backoff").alias("n_backoff"),
            F.round(
                F.sum("surprisal_q") / float(_Q) / F.count(F.lit(1)), 6
            ).alias("mean_backoff_surprisal"),
        )
    )


def _trigram_scored(docs: DataFrame, keep: tuple = (), train=None) -> DataFrame:
    """Shared stupid-backoff scoring frame: one row per test trigram with
    (doc_id, *keep, backoff, surprisal_q) — consumed by the per-doc
    quality tier and the train/test-gap eval. Extracted verbatim from
    trigram_backoff_quality so both queries score identically. `train`
    overrides the model-half membership predicate (default: even
    doc_ids, the original quality-tier split)."""
    docs = fan_out(docs).filter(F.size(F.split("text", " ")) >= 3)
    tri_expr = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> struct(element_at(split(text, ' '), i) AS w1, "
        "element_at(split(text, ' '), i + 1) AS w2, "
        "element_at(split(text, ' '), i + 2) AS w3))"
    )
    # the trigram frame feeds SIX consumers (five count tables + the
    # scoring join) — persist it once instead of re-exploding the corpus
    # per consumer (on a cluster this is the bucketed intermediate table)
    tg = docs.select("doc_id", *keep, F.explode(tri_expr).alias("t")).select(
        "doc_id", *keep,
        F.col("t.w1").alias("w1"), F.col("t.w2").alias("w2"), F.col("t.w3").alias("w3"),
    ).localCheckpoint(eager=True)  # GC-scoped, not CacheManager-pinned (r8)
    model = tg.filter(F.col("doc_id") % 2 == 0 if train is None else train)
    tgc = model.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    bg12 = model.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bg23 = model.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("c23"))
    c2m = model.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    c3t = model.groupBy("w3").agg(F.count(F.lit(1)).alias("c3"))
    nv = model.agg(
        F.count(F.lit(1)).alias("n_model"),
        F.count_distinct("w3").alias("v_model"),
    )
    s = (
        F.when(F.col("c123").isNotNull(), F.col("c123") / F.col("c12"))
        .when(
            F.col("c23").isNotNull(),
            F.lit(0.4) * F.col("c23") / F.col("c2"),
        )
        .otherwise(
            F.lit(0.16)
            * (F.coalesce(F.col("c3"), F.lit(0)) + F.lit(1))
            / (F.col("n_model") + F.col("v_model"))
        )
    )
    surprisal_q = F.round((-F.log2(s)) * float(_Q)).cast("long")
    backoff = F.when(F.col("c123").isNull(), 1).otherwise(0)
    return (
        tg.join(tgc, ["w1", "w2", "w3"], "left")
        .join(bg12, ["w1", "w2"], "left")
        .join(bg23, ["w2", "w3"], "left")
        .join(c2m, ["w2"], "left")
        .join(c3t, ["w3"], "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "doc_id", *keep,
            backoff.alias("backoff"), surprisal_q.alias("surprisal_q"),
        )
    )


def lm_train_test_gap(docs: DataFrame) -> DataFrame:
    """Per-source LM generalization gap: mean stupid-backoff surprisal on
    the model's OWN half (even doc_ids) vs the held-out half (odd) — the
    overfitting / distribution-shift detector a mixture designer reads
    per source. Shares _trigram_scored with the quality tier, so the
    scoring arithmetic cannot fork; aggregation runs on the exact
    quantized sums (one division per cell at output).

    The split is HASH-based (md5-derived bit of doc_id), not parity:
    the synthetic corpus assigns source = doc_id mod n_sources, so a
    parity split would put every source wholly in one half."""
    docs = docs.withColumn(
        "in_train", hash60(F.col("doc_id").cast("string")) % 2 == 0
    )
    scored = _trigram_scored(
        docs, keep=("source", "in_train"), train=F.col("in_train")
    )
    cells = (
        scored.groupBy("source", "in_train")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("backoff").alias("n_backoff"),
            F.sum("surprisal_q").alias("sq"),
        )
    )
    train = cells.filter(F.col("in_train")).select(
        "source",
        F.col("n_trigrams").alias("n_train"),
        F.col("sq").alias("sq_train"),
    )
    test = cells.filter(~F.col("in_train")).select(
        "source",
        F.col("n_trigrams").alias("n_test"),
        F.col("n_backoff").alias("n_backoff_test"),
        F.col("sq").alias("sq_test"),
    )
    mean_train = F.col("sq_train") / float(_Q) / F.col("n_train")
    mean_test = F.col("sq_test") / float(_Q) / F.col("n_test")
    return (
        train.join(test, "source")
        .select(
            "source", "n_train", "n_test", "n_backoff_test",
            F.round(mean_train, 6).alias("train_surprisal"),
            F.round(mean_test, 6).alias("test_surprisal"),
            F.round(mean_test - mean_train, 6).alias("generalization_gap"),
        )
        .orderBy("source")
    )


_IN_TRAIN_HASH = hash60_sql("CAST(doc_id AS VARCHAR)")

LM_TRAIN_TEST_GAP_SQL = f"""
  WITH d AS (
    SELECT doc_id, source,
           ({_IN_TRAIN_HASH} % 2) = 0 AS in_train,
           string_split(text, ' ') AS w FROM documents
    WHERE len(string_split(text, ' ')) >= 3
  ),
  tg AS (
    SELECT doc_id, source, in_train,
           w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
    FROM (SELECT doc_id, source, in_train, w,
                 unnest(generate_series(1, len(w) - 2)) AS i
          FROM d)
  ),
  model AS (SELECT * FROM tg WHERE in_train),
  tgc AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM model GROUP BY w1, w2, w3),
  bg12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM model GROUP BY w1, w2),
  bg23 AS (SELECT w2, w3, COUNT(*) AS c23 FROM model GROUP BY w2, w3),
  c2m AS (SELECT w2, COUNT(*) AS c2 FROM model GROUP BY w2),
  c3t AS (SELECT w3, COUNT(*) AS c3 FROM model GROUP BY w3),
  nv AS (SELECT COUNT(*) AS n_model, COUNT(DISTINCT w3) AS v_model FROM model),
  scored AS (
    SELECT t.doc_id, t.source, t.in_train,
           CASE WHEN g.c123 IS NULL THEN 1 ELSE 0 END AS backoff,
           CAST(ROUND((-log2(
             CASE WHEN g.c123 IS NOT NULL THEN CAST(g.c123 AS DOUBLE) / b12.c12
                  WHEN b23.c23 IS NOT NULL
                    THEN CAST(0.4 AS DOUBLE) * b23.c23 / cm.c2
                  ELSE CAST(0.16 AS DOUBLE) * (COALESCE(ct.c3, 0) + 1)
                       / (vv.n_model + vv.v_model)
             END)) * {_Q}) AS BIGINT) AS surprisal_q
    FROM tg t
    LEFT JOIN tgc g USING (w1, w2, w3)
    LEFT JOIN bg12 b12 USING (w1, w2)
    LEFT JOIN bg23 b23 USING (w2, w3)
    LEFT JOIN c2m cm USING (w2)
    LEFT JOIN c3t ct USING (w3)
    , nv vv
  ),
  cells AS (
    SELECT source, in_train,
           COUNT(*) AS n_trigrams,
           CAST(SUM(backoff) AS BIGINT) AS n_backoff,
           CAST(SUM(surprisal_q) AS BIGINT) AS sq
    FROM scored GROUP BY 1, 2
  )
  SELECT tr.source, tr.n_trigrams AS n_train, te.n_trigrams AS n_test,
         te.n_backoff AS n_backoff_test,
         round(tr.sq / {_Q} / tr.n_trigrams, 6) AS train_surprisal,
         round(te.sq / {_Q} / te.n_trigrams, 6) AS test_surprisal,
         round(te.sq / {_Q} / te.n_trigrams
               - tr.sq / {_Q} / tr.n_trigrams, 6) AS generalization_gap
  FROM cells tr JOIN cells te
    ON te.source = tr.source AND tr.in_train AND NOT te.in_train
  ORDER BY tr.source
"""


TRIGRAM_BACKOFF_SQL = f"""
  WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
    WHERE len(string_split(text, ' ')) >= 3
  ),
  tg AS (
    SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
    FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
          FROM d)
  ),
  model AS (SELECT * FROM tg WHERE doc_id % 2 = 0),
  tgc AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM model GROUP BY w1, w2, w3),
  bg12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM model GROUP BY w1, w2),
  bg23 AS (SELECT w2, w3, COUNT(*) AS c23 FROM model GROUP BY w2, w3),
  c2m AS (SELECT w2, COUNT(*) AS c2 FROM model GROUP BY w2),
  c3t AS (SELECT w3, COUNT(*) AS c3 FROM model GROUP BY w3),
  nv AS (SELECT COUNT(*) AS n_model, COUNT(DISTINCT w3) AS v_model FROM model),
  scored AS (
    SELECT t.doc_id,
           CASE WHEN g.c123 IS NOT NULL THEN CAST(g.c123 AS DOUBLE) / b12.c12
                WHEN b23.c23 IS NOT NULL
                  THEN CAST(0.4 AS DOUBLE) * b23.c23 / cm.c2
                ELSE CAST(0.16 AS DOUBLE) * (COALESCE(ct.c3, 0) + 1)
                     / (vv.n_model + vv.v_model)
           END AS s,
           CASE WHEN g.c123 IS NULL THEN 1 ELSE 0 END AS backoff
    FROM tg t
    LEFT JOIN tgc g USING (w1, w2, w3)
    LEFT JOIN bg12 b12 USING (w1, w2)
    LEFT JOIN bg23 b23 USING (w2, w3)
    LEFT JOIN c2m cm USING (w2)
    LEFT JOIN c3t ct USING (w3)
    , nv vv
  )
  SELECT doc_id,
         COUNT(*) AS n_trigrams,
         CAST(SUM(backoff) AS BIGINT) AS n_backoff,
         round(SUM(CAST(ROUND((-log2(s)) * {_Q}) AS BIGINT)) / {_Q} / COUNT(*), 6)
           AS mean_backoff_surprisal
  FROM scored
  GROUP BY doc_id
  ORDER BY doc_id
"""


def heldout_perplexity_topk(docs: DataFrame, k: int = 200) -> DataFrame:
    """Held-out n-gram LM perplexity scoring (r8 verdict item 7
    candidate): train the stupid-backoff trigram LM on the hash-selected
    half of the corpus, score every HELD-OUT document's bits-per-token
    (mean -log2 S — perplexity in log space, the CCNet/KenLM quality
    signal), and emit the k worst documents — the shard a curation pass
    actually drops or reroutes. Shares _trigram_scored with the quality
    and train/test-gap tiers, so the scoring arithmetic cannot fork.

    Scale: the per-document aggregate is document-cardinality; the k
    worst are taken with orderBy().limit(k) — Catalyst's distributed
    TakeOrderedAndProject, never a single-partition global window —
    and ranks are assigned on the k-row result. Ordering compares
    doubles that are exact integer ratios (identical in both engines);
    ties break on doc_id."""
    docs = docs.withColumn(
        "in_train", hash60(F.col("doc_id").cast("string")) % 2 == 0
    )
    scored = _trigram_scored(
        docs, keep=("source", "in_train"), train=F.col("in_train")
    )
    per_doc = (
        scored.filter(~F.col("in_train"))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("backoff").alias("n_backoff"),
            F.sum("surprisal_q").alias("sq"),
        )
    )
    bits = F.col("sq") / float(_Q) / F.col("n_trigrams")
    worst = (
        per_doc.orderBy(bits.desc(), "doc_id").limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    (F.col("sq") / float(_Q) / F.col("n_trigrams")).desc(),
                    "doc_id",
                )
            ),
        )
    )
    return worst.select(
        "rank", "doc_id", "source", "n_trigrams", "n_backoff",
        F.round(bits, 6).alias("bits_per_token"),
    ).orderBy("rank")


HELDOUT_PPL_SQL = f"""
  WITH d AS (
    SELECT doc_id, source,
           ({_IN_TRAIN_HASH} % 2) = 0 AS in_train,
           string_split(text, ' ') AS w FROM documents
    WHERE len(string_split(text, ' ')) >= 3
  ),
  tg AS (
    SELECT doc_id, source, in_train,
           w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
    FROM (SELECT doc_id, source, in_train, w,
                 unnest(generate_series(1, len(w) - 2)) AS i
          FROM d)
  ),
  model AS (SELECT * FROM tg WHERE in_train),
  tgc AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM model GROUP BY w1, w2, w3),
  bg12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM model GROUP BY w1, w2),
  bg23 AS (SELECT w2, w3, COUNT(*) AS c23 FROM model GROUP BY w2, w3),
  c2m AS (SELECT w2, COUNT(*) AS c2 FROM model GROUP BY w2),
  c3t AS (SELECT w3, COUNT(*) AS c3 FROM model GROUP BY w3),
  nv AS (SELECT COUNT(*) AS n_model, COUNT(DISTINCT w3) AS v_model FROM model),
  scored AS (
    SELECT t.doc_id, t.source,
           CASE WHEN g.c123 IS NULL THEN 1 ELSE 0 END AS backoff,
           CAST(ROUND((-log2(
             CASE WHEN g.c123 IS NOT NULL THEN CAST(g.c123 AS DOUBLE) / b12.c12
                  WHEN b23.c23 IS NOT NULL
                    THEN CAST(0.4 AS DOUBLE) * b23.c23 / cm.c2
                  ELSE CAST(0.16 AS DOUBLE) * (COALESCE(ct.c3, 0) + 1)
                       / (vv.n_model + vv.v_model)
             END)) * {_Q}) AS BIGINT) AS surprisal_q
    FROM tg t
    LEFT JOIN tgc g USING (w1, w2, w3)
    LEFT JOIN bg12 b12 USING (w1, w2)
    LEFT JOIN bg23 b23 USING (w2, w3)
    LEFT JOIN c2m cm USING (w2)
    LEFT JOIN c3t ct USING (w3)
    , nv vv
    WHERE NOT t.in_train
  ),
  per_doc AS (
    SELECT doc_id, source,
           COUNT(*) AS n_trigrams,
           CAST(SUM(backoff) AS BIGINT) AS n_backoff,
           CAST(SUM(surprisal_q) AS BIGINT) AS sq
    FROM scored GROUP BY doc_id, source
  ),
  ranked AS (
    SELECT *, row_number() OVER (
        ORDER BY sq / {_Q} / n_trigrams DESC, doc_id) AS rank
    FROM per_doc
  )
  SELECT rank, doc_id, source, n_trigrams, n_backoff,
         round(sq / {_Q} / n_trigrams, 6) AS bits_per_token
  FROM ranked WHERE rank <= 200 ORDER BY rank
"""
