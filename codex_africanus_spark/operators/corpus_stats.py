"""Corpus-level lexical statistics: vocabulary shape and Zipf fit.

Corpus curation pipelines monitor the token-frequency distribution as a
data-quality signal — a healthy natural-language crawl follows Zipf's law
(log-frequency ~ -s·log-rank, s≈1), while template/spam/boilerplate
skews shallow or steep, and the hapax (frequency-1) share tracks OCR
noise and tokenizer damage. This module computes, per source:

- vocabulary size, total tokens, type-token ratio, hapax fraction;
- the least-squares Zipf exponent over the top-R ranks.

Plan shape: one explode + groupBy(source, token) at vocabulary
cardinality (vocab ≪ corpus: heavy-tailed counts collapse map-side in
the partial aggregate), one window ranking *within source* at vocab
cardinality, then a per-source closed-form regression. No driver loops,
no UDFs.

Exactness: the regression sums quantize ln(rank)/ln(count) to 1e-6
integers per term BEFORE summing — libm log differences across engines
are ~1 ULP (1e-15 relative), far below the quantum, so both engines sum
identical integers and the only float ops are the final divisions
(IEEE-exact), rounded to 9 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

TOP_R = 100
_LQ = "1000000"  # ln-quantization grid (1e6)


def zipf_lexical_stats(documents: DataFrame) -> DataFrame:
    """Per-source lexical report: vocab_size, total_tokens, ttr,
    hapax_frac, zipf_slope (see module docstring for the scale shape)."""
    tok = documents.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = tf.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.col("cnt").desc(), "token")
        ),
    )
    lx = F.expr(f"CAST(ROUND(ln(CAST(rank AS DOUBLE)) * {_LQ}) AS BIGINT)")
    ly = F.expr(f"CAST(ROUND(ln(CAST(cnt AS DOUBLE)) * {_LQ}) AS BIGINT)")
    top = ranked.filter(F.col("rank") <= TOP_R).select(
        "source", lx.alias("lx"), ly.alias("ly")
    )
    reg = top.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        9,
    )
    shape = tf.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("cnt").alias("total_tokens"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    return (
        shape.join(reg, "source")
        .select(
            "source",
            "vocab_size",
            "total_tokens",
            F.round(F.col("vocab_size") / F.col("total_tokens"), 9).alias("ttr"),
            F.round(F.col("n_hapax") / F.col("vocab_size"), 9).alias("hapax_frac"),
            slope.alias("zipf_slope"),
        )
        .orderBy("source")
    )


ZIPF_SQL = f"""
  WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
  ),
  tf AS (
    SELECT source, token, COUNT(*) AS cnt FROM tok GROUP BY source, token
  ),
  ranked AS (
    SELECT source, cnt,
           row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token)
             AS rank
    FROM tf
  ),
  top AS (
    SELECT source,
           CAST(ROUND(ln(CAST(rank AS DOUBLE)) * {_LQ}) AS BIGINT) AS lx,
           CAST(ROUND(ln(CAST(cnt AS DOUBLE)) * {_LQ}) AS BIGINT) AS ly
    FROM ranked WHERE rank <= {TOP_R}
  ),
  reg AS (
    SELECT source, COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
           SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
    FROM top GROUP BY source
  ),
  shape AS (
    SELECT source, COUNT(*) AS vocab_size,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax
    FROM tf GROUP BY source
  )
  SELECT s.source, s.vocab_size, s.total_tokens,
         round(s.vocab_size / CAST(s.total_tokens AS DOUBLE), 9) AS ttr,
         round(s.n_hapax / CAST(s.vocab_size AS DOUBLE), 9) AS hapax_frac,
         round((r.n * r.sxy - r.sx * r.sy)
               / CAST(r.n * r.sxx - r.sx * r.sx AS DOUBLE), 9) AS zipf_slope
  FROM shape s JOIN reg r ON r.source = s.source
  ORDER BY s.source
"""


# ---------------------------------------------------------------------------
# Source-pair contamination: shingle-set Jaccard between corpus sources
# ---------------------------------------------------------------------------


def source_overlap_matrix(documents: DataFrame) -> DataFrame:
    """Pairwise shingle-set Jaccard between sources — the provenance-
    contamination signal (two "independent" crawls sharing big shingle
    sets means duplicated provenance, template reuse, or leakage).

    Plan: distinct (source, 3-gram-shingle-hash) → self-join keyed on the
    shingle hash (co-partitioned; pairs per shingle bounded by #sources²,
    a constant) → groupBy at source-pair cardinality (#sources²/2 rows).
    The corpus-sized explode collapses at the distinct; nothing after it
    exceeds vocabulary scale. Output: source_a < source_b, intersection
    size, per-source set sizes, exact Jaccard (9 dp).
    """
    from codex_africanus_spark.functions.text import hash60, word_3gram_shingles

    sh = (
        documents.filter(F.size(F.split("text", " ")) >= 3)
        .select("source", F.explode(word_3gram_shingles("text")).alias("g"))
        .select("source", hash60(F.col("g")).alias("h"))
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("source").alias("source_a"), "h")
    b = sh.select(F.col("source").alias("source_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_shingles").alias("n_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_shingles").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                9,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def SOURCE_OVERLAP_SQL() -> str:
    from codex_africanus_spark.functions.text import WORD_3GRAM_SQL, hash60_sql

    return f"""
      WITH sh AS (
        SELECT DISTINCT source, {hash60_sql('g')} AS h FROM (
          SELECT source, unnest({WORD_3GRAM_SQL}) AS g FROM (
            SELECT source, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= 3
          )
        )
      ),
      sizes AS (
        SELECT source, COUNT(*) AS n_shingles FROM sh GROUP BY source
      ),
      inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        GROUP BY a.source, b.source
      )
      SELECT i.source_a, i.source_b, i.n_common,
             sa.n_shingles AS n_a, sb.n_shingles AS n_b,
             round(i.n_common / CAST(sa.n_shingles + sb.n_shingles
                                     - i.n_common AS DOUBLE), 9) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.source = i.source_a
      JOIN sizes sb ON sb.source = i.source_b
      ORDER BY i.source_a, i.source_b
    """


# ---------------------------------------------------------------------------
# Data-mixture temperature weights (per-source sampling proportions)
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.7
MIX_BUDGET = 1_000_000_000  # token budget the epoch column is quoted at
_WQ = "1000000"  # 1e-6 fixed-point grid for the pow() term


def mixture_temperature_weights(documents: DataFrame) -> DataFrame:
    """Per-source temperature-scaled sampling weights for training-data
    mixing: w_i ∝ t_i^α with α=0.7 (the multilingual-sampling standard —
    upweights small sources relative to their raw share), plus the
    expected epoch count each source runs at a 1B-token budget.

    Plan: one groupBy at source cardinality (partial-agg collapses the
    corpus scan map-side), a 1-row broadcast of the normalization sums —
    nothing here exceeds #sources rows after the scan. Exactness: the
    pow() term is quantized to a 1e-6 integer before the normalizing sum
    (libm pow drift ~1e-16 relative ≪ quantum), so both engines divide
    identical integers; divisions round to 9/6 dp."""
    per_src = documents.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("total_tokens")
    )
    wq = F.expr(
        f"CAST(ROUND(pow(CAST(total_tokens AS DOUBLE), {MIX_ALPHA}) * {_WQ}) AS BIGINT)"
    )
    per_src = per_src.select("source", "total_tokens", wq.alias("wq"))
    norms = per_src.agg(
        F.sum("total_tokens").alias("grand_tokens"), F.sum("wq").alias("wq_sum")
    )
    return (
        per_src.crossJoin(F.broadcast(norms))
        .select(
            "source",
            "total_tokens",
            F.round(F.col("total_tokens") / F.col("grand_tokens"), 9).alias("raw_share"),
            F.round(F.col("wq") / F.col("wq_sum"), 9).alias("temp_weight"),
            F.round(
                F.col("wq") / F.col("wq_sum") * MIX_BUDGET / F.col("total_tokens"), 6
            ).alias("epochs_at_1b"),
        )
        .orderBy("source")
    )


MIXTURE_SQL = f"""
  WITH per_src AS (
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY source
  ),
  wqs AS (
    SELECT source, total_tokens,
           CAST(ROUND(pow(CAST(total_tokens AS DOUBLE), {MIX_ALPHA}) * {_WQ})
                AS BIGINT) AS wq
    FROM per_src
  ),
  norms AS (
    SELECT SUM(total_tokens) AS grand_tokens, SUM(wq) AS wq_sum FROM wqs
  )
  SELECT w.source, w.total_tokens,
         round(w.total_tokens / CAST(n.grand_tokens AS DOUBLE), 9) AS raw_share,
         round(w.wq / CAST(n.wq_sum AS DOUBLE), 9) AS temp_weight,
         round(w.wq / CAST(n.wq_sum AS DOUBLE) * {MIX_BUDGET} / w.total_tokens, 6)
           AS epochs_at_1b
  FROM wqs w, norms n
  ORDER BY w.source
"""


# ---------------------------------------------------------------------------
# Bloom-filter source signatures + pairwise bitmap overlap
# ---------------------------------------------------------------------------

BLOOM_WORD_BITS = 63  # bits per BIGINT word (63 keeps 1<<bit in signed range)
BLOOM_N_WORDS = 16
BLOOM_M = BLOOM_WORD_BITS * BLOOM_N_WORDS  # 1008-bit filter
BLOOM_K = 4  # hash functions per document


def bloom_source_overlap(documents: DataFrame) -> DataFrame:
    """Per-source Bloom-filter signatures over document texts, compared
    pairwise by bitmap AND-popcount — the constant-size sketch answer to
    "which sources share content?" (the exact-set twin is
    source_overlap_matrix; this is the form that ships between clusters:
    16 BIGINTs per source regardless of corpus size).

    Each document sets k=4 bit positions (independent salted hashes of
    the full text, mod 1008); per-source state is bit_or-aggregated into
    16 63-bit words — a partial-agg-native reduction like the HLL
    registers. The pairwise stage joins 16-row signatures (#sources × 16
    rows total): trivially broadcastable at any corpus size.
    """
    from codex_africanus_spark.functions.text import hash60

    pos = [
        (hash60(F.concat(F.lit(f"{j}|"), F.col("text"))) % BLOOM_M).alias(f"p{j}")
        for j in range(BLOOM_K)
    ]
    cells = documents.select(
        "source", F.explode(F.array(*pos)).alias("p")
    ).select(
        "source",
        F.expr(f"p DIV {BLOOM_WORD_BITS}").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD_BITS} AS INT))"
        ).alias("mask"),
    )
    bloom = cells.groupBy("source", "word_idx").agg(F.bit_or("mask").alias("bits"))
    sizes = bloom.groupBy("source").agg(
        F.sum(F.bit_count("bits")).alias("n_bits")
    )
    a, b = bloom.alias("a"), bloom.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.word_idx") == F.col("b.word_idx"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.sum(
                F.bit_count(F.col("a.bits").bitwiseAND(F.col("b.bits")))
            ).alias("n_common_bits")
        )
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_bits").alias("bits_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_bits").alias("bits_b"))
    # full upper-triangle matrix: pairs whose signatures share no word_idx
    # row must still report n_common_bits = 0 (zero overlap is an answer,
    # not a missing comparison) — cross the size frames and left-join the
    # AND-popcount totals
    return (
        sa.crossJoin(F.broadcast(sb))
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .withColumn("n_common_bits", F.coalesce(F.col("n_common_bits"), F.lit(0)))
        .select(
            "source_a",
            "source_b",
            "bits_a",
            "bits_b",
            "n_common_bits",
            F.round(
                F.col("n_common_bits")
                / (F.col("bits_a") + F.col("bits_b") - F.col("n_common_bits")),
                9,
            ).alias("bitmap_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def BLOOM_OVERLAP_SQL() -> str:
    from codex_africanus_spark.functions.text import hash60_sql

    pos_list = ", ".join(
        "({h} % {m})".format(h=hash60_sql(f"concat('{j}|', text)"), m=BLOOM_M)
        for j in range(BLOOM_K)
    )
    return f"""
      WITH cells AS (
        SELECT source, unnest([{pos_list}]) AS p FROM documents
      ),
      bloom AS (
        SELECT source, p // {BLOOM_WORD_BITS} AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(p % {BLOOM_WORD_BITS} AS INT))
                 AS bits
        FROM cells GROUP BY source, p // {BLOOM_WORD_BITS}
      ),
      sizes AS (
        SELECT source, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_bits
        FROM bloom GROUP BY source
      ),
      inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS n_common_bits
        FROM bloom a JOIN bloom b
          ON a.word_idx = b.word_idx AND a.source < b.source
        GROUP BY a.source, b.source
      )
      SELECT sa.source AS source_a, sb.source AS source_b,
             sa.n_bits AS bits_a, sb.n_bits AS bits_b,
             COALESCE(i.n_common_bits, 0) AS n_common_bits,
             round(COALESCE(i.n_common_bits, 0)
                   / CAST(sa.n_bits + sb.n_bits
                          - COALESCE(i.n_common_bits, 0) AS DOUBLE), 9)
               AS bitmap_jaccard
      FROM sizes sa
      JOIN sizes sb ON sa.source < sb.source
      LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source
      ORDER BY source_a, source_b
    """


# ---------------------------------------------------------------------------
# Deterministic weighted reservoir sampling (A-ES keys from hash uniforms)
# ---------------------------------------------------------------------------

SAMPLE_K = 64
_KQ = "1000000000000"  # 1e-12 fixed-point grid for the A-ES log-key


def weighted_sample_documents(documents: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """Weight-proportional document sample (Efraimidis-Spirakis A-ES):
    each doc draws a deterministic uniform u from the portable hash and
    takes key = ln(u)/w with w = token count; the top-k keys ARE a
    weighted sample without replacement — the reproducible "sample the
    mixture" primitive (long docs proportionally more likely, rerunnable
    bit-for-bit on any cluster, mergeable across shards by keeping each
    shard's top-k).

    Plan: pure projection + TakeOrdered top-k (per-partition heap) — no
    shuffle beyond the k-row merge. The log-key is 1e-12-quantized with
    doc_id tie-break, so the cut is engine-exact."""
    from codex_africanus_spark.functions.text import hash60

    u = (hash60(F.col("text")) + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.size(F.split("text", " ")).cast("double")
    qkey = F.round(F.log(u) / w * F.lit(float(_KQ))).cast("long")
    keyed = documents.select(
        "doc_id", "source", w.cast("long").alias("weight_tokens"), qkey.alias("qkey")
    )
    top = keyed.orderBy(F.col("qkey").desc(), "doc_id").limit(k)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.col("qkey").desc(), "doc_id"))
        .alias("rank"),
        "doc_id",
        "source",
        "weight_tokens",
        "qkey",
    )


def WEIGHTED_SAMPLE_SQL(k: int = SAMPLE_K) -> str:
    from codex_africanus_spark.functions.text import hash60_sql

    return f"""
      WITH keyed AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS weight_tokens,
               CAST(ROUND(ln(({hash60_sql('text')} + 1)
                             / CAST({1 << 60} AS DOUBLE))
                          / len(string_split(text, ' ')) * {_KQ}) AS BIGINT)
                 AS qkey
        FROM documents
      ),
      top AS (
        SELECT * FROM keyed ORDER BY qkey DESC, doc_id LIMIT {k}
      )
      SELECT CAST(row_number() OVER (ORDER BY qkey DESC, doc_id) AS BIGINT)
               AS rank,
             doc_id, source, weight_tokens, qkey
      FROM top ORDER BY rank
    """


# ---------------------------------------------------------------------------
# Round 6: stratified sampling, eval split, DSIR weights, embedding dim stats
# ---------------------------------------------------------------------------

STRAT_K = 8  # A-ES sample size per stratum
STRAT_BUCKETS = 8  # stage-1 buckets for the two-phase per-stratum top-k
EVAL_PCT = 10  # stratified split: eval share per stratum, in percent


def stratified_sample_per_source(documents: DataFrame, k: int = STRAT_K) -> DataFrame:
    """Weight-proportional sample of k docs PER SOURCE (per-stratum
    Efraimidis-Spirakis, the eval-set construction primitive): same
    deterministic A-ES key as weighted_sample_documents, ranked within
    each stratum.

    Two-phase top-k so no single stratum ever needs a full sort: stage 1
    ranks within (source, doc_id%B) buckets — bounded groups — and keeps
    each bucket's top-k; stage 2 ranks the surviving B·k rows per
    source. Top-k of a union of per-bucket top-ks IS the global
    per-source top-k, so the oracle states the direct one-window form
    and matches bit-for-bit."""
    from codex_africanus_spark.functions.text import hash60

    u = (hash60(F.col("text")) + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.size(F.split("text", " ")).cast("double")
    qkey = F.round(F.log(u) / w * F.lit(float(_KQ))).cast("long")
    keyed = documents.select(
        "doc_id", "source", w.cast("long").alias("weight_tokens"), qkey.alias("qkey")
    )
    w1 = W.partitionBy("source", F.col("doc_id") % STRAT_BUCKETS).orderBy(
        F.col("qkey").desc(), "doc_id"
    )
    survivors = (
        keyed.withColumn("brn", F.row_number().over(w1))
        .filter(F.col("brn") <= k)
        .drop("brn")
    )
    w2 = W.partitionBy("source").orderBy(F.col("qkey").desc(), "doc_id")
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "doc_id", "weight_tokens", "qkey")
    )


def STRATIFIED_SAMPLE_SQL(k: int = STRAT_K) -> str:
    from codex_africanus_spark.functions.text import hash60_sql

    return f"""
      WITH keyed AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS weight_tokens,
               CAST(ROUND(ln(({hash60_sql('text')} + 1)
                             / CAST({1 << 60} AS DOUBLE))
                          / len(string_split(text, ' ')) * {_KQ}) AS BIGINT)
                 AS qkey
        FROM documents
      ),
      ranked AS (
        SELECT source, doc_id, weight_tokens, qkey,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY qkey DESC, doc_id) AS BIGINT) AS rank
        FROM keyed
      )
      SELECT source, rank, doc_id, weight_tokens, qkey
      FROM ranked WHERE rank <= {k}
      ORDER BY source, rank
    """


def stratified_eval_split(documents: DataFrame, pct: int = EVAL_PCT) -> DataFrame:
    """Deterministic stratified train/eval split with EXACT per-stratum
    proportions: within each source, docs rank by a split-dedicated hash
    (independent of the A-ES sampling draw) and the first
    floor(n·pct/100) become eval — integer arithmetic, so every engine
    and every rerun draws the identical split. Output is the eval
    assignment (bounded at pct% of the corpus) with its stratum rank.

    Scale shape: one count-per-source partial agg (broadcast back) and
    one per-stratum rank window — the same two-phase-able shape as the
    stratified sampler; the output join is broadcast (sources are few)."""
    from codex_africanus_spark.functions.text import hash60

    skey = hash60(F.concat(F.lit("split|"), F.col("text")))
    keyed = documents.select("doc_id", "source", skey.alias("skey"))
    sizes = keyed.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = W.partitionBy("source").orderBy("skey", "doc_id")
    ranked = keyed.withColumn("strat_rank", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(sizes), "source")
        .filter(F.col("strat_rank") <= F.floor(F.col("n_docs") * pct / 100))
        .select(
            "source", F.col("strat_rank").cast("long").alias("strat_rank"),
            "doc_id", "n_docs",
        )
    )


def STRATIFIED_SPLIT_SQL(pct: int = EVAL_PCT) -> str:
    from codex_africanus_spark.functions.text import hash60_sql

    return f"""
      WITH keyed AS (
        SELECT doc_id, source, {hash60_sql("concat('split|', text)")} AS skey
        FROM documents
      ),
      sizes AS (SELECT source, COUNT(*) AS n_docs FROM keyed GROUP BY source),
      ranked AS (
        SELECT source, doc_id, skey,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY skey, doc_id) AS BIGINT) AS strat_rank
        FROM keyed
      )
      SELECT r.source, r.strat_rank, r.doc_id, s.n_docs
      FROM ranked r JOIN sizes s USING (source)
      WHERE r.strat_rank <= CAST(FLOOR(s.n_docs * {pct} / 100) AS BIGINT)
      ORDER BY r.source, r.strat_rank
    """


DSIR_BUCKETS = 1024  # hashed-bigram feature space (DSIR, Xie et al. 2023)
_DSIR_Q = 1000000  # 1e-6 grid for the per-bucket log-ratio


def dsir_importance_weights(documents: DataFrame) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    log importance weights: hashed-bigram features; per-doc
    log w(doc) = Σ_f count_f(doc) · log(p̂_target(f) / p̂_raw(f)) with
    add-one smoothing over the B-bucket feature space. Target = the
    held-out eval stratum (doc_id % EVAL_MODULUS == 0), raw = the rest —
    the "reweight toward the target distribution" curation primitive.

    Exactness discipline: each bucket's log-ratio quantizes to a 1e-6
    integer grid FIRST (the bigram_surprisal rule), then per-doc sums
    are exact integer dot products with the doc's bucket counts.

    Scale shape: bucket count tables are ≤B rows (broadcast); the
    per-doc reduce is one groupBy at doc cardinality. No corpus-side
    join larger than (doc, bucket) occurrences."""
    from codex_africanus_spark.functions.text import hash60
    from codex_africanus_spark.operators.curation import EVAL_MODULUS

    docs = documents.filter(F.size(F.split("text", " ")) >= 2)
    bigram_expr = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat_ws(' ', element_at(split(text, ' '), i), "
        "element_at(split(text, ' '), i + 1)))"
    )
    feats = docs.select(
        "doc_id", F.explode(bigram_expr).alias("bg")
    ).select("doc_id", (hash60(F.col("bg")) % DSIR_BUCKETS).alias("b"))
    tgt = feats.filter(F.col("doc_id") % EVAL_MODULUS == 0)
    raw = feats.filter(F.col("doc_id") % EVAL_MODULUS != 0)
    tgt_c = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    raw_c = raw.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_n = tgt.agg(F.count(F.lit(1)).alias("tn"))
    raw_n = raw.agg(F.count(F.lit(1)).alias("rn"))
    # per-bucket quantized log-ratio (buckets with zero mass on either
    # side still get the smoothed ratio via the left joins below)
    doc_b = raw.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    lrq = F.round(
        (
            F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                  / (F.col("tn") + F.lit(DSIR_BUCKETS)))
            - F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double")
                    / (F.col("rn") + F.lit(DSIR_BUCKETS)))
        ) * F.lit(float(_DSIR_Q))
    ).cast("long")
    joined = (
        doc_b.join(F.broadcast(tgt_c), "b", "left")
        .join(F.broadcast(raw_c), "b", "left")
        .crossJoin(F.broadcast(tgt_n))
        .crossJoin(F.broadcast(raw_n))
        .select("doc_id", "c", lrq.alias("lrq"))
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lrq")).alias("logw_q"),
        )
        .select(
            "doc_id", "n_feats",
            F.round(F.col("logw_q") / F.lit(float(_DSIR_Q)), 6).alias("log_weight"),
        )
    )


def DSIR_SQL() -> str:
    from codex_africanus_spark.functions.text import hash60_sql
    from codex_africanus_spark.operators.curation import EVAL_MODULUS

    return f"""
      WITH feats AS (
        SELECT doc_id, {hash60_sql("concat_ws(' ', w[i], w[i+1])")} % {DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 2),
             UNNEST(range(1, len(w))) AS t(i)
      ),
      tgt AS (SELECT * FROM feats WHERE doc_id % {EVAL_MODULUS} = 0),
      raw AS (SELECT * FROM feats WHERE doc_id % {EVAL_MODULUS} != 0),
      tgt_c AS (SELECT b, COUNT(*) AS ct FROM tgt GROUP BY b),
      raw_c AS (SELECT b, COUNT(*) AS cr FROM raw GROUP BY b),
      tgt_n AS (SELECT COUNT(*) AS tn FROM tgt),
      raw_n AS (SELECT COUNT(*) AS rn FROM raw),
      doc_b AS (SELECT doc_id, b, COUNT(*) AS c FROM raw GROUP BY doc_id, b),
      joined AS (
        SELECT d.doc_id, d.c,
               CAST(ROUND((ln((COALESCE(t.ct, 0) + 1)
                              / CAST(n1.tn + {DSIR_BUCKETS} AS DOUBLE))
                           - ln((COALESCE(r.cr, 0) + 1)
                                / CAST(n2.rn + {DSIR_BUCKETS} AS DOUBLE)))
                          * {_DSIR_Q}) AS BIGINT) AS lrq
        FROM doc_b d
        LEFT JOIN tgt_c t USING (b)
        LEFT JOIN raw_c r USING (b)
        CROSS JOIN tgt_n n1 CROSS JOIN raw_n n2
      )
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
             round(SUM(c * lrq) / CAST({_DSIR_Q} AS DOUBLE), 6) AS log_weight
      FROM joined GROUP BY doc_id ORDER BY doc_id
    """


_EMB_Q = 1000000  # 1e-6 per-value grid for dim statistics


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column — the
    pre-whitening / index-health pass (a dimension with runaway mean or
    variance dominates L2 and starves the quantizers): exact fixed-point
    sums per dim, accumulated in decimal(38,0) (HUGEINT twin) so the
    pass survives corpus-scale row counts, then engine-identical
    mean/variance. One posexplode + one partial-agg groupBy at dim
    cardinality — the _centroids shuffle shape."""
    dims = embeddings.select(F.posexplode("embedding").alias("pos", "val"))
    per = dims.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(
            F.round(F.col("val").cast("double") * _EMB_Q).cast("decimal(38,0)")
        ).alias("s1"),
        F.sum(
            (F.round(F.col("val").cast("double") * _EMB_Q).cast("decimal(38,0)")
             * F.round(F.col("val").cast("double") * _EMB_Q).cast("long"))
        ).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_vecs") / F.lit(float(_EMB_Q))
    ex2 = (
        F.col("s2").cast("double") / F.col("n_vecs")
        / F.lit(float(_EMB_Q) * float(_EMB_Q))
    )
    # quantize-form final rounding (r8 sf0.1 sweep): F.round's exact
    # BigDecimal path vs DuckDB's double-product ROUND forked one dim's
    # mean at a 9-dp boundary at sf0.1; round(x*1e9)/1e9 is the same
    # double expression in both engines.
    from codex_africanus_spark.functions.deterministic import quantize

    return per.select(
        "pos", "n_vecs",
        (quantize(mean, 1e9) / F.lit(1e9)).alias("dim_mean"),
        (quantize(ex2 - mean * mean, 1e9) / F.lit(1e9)).alias("dim_var"),
    ).orderBy("pos")


EMBEDDING_DIM_STATS_SQL = f"""
  WITH dims AS (
    SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
           unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS val
    FROM embeddings
  ),
  per AS (
    SELECT pos, COUNT(*) AS n_vecs,
           SUM(CAST(ROUND(val * {_EMB_Q}) AS HUGEINT)) AS s1,
           SUM(CAST(ROUND(val * {_EMB_Q}) AS HUGEINT)
               * CAST(ROUND(val * {_EMB_Q}) AS BIGINT)) AS s2
    FROM dims GROUP BY pos
  )
  SELECT pos, n_vecs,
         CAST(ROUND(CAST(s1 AS DOUBLE) / n_vecs / {_EMB_Q} * 1000000000.0) AS BIGINT) / 1000000000.0 AS dim_mean,
         CAST(ROUND((CAST(s2 AS DOUBLE) / n_vecs / ({_EMB_Q}.0 * {_EMB_Q})
               - (CAST(s1 AS DOUBLE) / n_vecs / {_EMB_Q})
                 * (CAST(s1 AS DOUBLE) / n_vecs / {_EMB_Q})) * 1000000000.0) AS BIGINT) / 1000000000.0 AS dim_var
  FROM per ORDER BY pos
"""


def heaps_law_vocab_growth(documents: DataFrame) -> DataFrame:
    """Heaps'-law vocabulary growth (r9): cumulative vocabulary size
    V(n) at ten corpus-prefix checkpoints (doc_id deciles — the
    deterministic ingest order), with the fitted Heaps exponent
    b from the log-log least squares over the checkpoints
    (V = k·n^b; b~0.5 for natural text, lower for templated/duplicated
    corpora — the dedup-health dashboard number next to zipf_slope).

    Exactness: a token's first decile is MIN over its occurrences'
    deciles (integer), cumulative counts are exact window sums over the
    10-row decile frame, ln() quantizes to the 1e-6 grid before the
    regression sums (the zipf_lexical_stats discipline), and the slope
    is a 9dp-rounded ratio of exact integers.

    Scale: one explode -> (token) first-occurrence aggregate (vocabulary
    cardinality, map-side combined), one per-decile count; everything
    after lives on a 10-row frame."""
    mx = documents.agg(F.max("doc_id").alias("mx"))
    toks = documents.crossJoin(F.broadcast(mx)).select(
        F.expr("doc_id * 10 DIV (mx + 1)").alias("dec"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    per_dec = toks.groupBy("dec").agg(F.count(F.lit(1)).alias("ntok"))
    first_dec = toks.groupBy("token").agg(F.min("dec").alias("fdec"))
    new_vocab = first_dec.groupBy("fdec").agg(
        F.count(F.lit(1)).alias("nvoc")
    )
    w = W.orderBy("dec").rowsBetween(W.unboundedPreceding, 0)
    cum = (
        per_dec.join(
            new_vocab.withColumnRenamed("fdec", "dec"), "dec", "left"
        )
        .select(
            "dec",
            F.sum("ntok").over(w).alias("n_tokens"),
            F.sum(F.coalesce(F.col("nvoc"), F.lit(0))).over(w).alias("vocab"),
        )
    )
    lx = F.expr("CAST(ROUND(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)")
    ly = F.expr("CAST(ROUND(ln(CAST(vocab AS DOUBLE)) * 1000000) AS BIGINT)")
    pts = cum.select("dec", "n_tokens", "vocab", lx.alias("lx"), ly.alias("ly"))
    reg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    ).select(
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            9,
        ).alias("heaps_exponent")
    )
    return (
        pts.crossJoin(F.broadcast(reg))
        .select("dec", "n_tokens", "vocab", "heaps_exponent")
        .orderBy("dec")
    )


HEAPS_LAW_SQL = """
  WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
  toks AS (
    SELECT doc_id * 10 // (mx + 1) AS dec,
           unnest(string_split(text, ' ')) AS token
    FROM documents, mx
  ),
  per_dec AS (SELECT dec, COUNT(*) AS ntok FROM toks GROUP BY dec),
  first_dec AS (SELECT token, MIN(dec) AS fdec FROM toks GROUP BY token),
  new_vocab AS (SELECT fdec AS dec, COUNT(*) AS nvoc FROM first_dec GROUP BY fdec),
  cum AS (
    SELECT p.dec,
           CAST(SUM(p.ntok) OVER (ORDER BY p.dec
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_tokens,
           CAST(SUM(COALESCE(v.nvoc, 0)) OVER (ORDER BY p.dec
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS vocab
    FROM per_dec p LEFT JOIN new_vocab v USING (dec)
  ),
  pts AS (
    SELECT dec, n_tokens, vocab,
           CAST(ROUND(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS lx,
           CAST(ROUND(ln(CAST(vocab AS DOUBLE)) * 1000000) AS BIGINT) AS ly
    FROM cum
  ),
  reg AS (
    SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
           SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
    FROM pts
  )
  SELECT p.dec, p.n_tokens, p.vocab,
         round(CAST(r.n * r.sxy - r.sx * r.sy AS DOUBLE)
               / CAST(r.n * r.sxx - r.sx * r.sx AS DOUBLE), 9)
           AS heaps_exponent
  FROM pts p, reg r
  ORDER BY p.dec
"""
