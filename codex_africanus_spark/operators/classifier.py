"""Hashing-trick linear quality classifier (fasttext-style model scoring
as pure Spark expressions).

The curation ladder's heuristic tiers (doc_token_quality, repetition
flags, unigram surprisal) hand-craft features; production pipelines
usually *also* run a trained linear classifier (fastText / logistic
regression over hashed bag-of-words — the CCNet / GPT-3 quality-filter
shape). This module shows that entire inference path staying JVM-side:

- **Hashing trick**: token → bucket = hash31(token) % D (D=64), the
  standard collision-tolerant feature map — no vocabulary table, no
  join, no shuffle.
- **Fused dot product**: the bucket vector is never materialized; each
  token contributes weights[bucket(token)] straight into an integer
  accumulator (`aggregate` over the token array). O(tokens) per row,
  **zero shuffle** — at 100 TB this is a projection riding the scan,
  exactly like the MinHash signatures.
- **Exact squashing**: the logit uses integer weight sums and one IEEE
  division; the probability uses the rational fast-sigmoid
  0.5 + 0.5·x/(1+|x|) instead of exp() — transcendental libm calls are
  NOT bit-identical across engines, rational arithmetic is, so the
  scores hash-match the DuckDB oracle bit for bit.

The weights are a deterministic stand-in for a trained model (a
Knuth-multiplicative spread over the buckets); swapping in real learned
weights changes the literal array only — the plan shape is the product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.functions.text import HASH_P, hash60_sql

N_BUCKETS = 64
_WSCALE = 1000  # integer weights are milli-units

# Deterministic "pretrained" weight table: Knuth multiplicative hash of
# the bucket index spread over [-1001, 1001] milli-units.
WEIGHTS = [((2654435761 * (j + 1)) % 2003) - 1001 for j in range(N_BUCKETS)]
BIAS = 37  # milli-units


def _weights_array_sql() -> str:
    return "[" + ", ".join(str(w) for w in WEIGHTS) + "]"


def classify(documents: DataFrame, carry: list[str] | None = None) -> DataFrame:
    """Per-document linear quality score over hashed bag-of-words.

    Output: doc_id, [carry cols], n_tokens, raw_score (exact integer
    milli-logit sum), quality_score (rational-sigmoid probability, 9 dp),
    keep (decision). `carry` columns ride the projection (no join needed
    downstream — the whole thing stays one scan-resident select).
    """
    carry = carry or []
    w_lit = "array(" + ", ".join(
        f"CAST({w} AS BIGINT)" for w in WEIGHTS
    ) + ")"
    raw = F.expr(
        f"aggregate(split(text, ' '), CAST({BIAS} AS BIGINT), (acc, t) -> "
        f"acc + element_at({w_lit}, "
        f"CAST((CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % {HASH_P})"
        f" % {N_BUCKETS} AS INT) + 1))"
    )
    out = documents.select(
        "doc_id",
        *carry,
        F.size(F.split("text", " ")).alias("n_tokens"),
        raw.alias("raw_score"),
    )
    logit = F.col("raw_score") / (F.lit(_WSCALE).cast("double") * F.col("n_tokens"))
    score = F.round(
        F.lit(0.5) + F.lit(0.5) * logit / (F.lit(1.0) + F.abs(logit)), 9
    )
    return out.select(
        "doc_id",
        *carry,
        "n_tokens",
        "raw_score",
        score.alias("quality_score"),
        F.when(F.col("raw_score") >= 0, 1).otherwise(0).alias("keep"),
    )


CLASSIFY_SQL = f"""
  WITH scored AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           {BIAS} + list_sum(list_transform(string_split(text, ' '), t ->
             {_weights_array_sql()}[
               CAST(({hash60_sql('t')} % {HASH_P}) % {N_BUCKETS} AS INT) + 1
             ])) AS raw_score
    FROM documents
  )
  SELECT doc_id, n_tokens, CAST(raw_score AS BIGINT) AS raw_score,
         round(0.5 + 0.5 * (raw_score / ({_WSCALE}.0 * n_tokens))
               / (1.0 + abs(raw_score / ({_WSCALE}.0 * n_tokens))), 9)
           AS quality_score,
         CASE WHEN raw_score >= 0 THEN 1 ELSE 0 END AS keep
  FROM scored
  ORDER BY doc_id
"""


def source_rollup(documents: DataFrame) -> DataFrame:
    """Per-source corpus report from the classifier: document counts,
    keep rate, and mean quality (fixed-point mean of the 9-dp scores so
    the aggregate is order-independent and exactly oracled). Partial
    aggregation collapses this map-side; output is dimension-sized."""
    scored = classify(documents, carry=["source"])
    q = F.round(F.col("quality_score") * 1000000000).cast("long")
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_keep"),
            F.round(
                F.sum(q) / (F.count(F.lit(1)) * 1000000000.0), 9
            ).alias("mean_quality"),
        )
        .orderBy("source")
    )


SOURCE_ROLLUP_SQL = f"""
  WITH scored AS ({CLASSIFY_SQL.replace("ORDER BY doc_id", "")}),
  joined AS (
    SELECT s.quality_score, s.keep, d.source
    FROM scored s JOIN documents d ON d.doc_id = s.doc_id
  )
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(keep) AS BIGINT) AS n_keep,
         round(SUM(CAST(ROUND(quality_score * 1000000000) AS BIGINT))
               / (COUNT(*) * 1000000000.0), 9) AS mean_quality
  FROM joined GROUP BY source ORDER BY source
"""


def length_quality_correlation(documents: DataFrame) -> DataFrame:
    """Per-source Pearson correlation between document length (tokens)
    and the classifier's raw quality logit — the 'are we length-biased'
    audit a mixture designer runs before setting length-conditioned
    sampling. Both variables are exact integers; the moment sums form in
    decimal(38,0) (per-row y² is ~1e14 for a 10k-token doc, so int64
    would overflow after ~1e5 such docs per source — the RFI-report
    lesson; x is also widened to long first, since an int32 n_tokens²
    overflows ANSI at ≥ 46341 tokens). r assembles from the sums in
    identical doubles and rounds at 9 dp — exact while the sums stay
    below 2^53; beyond that the int128↔double casts are the documented
    cross-engine risk and a coarser quantization tier would be needed.
    One scan, one partial-agg shuffle at source cardinality."""
    dec = "decimal(38,0)"
    scored = classify(documents, carry=["source"]).select(
        "source",
        F.col("n_tokens").cast("long").alias("x"),
        F.col("raw_score").alias("y"),
    )
    m = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    num = F.expr(
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    vx = F.expr(
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    )
    vy = F.expr(
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    return m.select(
        "source", "n",
        F.when(
            (vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 9)
        ).alias("length_quality_r"),
    ).orderBy("source")


LENGTH_QUALITY_CORR_SQL = f"""
  WITH scored AS (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS x,
           {BIAS} + list_sum(list_transform(string_split(text, ' '), t ->
             {_weights_array_sql()}[
               CAST(({hash60_sql('t')} % {HASH_P}) % {N_BUCKETS} AS INT) + 1
             ])) AS y
    FROM documents
  ),
  m AS (
    SELECT source, COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           SUM(CAST(x AS HUGEINT) * y) AS sxy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           SUM(CAST(y AS HUGEINT) * y) AS syy
    FROM scored GROUP BY source
  )
  SELECT source, n,
         CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
               AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
              THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
         END AS length_quality_r
  FROM m ORDER BY source
"""
