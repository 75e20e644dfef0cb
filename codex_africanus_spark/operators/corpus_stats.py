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
