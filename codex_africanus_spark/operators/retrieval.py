"""Text retrieval / collocation operators over the documents table.

Training-data pipelines need lightweight lexical retrieval beside the
embedding ANN tiers: BM25 keyword scoring (eval-set mining, targeted
corpus slicing), PMI collocations (tokenizer/merge-rule diagnostics),
character-trigram entropy (gibberish & boilerplate screening). All are
pure Column pipelines with exact DuckDB mirrors — the only float ops are
IEEE-exact divisions of identical doubles, and every ln() is quantized
onto a 1e6 fixed-point grid before any cross-row aggregation (the
engine-independence discipline of operators/corpus_stats.py).

Scale shape (100 TB): token explode → partial-agg groupBy per term/doc
(map-side combine), corpus scalars (N, avgdl) reduced once and broadcast,
top-k via a single window over term-cardinality aggregates — no
all-pairs, no driver loops, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from codex_africanus_spark.sources.tables import fan_out

_LQ = "1000000"  # ln/score quantization grid (1e6)

# Fixed keyword query for the BM25 registry entry (terms present in the
# synthetic corpus at varied document frequencies).
BM25_TERMS = ("spark", "query", "vector", "merge")
BM25_K1 = "1.2"
BM25_TOPK = 20
PMI_MIN_COUNT = 8
PMI_TOPK = 40


def _bm25_idf_q_expr(n_docs: str, df: str) -> str:
    """1e6-quantized BM25 idf — ONE text shared by the Spark expr and the
    DuckDB mirror so the arithmetic cannot fork."""
    return (
        f"CAST(ROUND(ln(((CAST({n_docs} - {df} AS DOUBLE) + 0.5)"
        f" / (CAST({df} AS DOUBLE) + 0.5)) + 1.0) * {_LQ}) AS BIGINT)"
    )


def _bm25_score_q_expr(idf_q: str, tf: str, dl: str, sum_dl: str,
                       n_docs: str) -> str:
    """1e6-quantized per-(doc, term) BM25 contribution (k1=1.2, b=0.75;
    1−b+b·dl/avgdl written as 0.25 + 0.75·dl/avgdl on both engines)."""
    avgdl = f"(CAST({sum_dl} AS DOUBLE) / CAST({n_docs} AS DOUBLE))"
    s = (
        f"(({idf_q} / {_LQ}.0) * (({tf} * 2.2)"
        f" / ({tf} + ({BM25_K1} * (0.25 + (0.75 * ({dl} / {avgdl})))))))"
    )
    return f"CAST(ROUND({s} * {_LQ}) AS BIGINT)"


def bm25_topk(documents: DataFrame, terms: tuple = BM25_TERMS,
              k: int = BM25_TOPK) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-k documents for a fixed term set.

    idf is quantized at 1e6 before the per-(doc, term) score; the score
    itself re-quantizes at 1e6 so the per-doc sum is an exact BIGINT
    reduction (order-free ⇒ partition-count invariant)."""
    docs = fan_out(documents).select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("dl")
    )
    scalars = F.broadcast(
        docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        )
    )
    tok = docs.select(
        "doc_id", "dl", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token").isin(*terms))
    tf = tok.groupBy("doc_id", "dl", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(scalars)
        .withColumn("idf_q", F.expr(_bm25_idf_q_expr("n_docs", "df")))
        .withColumn(
            "s_q",
            F.expr(_bm25_score_q_expr("idf_q", "tf", "dl", "sum_dl", "n_docs")),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("s_q").alias("score_q"),
    )
    # TakeOrdered top-k first (no single-partition shuffle of the full
    # per-doc frame), then rank the k survivors with a trivial window
    top = per_doc.orderBy(F.col("score_q").desc(), "doc_id").limit(k)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.col("score_q").desc(), "doc_id")),
    )
    return ranked.select(
        "rank", "doc_id", "n_terms",
        (F.col("score_q") / F.lit(1000000.0)).alias("bm25"),
    ).orderBy("rank")


def _bm25_sql(terms: tuple = BM25_TERMS, k: int = BM25_TOPK) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
  WITH docs AS (
    SELECT doc_id, text, len(string_split(text, ' ')) AS dl FROM documents
  ),
  scalars AS (
    SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM docs
  ),
  tok AS (
    SELECT doc_id, dl, unnest(string_split(text, ' ')) AS token FROM docs
  ),
  tf AS (
    SELECT doc_id, dl, token, COUNT(*) AS tf FROM tok
    WHERE token IN ({in_list})
    GROUP BY doc_id, dl, token
  ),
  df AS (
    SELECT token, COUNT(*) AS df FROM tf GROUP BY token
  ),
  scored AS (
    SELECT t.doc_id,
      {_bm25_score_q_expr(_bm25_idf_q_expr('s.n_docs', 'd.df'),
                          't.tf', 't.dl', 's.sum_dl', 's.n_docs')} AS s_q
    FROM tf t JOIN df d ON d.token = t.token, scalars s
  ),
  per_doc AS (
    SELECT doc_id, COUNT(*) AS n_terms, SUM(s_q) AS score_q
    FROM scored GROUP BY doc_id
  ),
  ranked AS (
    SELECT *, row_number() OVER (ORDER BY score_q DESC, doc_id) AS rank
    FROM per_doc
  )
  SELECT rank, doc_id, n_terms, score_q / 1000000.0 AS bm25
  FROM ranked WHERE rank <= {k} ORDER BY rank
"""


BM25_SQL = _bm25_sql()


def pmi_collocations(documents: DataFrame, min_count: int = PMI_MIN_COUNT,
                     k: int = PMI_TOPK) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information.

    PMI = ln(c12·N / (c1·c2)) computed as a sum/difference of four
    1e6-quantized ln terms (never a product of counts — no bigint
    overflow at any corpus size). c1/c2 are first-/second-position
    marginals over the bigram universe, so all four counts share one
    denominator N."""
    # split once per document; the transform lambda indexes the cached
    # array (re-splitting inside the lambda is O(tokens) per element)
    # docs need >= 2 tokens: sequence(1, size-1) DESCENDS for size 1 and
    # element_at then throws; the mirror filters identically
    bg = fan_out(documents).filter(
        F.size(F.split("text", " ")) >= 2
    ).select(
        F.split("text", " ").alias("w")
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " j -> concat_ws(' ', element_at(w, j), element_at(w, j + 1)))"
            )
        ).alias("bigram")
    ).select(
        "bigram",
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
    )
    c12 = bg.groupBy("bigram", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    n = F.broadcast(bg.agg(F.count(F.lit(1)).alias("n_bg")))

    def q(e: str) -> str:
        return f"CAST(ROUND(ln(CAST({e} AS DOUBLE)) * {_LQ}) AS BIGINT)"

    # c1/c2 are vocab-cardinality — no broadcast hint; AQE chooses the
    # join strategy (a forced broadcast here would OOM the driver on a
    # real corpus vocabulary). The 1-row N frame stays broadcast.
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(n)
        .withColumn(
            "pmi_q",
            F.expr(f"(({q('c12')} + {q('n_bg')}) - {q('c1')}) - {q('c2')}"),
        )
    )
    top = scored.orderBy(F.col("pmi_q").desc(), "bigram").limit(k)
    ranked = top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.col("pmi_q").desc(), "bigram"))
    )
    return ranked.select(
        "rank", "bigram", "c12",
        (F.col("pmi_q") / F.lit(1000000.0)).alias("pmi"),
    ).orderBy("rank")


def _pmi_sql(min_count: int = PMI_MIN_COUNT, k: int = PMI_TOPK) -> str:
    def q(e: str) -> str:
        return f"CAST(ROUND(ln(CAST({e} AS DOUBLE)) * {_LQ}) AS BIGINT)"

    return f"""
  WITH bg0 AS (
    SELECT unnest([concat_ws(' ', w[j], w[j+1])
                   for j in generate_series(1, len(w)-1)]) AS bigram
    FROM (SELECT string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 2)
  ),
  bg AS (
    SELECT bigram, string_split(bigram, ' ')[1] AS w1,
           string_split(bigram, ' ')[2] AS w2
    FROM bg0
  ),
  c12 AS (
    SELECT bigram, w1, w2, COUNT(*) AS c12 FROM bg
    GROUP BY bigram, w1, w2
  ),
  c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
  c2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY w2),
  n AS (SELECT COUNT(*) AS n_bg FROM bg),
  scored AS (
    SELECT b.bigram, b.c12,
           (({q('b.c12')} + {q('n.n_bg')}) - {q('c1.c1')}) - {q('c2.c2')} AS pmi_q
    FROM c12 b JOIN c1 ON c1.w1 = b.w1 JOIN c2 ON c2.w2 = b.w2, n
    WHERE b.c12 >= {min_count}
  ),
  ranked AS (
    SELECT *, row_number() OVER (ORDER BY pmi_q DESC, bigram) AS rank
    FROM scored
  )
  SELECT rank, bigram, c12, pmi_q / 1000000.0 AS pmi
  FROM ranked WHERE rank <= {k} ORDER BY rank
"""


PMI_SQL = _pmi_sql()


def char_trigram_entropy(documents: DataFrame) -> DataFrame:
    """Per-document character-trigram Shannon entropy (nats) — the
    gibberish/boilerplate screen: natural text sits in a band, random
    strings score high, template spam scores low.

    H = ln(Nd) − (Σ c·ln c)/Nd is assembled from exact integers:
    hq = q(ln Nd)·Nd − Σ c·q(ln c) with q on the 1e6 grid, then one
    division — identical in both engines."""
    tri = fan_out(documents).filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " j -> substring(text, j, 3))"
            )
        ).alias("tri"),
    )
    counts = tri.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("nd"),
        F.count(F.lit(1)).alias("n_distinct_tri"),
        F.sum(
            F.expr(f"c * CAST(ROUND(ln(CAST(c AS DOUBLE)) * {_LQ}) AS BIGINT)")
        ).alias("sq"),
    )
    hq = F.expr(
        f"CAST(ROUND(ln(CAST(nd AS DOUBLE)) * {_LQ}) AS BIGINT) * nd - sq"
    )
    # quantize-form final rounding (r8 sf0.1 sweep): F.round goes through
    # an EXACT BigDecimal of the double while DuckDB ROUND(x, 9) rounds a
    # double product — three sf0.1 docs landed on opposite sides of a
    # 9-dp boundary. round(x*1e9)/1e9 evaluates identically in both.
    from codex_africanus_spark.functions.deterministic import quantize

    ent = hq / (F.lit(1000000.0) * F.col("nd"))
    return per_doc.select(
        "doc_id",
        "n_distinct_tri",
        (quantize(ent, 1e9) / F.lit(1e9)).alias("trigram_entropy"),
    ).orderBy("doc_id")


CHAR_TRIGRAM_ENTROPY_SQL = f"""
  WITH tri AS (
    SELECT doc_id,
           unnest([substr(text, j, 3)
                   for j in generate_series(1, len(text)-2)]) AS tri
    FROM documents WHERE len(text) >= 3
  ),
  counts AS (
    SELECT doc_id, tri, COUNT(*) AS c FROM tri GROUP BY doc_id, tri
  ),
  per_doc AS (
    SELECT doc_id, SUM(c) AS nd, COUNT(*) AS n_distinct_tri,
           SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE)) * {_LQ}) AS BIGINT)) AS sq
    FROM counts GROUP BY doc_id
  )
  SELECT doc_id, n_distinct_tri,
         CAST(ROUND((CAST(ROUND(ln(CAST(nd AS DOUBLE)) * {_LQ}) AS BIGINT) * nd - sq)
               / (1000000.0 * nd) * 1000000000.0) AS BIGINT) / 1000000000.0 AS trigram_entropy
  FROM per_doc ORDER BY doc_id
"""
