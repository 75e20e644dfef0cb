"""Embedding similarity / ANN index queries (cosine, LSH, IVF, PQ,
semantic dedup, contrastive mining). Mechanically moved out of the
former queries.py (round 9)."""


from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from codex_africanus_spark.sources import tables
from codex_africanus_spark.sources.tables import load
from codex_africanus_spark.operators import similarity as sim_op  # noqa: E402
from codex_africanus_spark.operators import corpus_stats as cstat_op  # noqa: E402

from ._core import (  # noqa: F401
    register,
)

@register("embedding_cosine_topk", sim_op.COSINE_TOPK_SQL())
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 neighbours (quantized dot products)."""
    return sim_op.cosine_topk(load(spark, "embeddings", sf_dir)).orderBy("query_id", "rank")


@register("ann_lsh_bucketed_topk", sim_op.ANN_LSH_SQL())
def ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH buckets + in-bucket rerank."""
    return sim_op.ann_lsh_topk(load(spark, "embeddings", sf_dir)).orderBy("query_id", "rank")


@register("ann_ivf_topk", sim_op.IVF_SQL())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN tier: deterministic fixed-point coarse quantizer
    (broadcast), nearest-cell assignment, 2-probe exact rerank —
    the inverted-file scale path beside the LSH one, exactly oracled
    including the learned centroids."""
    return sim_op.ivf_topk(load(spark, "embeddings", sf_dir)).orderBy(
        "query_id", "rank"
    )


@register("ann_ivf_persisted_topk", sim_op.IVF_SQL())
def ann_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once/probe-many IVF: the quantizer + assignment tables are
    committed through the transactional snapshot sink on first use (or
    when stale) and every probe answers from the persisted index —
    no per-query index build (the deployment SCALE.md describes; the
    probe plan is two hash exchanges and never shuffles the assignment
    fact table). Exactly the same result as `ann_ivf_topk` because the
    index is deterministic fixed-point — the DuckDB twin recomputes it
    inline and hash-matches."""
    import os
    import tempfile

    import hashlib

    emb = load(spark, "embeddings", sf_dir)
    # key by the FULL path (hashed), not the basename: two corpora named
    # sf0.01 under different parents must not share an index root
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"{tempfile.gettempdir()}/cas_ann_ivf/{tag}"
    return sim_op.ivf_persisted_topk(spark, emb, root).orderBy("query_id", "rank")


@register("embedding_near_dup_pairs", sim_op.NEAR_DUP_SQL(0.35))
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup suite): LSH-bucket
    candidate self-join, exact quantized-cosine filter at 0.35."""
    return sim_op.near_dup_pairs(
        load(spark, "embeddings", sf_dir), threshold=0.35
    ).orderBy("id_a", "id_b")


def _ann_recall_oracle(modulus: int = 125, k: int = 3) -> str:
    from codex_africanus_spark.operators.similarity import (
        _lsh_fp_sql,
        _lsh_np_cte,
        _qdot_sql,
    )

    fp = _lsh_fp_sql()
    dot = _qdot_sql("q.embedding", "c.embedding")
    qq = _qdot_sql("q.embedding", "q.embedding")
    cc = _qdot_sql("c.embedding", "c.embedding")
    return f"""
      WITH {_lsh_np_cte()},
      exact_ranked AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({dot} / (sqrt({qq}) * sqrt({cc})), 9) DESC, c.vec_id
               ) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id % {modulus} = 0 AND q.vec_id <> c.vec_id
      ),
      exact_topk AS (SELECT query_id, neighbor_id FROM exact_ranked WHERE rank <= {k}),
      b AS (SELECT vec_id, embedding, CAST({fp} AS INT) AS bucket FROM embeddings),
      ann_ranked AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({dot} / (sqrt({qq}) * sqrt({cc})), 9) DESC, c.vec_id
               ) AS rank
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id % {modulus} = 0
      ),
      ann_topk AS (SELECT query_id, neighbor_id FROM ann_ranked WHERE rank <= {k})
      SELECT e.query_id,
             COUNT(a.neighbor_id) AS n_hits,
             round(COUNT(a.neighbor_id) / CAST({k} AS DOUBLE), 6) AS recall_at_k
      FROM exact_topk e
      LEFT JOIN ann_topk a USING (query_id, neighbor_id)
      GROUP BY e.query_id
      ORDER BY e.query_id
    """


@register("ann_lsh_recall_eval", _ann_recall_oracle())
def ann_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the LSH-bucketed ANN tier against the exact brute-force
    top-3, per probe — the standard ANN quality gate a production
    similarity index ships with. Reuses both tiers' deterministic
    ranking, so the measurement itself is exactly oracle-checkable.
    EVAL-ONLY pair-space note: the exact-truth side is brute-force
    O(|corpus|·|probes|) — run on a bounded/sampled probe stratum, never
    the full corpus (the production path is the ANN tier itself)."""
    emb = load(spark, "embeddings", sf_dir)
    exact = sim_op.cosine_topk(emb, 125, 3).select("query_id", "neighbor_id")
    ann = sim_op.ann_lsh_topk(emb, 125, 3).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / F.lit(3.0), 6).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


_ANN_IVF_RECALL_ORACLE = f"""
  WITH exact_topk AS (
    SELECT query_id, neighbor_id
    FROM ({sim_op.COSINE_TOPK_SQL(125, 3)})
  ),
  ivf_topk AS (
    SELECT query_id, neighbor_id
    FROM ({sim_op.IVF_SQL(125, 3)})
  )
  SELECT e.query_id,
         COUNT(a.neighbor_id) AS n_hits,
         round(COUNT(a.neighbor_id) / CAST(3 AS DOUBLE), 6) AS recall_at_k
  FROM exact_topk e
  LEFT JOIN ivf_topk a USING (query_id, neighbor_id)
  GROUP BY e.query_id
  ORDER BY e.query_id
"""


@register("ann_ivf_recall_eval", _ANN_IVF_RECALL_ORACLE)
def ann_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF ANN tier against the exact brute-force top-3,
    per probe — the same quality gate as ann_lsh_recall_eval for the
    inverted-file scale path, so BOTH ANN tiers ship a driver-checkable
    recall measurement. Deterministic end-to-end (fixed-point centroids
    + quantized cosine) ⇒ exactly oracled. EVAL-ONLY pair-space note:
    the exact-truth side is brute-force O(|corpus|·|probes|) — bounded
    probe stratum only, never the full corpus."""
    emb = load(spark, "embeddings", sf_dir)
    exact = sim_op.cosine_topk(emb, 125, 3).select("query_id", "neighbor_id")
    ivf = sim_op.ivf_topk(emb, 125, 3).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / F.lit(3.0), 6).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


@register(
    "embedding_centroid_outliers",
    """
  WITH e AS (
    SELECT vec_id, label,
           [CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding] AS xq
    FROM embeddings
  ),
  comp AS (
    SELECT label, i, SUM(xq[i]) AS s, COUNT(*) AS n
    FROM e, UNNEST(generate_series(1, 64)) AS t(i)
    GROUP BY label, i
  ),
  cent AS (
    SELECT label, list(cq ORDER BY i) AS cq, MAX(n) AS n_label
    FROM (SELECT label, i, n,
                 CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT) AS cq
          FROM comp)
    GROUP BY label
  ),
  dist AS (
    SELECT e.vec_id, e.label,
           list_sum([(e.xq[i] - c.cq[i]) * (e.xq[i] - c.cq[i])
                     FOR i IN generate_series(1, 64)]) AS d2q,
           c.n_label
    FROM e JOIN cent c USING (label)
  ),
  lab AS (SELECT label, SUM(d2q) AS sum_d2 FROM dist GROUP BY label)
  SELECT d.vec_id, d.label,
         round(d.d2q / 1e12, 6) AS centroid_dist2
  FROM dist d JOIN lab l USING (label)
  WHERE d.d2q * d.n_label * 100 > 108 * l.sum_d2
  ORDER BY d.vec_id
    """,
)
def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QC screen: vectors whose squared distance to their
    label's centroid exceeds 1.08x the label mean — the malformed/mislabeled
    vector filter before similarity indexing. All arithmetic is
    fixed-point (1e-6 components, floored integer centroid, integer
    cross-multiplied threshold) so the screen is engine-exact with no
    float-summation order sensitivity. Centroids are a (label, dim)
    partial-agg shuffle; the per-label centroid table broadcasts back."""
    emb = load(spark, "embeddings", sf_dir)
    e = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("xq"),
    )
    comp = (
        e.select("label", F.posexplode(F.col("xq")).alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    cent = (
        comp.withColumn(
            "cq", F.floor(F.col("s").cast("double") / F.col("n")).cast("long")
        )
        .groupBy("label")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(i, cq))), p -> p.cq)").alias(
                "cq"
            ),
            F.max("n").alias("n_label"),
        )
    )
    dist = (
        e.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.expr(
                "aggregate(zip_with(xq, cq, (a, b) -> (a - b) * (a - b)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("d2q"),
            "n_label",
        )
    )
    lab = dist.groupBy("label").agg(F.sum("d2q").alias("sum_d2"))
    return (
        dist.join(F.broadcast(lab), "label")
        .filter(F.col("d2q") * F.col("n_label") * 100 > 108 * F.col("sum_d2"))
        .select(
            "vec_id",
            "label",
            F.round(F.col("d2q") / F.lit(1e12), 6).alias("centroid_dist2"),
        )
        .orderBy("vec_id")
    )


@register("semantic_dedup_embeddings", sim_op.SEMDEDUP_SQL())
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): deterministic
    IVF cells bound the pairwise cosine check to cluster-mates; a vector
    with a kept lower-id near-twin (quantized cosine >= threshold) is
    dropped, its canonical_id pointing at the keeper. Cluster-bounded
    self-join co-partitioned on cid — no corpus cross join. r13: cell
    count follows the sqrt-capped quantizer rule and the assignment
    runs map-only Arrow past the pair gate (the r13d sf10 bench caught
    the pure-N/64 rule's Θ(N²/64) assignment on this very query) —
    total build cost O(N^1.5) at 100 TB."""
    return sim_op.semantic_dedup(load(spark, "embeddings", sf_dir)).orderBy(
        "vec_id"
    )


@register("kmeans_lloyd_stats", sim_op.KMEANS_SQL())
def kmeans_lloyd_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over embeddings: hash-seeded centroids (IVF iteration 0)
    + 2 full Lloyd rounds + final per-cluster size/inertia — the
    clustering primitive under IVF builds and SemDeDup cells, as an
    iterative driver loop (k-row centroid broadcast per round, hash-agg
    argmin, (cell,dim)-cardinality update agg). 1e-6-quantized centroid
    sums and 1e-12-quantized distances make the inertia an exact BIGINT,
    mirrored by an unrolled-CTE oracle."""
    return sim_op.kmeans_lloyd_stats(load(spark, "embeddings", sf_dir))


@register("kmeans_nscaled_stats", sim_op.KMEANS_NSCALED_SQL())
def kmeans_nscaled_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means with the cell count N-SCALED by the IVF quantizer rule
    (r13: sqrt-capped — k = min(ceil(n/CELL_TARGET), ceil(sqrt(n))),
    `_ivf_n_cells`): cluster population tracks CELL_TARGET up to the
    n = CELL_TARGET² crossover, then grows as sqrt(n) so each Lloyd
    round's n x k assignment stays O(n^1.5) instead of Theta(n²/64) —
    the 100 TB corpus-bucketing form. Same exact fixed-point Lloyd
    rounds as kmeans_lloyd_stats; the oracle N-scales in its own `p`
    CTE (same formula) so both engines derive k from the data."""
    emb = load(spark, "embeddings", sf_dir)
    return sim_op.kmeans_lloyd_stats(emb, k=sim_op._ivf_n_cells(tables.fast_row_count(emb)))


@register("ann_pq_persisted_topk", sim_op.PQ_SQL())
def ann_pq_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once/probe-many PQ ANN: codebook + per-vector codes served
    from the snapshot sink (META-fingerprinted, same contract as the
    persisted IVF tier); only the probe subset's ADC distance tables
    are built at query time. Same exact oracle as ann_pq_topk — the
    index is deterministic fixed-point."""
    import os
    import tempfile

    import hashlib

    emb = load(spark, "embeddings", sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"{tempfile.gettempdir()}/cas_ann_pq/{tag}"
    return sim_op.pq_persisted_topk(spark, emb, root).orderBy("query_id", "rank")


@register("ann_pq_appended_topk", sim_op.PQ_APPEND_SQL())
def ann_pq_appended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-PQ index UPDATE path (r8 verdict item 7 — the PQ mirror
    of ann_ivf_appended_topk): the base corpus (vec_id % 10 != 0) builds
    the codebook + codes once; the held-out batch APPENDS via targeted
    encoding against the COMMITTED codebook (O(batch x M x K) broadcast
    job, no retrain, no corpus rescan — faiss IndexPQ.add() semantics),
    with the content checksum rolled forward additively. Probes then
    serve base + appended codes from the snapshot through the standard
    ADC -> shortlist -> exact-rerank pipeline. Crash-safe via the
    'pending-append' source digest: dying between build and append reads
    as stale and rebuilds. The oracle recomputes the same semantics
    brute-force (base-only codebook, full-corpus encoding)."""
    import hashlib
    import os as _q9o
    import tempfile as _q9t

    emb = load(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 10 != 0)
    newv = emb.filter(F.col("vec_id") % 10 == 0)
    tag = hashlib.md5(_q9o.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"{_q9t.gettempdir()}/cas_pq_append/{tag}"
    src = sim_op._source_fingerprint(emb)
    consts = sim_op._pq_fingerprint(0, 0)[3]
    if not sim_op._index_fresh_source(
        spark, root, sim_op.PQ_INDEX_FORMAT, consts, src
    ):
        sim_op.build_pq_index(base, root, source_fp="pending-append")
        sim_op.pq_index_append(spark, root, newv, source_fp=src)
    return sim_op.pq_persisted_topk(spark, emb, root).orderBy(
        "query_id", "rank"
    )


@register("ann_pq_topk", sim_op.PQ_SQL())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011 structure) with
    asymmetric distance: vectors compress to M=8 sub-space code ids
    against deterministic codebooks; probes precompute an M x K distance
    table (broadcast) and candidates are scored by table-lookup sums —
    the scan never touches candidate vectors. The ADC shortlist (top-50)
    is then exactly reranked on full vectors (50 exact distances per
    probe — the production two-stage shape; shortlist recall 0.75 on the
    near-uniform test vectors). Third ANN tier beside LSH buckets and
    IVF cells; exact fixed-point arithmetic end to end -> oracled."""
    return sim_op.pq_topk(load(spark, "embeddings", sf_dir)).orderBy(
        "query_id", "rank"
    )


def _ann_root(kind: str, sf_dir: str) -> str:
    """Persisted-index root for a corpus: keyed by the FULL sf_dir path
    (hashed) so two corpora with the same basename never share an index."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"{tempfile.gettempdir()}/cas_ann_{kind}/{tag}"


@register("ann_recall_vs_probes_sweep", sim_op.RECALL_VS_PROBES_SQL())
def ann_recall_vs_probes_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 vs n_probes tuning curve over the PERSISTED IVF index
    (faiss nprobe sweep): one exact brute-force pass, then each probe
    level answers from the committed snapshot — the sweep costs probes,
    not rebuilds. Deterministic fixed-point end-to-end, so the whole
    accuracy/cost curve is exactly oracled."""
    emb = load(spark, "embeddings", sf_dir)
    return sim_op.ivf_recall_vs_probes(spark, emb, _ann_root("ivf", sf_dir))


@register("ann_ivf_cell_balance", sim_op.IVF_CELL_BALANCE_SQL())
def ann_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health report from the persisted assignment: per-cell
    occupancy, share, and integer-exact skew vs the balanced mean. A
    probe-only read of the snapshot — the corpus is never rescanned."""
    emb = load(spark, "embeddings", sf_dir)
    return sim_op.ivf_cell_balance(spark, emb, _ann_root("ivf", sf_dir))


@register("ann_pq_distortion_report", sim_op.PQ_DISTORTION_SQL())
def ann_pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ quantization distortion (codebook quality):
    mean squared distance to the nearest code per subspace, over the
    shared _pq_codebook/_pq_dists kernels the ANN tiers serve. Sums
    accumulate in decimal(38,0) (HUGEINT twin) — corpus-scale-safe."""
    emb = load(spark, "embeddings", sf_dir)
    return sim_op.pq_distortion_report(emb)


@register("embedding_dim_stats", cstat_op.EMBEDDING_DIM_STATS_SQL)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding mean/variance (pre-whitening pass) with
    decimal(38,0)-accumulated fixed-point sums — corpus-scale-safe."""
    return cstat_op.embedding_dim_stats(load(spark, "embeddings", sf_dir))


@register("ann_sq8_recall_eval", sim_op.SQ8_RECALL_SQL())
def ann_sq8_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of int8 scalar quantization (faiss SQ8: per-dim min/max
    bounds, 8-bit codes, exact-integer code distances) against the exact
    quantized L2 top-5 — the 4x-memory-reduction ANN tier beside LSH,
    IVF and PQ, with its quality gate driver-checked like the others.
    EVAL-ONLY pair-space note: exact-truth side is brute-force — bounded
    probe stratum only at corpus scale."""
    return sim_op.sq8_recall_eval(load(spark, "embeddings", sf_dir))


@register("embedding_pca_power_iteration", sim_op.PCA_POWER_SQL())
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction + L∞ eigenvalue estimate of the
    embedding second-moment matrix by 24 exact-replay power-iteration
    steps — the anisotropy diagnostic for the ANN tiers. Distributed
    d²-cell moment aggregate, then a Gauss-Newton-class driver loop on
    the collected 64×64 integer matrix; the DuckDB oracle replays every
    step bit-for-bit through a recursive CTE carrying the iterate as a
    BIGINT list."""
    return sim_op.pca_power_iteration(load(spark, "embeddings", sf_dir))


@register("ann_ivf_appended_topk", sim_op.IVF_APPEND_SQL())
def ann_ivf_appended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-ANN index UPDATE path (r7 verdict #7 candidate): the
    base corpus builds the IVF index once; a later vector batch APPENDS
    via targeted cell assignment against the committed centroids
    (O(batch) broadcast job, no rebuild, no corpus rescan — faiss
    IndexIVF.add() semantics), with the content checksum rolled forward
    additively. Probes then serve base + appended vectors from the
    snapshot. Crash-safe: the base build commits a 'pending-append'
    source digest, so dying between build and append reads as stale and
    rebuilds, never serving a base-only index as complete. The oracle
    recomputes the same semantics brute-force (base-only centroids,
    full-corpus assignment)."""
    import hashlib
    import os as _q8o
    import tempfile as _q8t

    emb = load(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") % 10 != 0)
    newv = emb.filter(F.col("vec_id") % 10 == 0)
    tag = hashlib.md5(_q8o.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"{_q8t.gettempdir()}/cas_ivf_append/{tag}"
    src = sim_op._source_fingerprint(emb)
    consts = sim_op._ivf_fingerprint(0, 0)[3]
    if not sim_op._index_fresh_source(
        spark, root, sim_op.IVF_INDEX_FORMAT, consts, src
    ):
        sim_op.build_ivf_index(base, root, source_fp="pending-append")
        sim_op.ivf_index_append(spark, root, newv, source_fp=src)
    return sim_op.ivf_probe_topk(spark, root).orderBy("query_id", "rank")


@register("ann_ivf_pq_persisted_topk", sim_op.IVF_PQ_SQL())
def ann_ivf_pq_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN serving shape (faiss IndexIVFPQ): IVF coarse
    quantizer prunes to n_probe cells, PQ compact codes score the
    cell candidates by broadcast table-lookup (never touching vectors),
    and only the PQ_SHORTLIST best rerank on exact full-vector
    distances — all three stages answered from PERSISTED snapshot
    indexes with driver-side digest freshness. Exact fixed-point
    arithmetic end-to-end, so even the combined approximate ranks are
    hash-checked against the DuckDB replay."""
    import hashlib
    import os as _q7os
    import tempfile as _q7tmp

    emb = load(spark, "embeddings", sf_dir)
    tag = hashlib.md5(_q7os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"{_q7tmp.gettempdir()}/cas_ann_ivfpq/{tag}"
    return sim_op.ivf_pq_persisted_topk(spark, emb, root).orderBy(
        "query_id", "rank"
    )


def _emb_norm_mad_oracle() -> str:
    nq = sim_op._qdot_sql("embedding", "embedding")
    return f"""
      WITH norms AS (
        SELECT vec_id, label, CAST({nq} AS BIGINT) AS norm_q FROM embeddings
      ),
      med AS (SELECT quantile_cont(norm_q, 0.5) AS med FROM norms),
      dev AS (
        SELECT n.vec_id, n.label, n.norm_q, n.norm_q - m.med AS dev
        FROM norms n CROSS JOIN med m
      ),
      mad AS (SELECT quantile_cont(abs(dev), 0.5) AS mad FROM dev)
      SELECT d.vec_id, d.label, d.norm_q, d.dev,
             CAST(abs(d.dev) > 3 * m.mad AS INT) AS is_outlier
      FROM dev d CROSS JOIN mad m
      ORDER BY d.vec_id
    """


@register("embedding_norm_outliers", _emb_norm_mad_oracle())
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm outliers by the robust median + 3×MAD rule —
    the vector-store ingestion gate (truncated/degenerate embeddings
    show up as norm outliers long before cosine search degrades).
    Norms are EXACT fixed-point integers (the shared quantized-dot
    kernel), so medians interpolate on the exact .0/.5 grid and the
    flag decision cannot fork engines. Two 1-row broadcast scalars;
    the embedding frame is scanned, never shuffled."""
    emb = load(spark, "embeddings", sf_dir)
    norms = emb.select(
        "vec_id", "label",
        sim_op._qdot("embedding", "embedding").alias("norm_q"),
    )
    med = norms.agg(F.expr("percentile(norm_q, 0.5)").alias("med"))
    dev = norms.crossJoin(F.broadcast(med)).select(
        "vec_id", "label", "norm_q",
        (F.col("norm_q") - F.col("med")).alias("dev"),
    )
    mad = dev.agg(F.expr("percentile(abs(dev), 0.5)").alias("mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "vec_id", "label", "norm_q", "dev",
            (F.abs(F.col("dev")) > 3 * F.col("mad")).cast("int").alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


def _cell_purity_oracle() -> str:
    # recompute the IVF assignment inline (the persisted index is
    # engine-side plumbing; the oracle replays the same fixed-point math)
    cdist = (
        f"list_sum(list_transform(list_zip(e.embedding, c.centroid), x -> "
        f"CAST(ROUND((CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2])"
        f" * {sim_op.DOT_SCALE}) AS BIGINT)))"
    )
    return f"""
      WITH p AS (
        SELECT {sim_op._ivf_cells_sql()}
          AS cells
        FROM embeddings
      ),
      dims AS (
        SELECT vec_id % (SELECT cells FROM p) AS cid,
               unnest(generate_series(0, len(embedding) - 1)) AS pos,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS val
        FROM embeddings
      ),
      per_dim AS (
        SELECT cid, pos, SUM(CAST(ROUND(val * {sim_op.CSCALE}) AS BIGINT)) AS vq,
               COUNT(*) AS n
        FROM dims GROUP BY cid, pos
      ),
      cent AS (
        SELECT cid, list(vq / (CAST({sim_op.CSCALE} AS DOUBLE) * n) ORDER BY pos)
          AS centroid
        FROM per_dim GROUP BY cid
      ),
      assign AS (
        SELECT vec_id, cid FROM (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                                    ORDER BY {cdist}, c.cid) AS rk
          FROM embeddings e, cent c
        ) WHERE rk = 1
      ),
      lab AS (
        SELECT a.cid, e.label, COUNT(*) AS n
        FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
        GROUP BY 1, 2
      ),
      top AS (
        SELECT cid, label AS top_label, n AS top_n,
               row_number() OVER (PARTITION BY cid
                                  ORDER BY n DESC, label) AS rk
        FROM lab
      )
      SELECT l.cid, CAST(SUM(l.n) AS BIGINT) AS n_vecs,
             MIN(t.top_label) AS top_label,
             CAST(MIN(t.top_n) AS BIGINT) AS top_n,
             round(MIN(t.top_n) / CAST(SUM(l.n) AS DOUBLE), 9) AS purity
      FROM lab l JOIN (SELECT * FROM top WHERE rk = 1) t ON t.cid = l.cid
      GROUP BY l.cid
      ORDER BY l.cid
    """


@register("ivf_cell_label_purity", _cell_purity_oracle())
def ivf_cell_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality audit: per persisted-IVF cell, the majority
    label and its purity — how well the coarse quantizer's cells align
    with the semantic labels (low purity ⇒ the quantizer mixes classes
    and recall falls at small n_probe). Answered from the committed
    assignment table joined to the label column (warm path: no
    quantizer rebuild); majority via one (cell, label) rollup +
    diagnostic-cardinality window."""
    import hashlib
    import os as _q7os
    import tempfile as _q7tmp

    emb = load(spark, "embeddings", sf_dir)
    tag = hashlib.md5(_q7os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = f"{_q7tmp.gettempdir()}/cas_ann_ivf/{tag}"
    sim_op._ensure_ivf_index(spark, emb, root)
    from codex_africanus_spark.sources import snapshot as snap

    assign = snap.read_snapshot(spark, f"{root}/assign").select("vec_id", "cid")
    # no broadcast hint: the label frame is corpus-sized — a vec_id
    # equi-join (co-partitionable/bucketable at scale) is the honest
    # plan; AQE broadcasts only when the corpus is actually small
    lab = (
        assign.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = (
        lab.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("cid").orderBy(F.col("n").desc(), F.col("label"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("cid", F.col("label").alias("top_label"), F.col("n").alias("top_n"))
    )
    return (
        lab.groupBy("cid")
        .agg(F.sum("n").alias("n_vecs"))
        .join(top, "cid")
        .select(
            "cid", "n_vecs", "top_label", "top_n",
            F.round(F.col("top_n") / F.col("n_vecs").cast("double"), 9).alias(
                "purity"
            ),
        )
        .orderBy("cid")
    )


def _knn_degree_sql() -> str:
    pairs = sim_op.NEAR_DUP_SQL(0.9).replace("ORDER BY id_a, id_b", "")
    return f"""
      WITH pairs AS ({pairs}),
      deg AS (
        SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (
          SELECT id_a AS vec_id FROM pairs
          UNION ALL
          SELECT id_b AS vec_id FROM pairs
        ) GROUP BY vec_id
      ),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings),
      hist AS (
        SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg GROUP BY degree
        UNION ALL
        SELECT 0 AS degree,
               (SELECT n_vecs FROM tot) - (SELECT CAST(COUNT(*) AS BIGINT) FROM deg)
      )
      SELECT degree, n_nodes FROM hist WHERE n_nodes > 0 ORDER BY degree
    """


@register("knn_graph_degree_stats", _knn_degree_sql())
def knn_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-graph degree histogram over the ≥0.9-cosine near-dup
    graph — the health check a connected-components dedup needs BEFORE
    running (a heavy-tailed degree distribution means one template hub
    will chain half the corpus into one cluster). Reuses the bucketed
    near-dup pair generation; degrees reduce at node cardinality."""
    emb = load(spark, "embeddings", sf_dir)
    pairs = sim_op.near_dup_pairs(emb, threshold=0.9)
    deg = (
        pairs.select(F.col("id_a").alias("vec_id"))
        .unionAll(pairs.select(F.col("id_b").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    totals = emb.agg(F.count(F.lit(1)).alias("n_vecs")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_connected"))
    )
    zero = totals.select(
        F.lit(0).cast("long").alias("degree"),
        (F.col("n_vecs") - F.col("n_connected")).alias("n_nodes"),
    )
    return (
        hist.unionByName(zero)
        .filter(F.col("n_nodes") > 0)
        .orderBy("degree")
    )


def _triangle_census_sql() -> str:
    pairs = sim_op.NEAR_DUP_SQL(0.35).replace("ORDER BY id_a, id_b", "")
    return f"""
      WITH pairs AS ({pairs}),
      e AS (SELECT id_a, id_b FROM pairs),
      tri AS (
        SELECT ab.id_a AS a, ab.id_b AS b, bc.id_b AS c
        FROM e ab JOIN e bc ON bc.id_a = ab.id_b
        WHERE EXISTS (SELECT 1 FROM e ac
                      WHERE ac.id_a = ab.id_a AND ac.id_b = bc.id_b)
      ),
      nodes AS (SELECT id_a AS v FROM e UNION SELECT id_b FROM e),
      pernode AS (
        SELECT n.v, CAST(COUNT(t.v) AS BIGINT) AS n_tri
        FROM nodes n LEFT JOIN (
          SELECT a AS v FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri
        ) t ON t.v = n.v
        GROUP BY n.v
      )
      SELECT n_tri, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM pernode GROUP BY n_tri ORDER BY n_tri
    """


@register("near_dup_triangle_census", _triangle_census_sql())
def near_dup_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the 0.35-cosine near-dup graph — the
    clustering-coefficient precursor a dedup pipeline reads to
    distinguish genuine duplicate CLIQUES (template families — safe to
    collapse to one keeper) from star-shaped hub chains (a promiscuous
    boilerplate doc linking unrelated texts — collapsing those loses
    real data). Plan: the canonical a<b edge list self-joins once on
    the shared middle node (wedges), a leftsemi probe against the edge
    list closes them, and each triangle credits its three corners —
    edge-grain joins co-partitioned on node keys, never touching the
    corpus again (edges come from the shared LSH-bucketed candidate
    kernel). Histogram output is node-bounded."""
    emb = load(spark, "embeddings", sf_dir)
    e = sim_op.near_dup_pairs(emb, threshold=0.35).select("id_a", "id_b")
    wedge = (
        e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .join(
            e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c")),
            "b",
        )
    )
    tri = wedge.join(
        e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c")),
        ["a", "c"],
        "leftsemi",
    )
    corners = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    nodes = (
        e.select(F.col("id_a").alias("v"))
        .unionByName(e.select(F.col("id_b").alias("v")))
        .distinct()
    )
    pernode = nodes.join(corners, "v", "left").select(
        "v", F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri")
    )
    return (
        pernode.groupBy("n_tri")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("n_tri")
    )


@register("contrastive_triplet_mining", sim_op.TRIPLETS_SQL())
def contrastive_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive-training triplets over the embedding
    corpus: per anchor the most-similar same-label positive, the hardest
    other-label negative, and the FaceNet semi-hard negative (hardest
    negative strictly below the positive similarity). Argmaxes are
    integer MAX over sim-major packs — no per-anchor row_number shuffle;
    anchors broadcast against the corpus, so the mining pass is a
    map-side scan at any corpus size."""
    emb = load(spark, "embeddings", sf_dir)
    return sim_op.contrastive_triplets(emb)


def _label_centroid_oracle() -> str:
    from codex_africanus_spark.operators.similarity import CSCALE, DOT_SCALE

    return f"""
      WITH dims AS (
        SELECT label,
               unnest(generate_series(0, len(embedding) - 1)) AS pos,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS val
        FROM embeddings
      ),
      per_dim AS (
        SELECT label, pos,
               SUM(CAST(ROUND(val * {CSCALE}) AS BIGINT)) AS vq,
               COUNT(*) AS n
        FROM dims GROUP BY label, pos
      ),
      cent AS (
        SELECT label,
               list(vq / (CAST({CSCALE} AS DOUBLE) * n) ORDER BY pos) AS c
        FROM per_dim GROUP BY label
      ),
      pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               list_sum(list_transform(list_zip(a.c, b.c),
                 x -> CAST(ROUND(x[1] * x[2] * {DOT_SCALE}) AS BIGINT))) AS dot,
               list_sum(list_transform(list_zip(a.c, a.c),
                 x -> CAST(ROUND(x[1] * x[2] * {DOT_SCALE}) AS BIGINT))) AS na,
               list_sum(list_transform(list_zip(b.c, b.c),
                 x -> CAST(ROUND(x[1] * x[2] * {DOT_SCALE}) AS BIGINT))) AS nb
        FROM cent a JOIN cent b ON a.label < b.label
      )
      SELECT label_a, label_b,
             round(dot / (sqrt(na) * sqrt(nb)), 9) AS centroid_cosine
      FROM pairs ORDER BY label_a, label_b
    """


@register("label_centroid_similarity_matrix", _label_centroid_oracle())
def label_centroid_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-similarity map: per-label embedding centroids (exact
    fixed-point means, the IVF quantizer arithmetic keyed by label) and
    the pairwise cosine between them — the matrix a mixture designer
    reads to see which sources/domains overlap in embedding space. The
    corpus collapses in one posexplode partial agg; the pair join runs
    on the label-dimension frame."""
    from codex_africanus_spark.operators.similarity import CSCALE, _qdot

    emb = load(spark, "embeddings", sf_dir)
    dims = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    per_dim = dims.groupBy("label", "pos").agg(
        F.sum(
            F.expr(f"CAST(ROUND(CAST(val AS DOUBLE) * {CSCALE}) AS BIGINT)")
        ).alias("vq"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = per_dim.groupBy("label").agg(
        F.expr(
            f"transform(array_sort(collect_list(struct(pos, vq, n))), "
            f"x -> x.vq / (CAST({CSCALE} AS DOUBLE) * x.n))"
        ).alias("c")
    )
    a = cent.select(F.col("label").alias("label_a"), F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    pairs = a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
    dot = _qdot("ca", "cb").cast("double")
    na = _qdot("ca", "ca").cast("double")
    nb = _qdot("cb", "cb").cast("double")
    return pairs.select(
        "label_a",
        "label_b",
        F.round(dot / (F.sqrt(na) * F.sqrt(nb)), 9).alias("centroid_cosine"),
    ).orderBy("label_a", "label_b")


@register("pq_codebook_retrain_drift", sim_op.PQ_RETRAIN_DRIFT_SQL())
def pq_codebook_retrain_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook maintenance audit (r9 verdict candidate 3): one Lloyd
    refinement step over the committed codebook — per-(subspace, code)
    membership, inflow from other seed cells, 1e-6-grid squared centroid
    drift, and the stale flag. Fact-scale work is one assignment join +
    one (m, code, j)-grain agg; the report is a fixed M×K = 256 rows at
    any corpus size (the PCA-power-iteration shape)."""
    return sim_op.pq_codebook_retrain_drift(load(spark, "embeddings", sf_dir))


# ---------------------------------------------------------------------------
# r10: cross-modal retrieval eval (r9 verdict candidate 5) — a TEXT
# query retrieves documents through the embedding index: probe docs
# bridge to their encoded vectors (doc_id = vec_id, the encoded-corpus
# contract), the IVF ANN tier retrieves neighbours, neighbours join
# BACK to the document table for source metadata, and recall@3 is
# scored against the exact brute-force tier — the end-to-end eval a
# retrieval pipeline runs before swapping the exact tier out for ANN.
# ---------------------------------------------------------------------------

_XMODAL_ORACLE = f"""
  WITH probes AS (
    SELECT d.doc_id AS query_id, d.source AS query_source
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    WHERE d.doc_id % 125 = 0
  ),
  exact_topk AS (
    SELECT query_id, neighbor_id
    FROM ({sim_op.COSINE_TOPK_SQL(125, 3)})
  ),
  ivf_topk AS (
    SELECT query_id, neighbor_id
    FROM ({sim_op.IVF_SQL(125, 3)})
  ),
  retrieved AS (
    SELECT i.query_id, i.neighbor_id, nd.source AS neighbor_source
    FROM ivf_topk i JOIN documents nd ON nd.doc_id = i.neighbor_id
  )
  SELECT p.query_id, p.query_source,
         CAST(COUNT(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_hits,
         round(COUNT(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 END)
               / CAST(3 AS DOUBLE), 6) AS recall_at_k,
         CAST(SUM(CASE WHEN r.neighbor_source = p.query_source
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_same_source
  FROM probes p
  JOIN retrieved r ON r.query_id = p.query_id
  LEFT JOIN exact_topk e
    ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
  GROUP BY p.query_id, p.query_source
  ORDER BY p.query_id
"""


@register("cross_modal_retrieval_eval", _XMODAL_ORACLE)
def cross_modal_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text→embedding→document retrieval eval: per probe document,
    recall@3 of the IVF tier against the exact tier PLUS the
    same-source count of the retrieved documents (the topical-coherence
    proxy a cross-modal index is judged by when no labeled relevance
    exists). The doc↔vector bridge is a real join both directions —
    probes enter through documents, results leave through documents."""
    docs = load(spark, "documents", sf_dir)
    emb = load(spark, "embeddings", sf_dir)
    probes = docs.filter(F.col("doc_id") % 125 == 0).join(
        emb, docs["doc_id"] == emb["vec_id"]
    ).select(
        F.col("doc_id").alias("query_id"),
        F.col("source").alias("query_source"),
    )
    ivf = sim_op.ivf_topk(emb, 125, 3).select("query_id", "neighbor_id")
    exact = sim_op.cosine_topk(emb, 125, 3).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    retrieved = ivf.join(
        docs.select(
            F.col("doc_id").alias("neighbor_id"),
            F.col("source").alias("neighbor_source"),
        ),
        "neighbor_id",
    )
    return (
        F.broadcast(probes)
        .join(retrieved, "query_id")
        .join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id", "query_source")
        .agg(
            F.count("hit").cast("long").alias("n_hits"),
            F.round(F.count("hit") / F.lit(3.0), 6).alias("recall_at_k"),
            F.sum(
                (F.col("neighbor_source") == F.col("query_source")).cast("int")
            ).cast("long").alias("n_same_source"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# r10: SQ8 reconstruction-error audit by label — the per-cohort
# distortion view of the SQ8 tier (is 8-bit scalar quantization
# uniformly safe across label cohorts, or does one cohort live in a
# corner of the value range where the shared per-dim grid is coarse?).
# Reconstruction v̂ = lo + code·(hi−lo)/255 from the committed bounds;
# per-dim squared errors quantize to the 1e-12 grid before the
# order-free integer sum; report = one row per label.
# ---------------------------------------------------------------------------

_SQ8_LABEL_ORACLE = """
  WITH per AS (
    SELECT pos, MIN(val) AS lo, MAX(val) AS hi FROM (
      SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
             unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS val
      FROM embeddings
    ) GROUP BY pos
  ),
  bounds AS (
    SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his
    FROM per
  ),
  errs AS (
    SELECT e.vec_id, e.label,
           list_sum([CAST(FLOOR(
             (CAST(e.embedding[i] AS DOUBLE)
              - (los[i] + (CASE WHEN his[i] = los[i] THEN CAST(0 AS BIGINT)
                       ELSE CAST(FLOOR((CAST(e.embedding[i] AS DOUBLE) - los[i])
                            / (his[i] - los[i]) * 255 + 0.5) AS BIGINT) END)
                 * (his[i] - los[i]) / 255))
             * (CAST(e.embedding[i] AS DOUBLE)
              - (los[i] + (CASE WHEN his[i] = los[i] THEN CAST(0 AS BIGINT)
                       ELSE CAST(FLOOR((CAST(e.embedding[i] AS DOUBLE) - los[i])
                            / (his[i] - los[i]) * 255 + 0.5) AS BIGINT) END)
                 * (his[i] - los[i]) / 255))
             * 1000000000000.0 + 0.5) AS BIGINT)
            FOR i IN generate_series(1, len(e.embedding))]) AS err_q
    FROM embeddings e, bounds
  )
  SELECT label,
         COUNT(*) AS n_vecs,
         CAST(SUM(err_q) AS BIGINT) AS err_sum_q,
         CAST(MAX(err_q) AS BIGINT) AS max_err_q
  FROM errs GROUP BY label ORDER BY label
"""


@register("embedding_sq8_error_by_label", _SQ8_LABEL_ORACLE)
def embedding_sq8_error_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label SQ8 reconstruction distortion (see _SQ8_LABEL_ORACLE).
    One posexplode bounds agg (dim grain, broadcast back) + one scan
    projection + one label-grain agg."""
    emb = load(spark, "embeddings", sf_dir)
    per = (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.min(F.col("val").cast("double")).alias("lo"),
            F.max(F.col("val").cast("double")).alias("hi"),
        )
    )
    bounds = per.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, lo, hi))), x -> x.lo)"
        ).alias("los"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, lo, hi))), x -> x.hi)"
        ).alias("his"),
    )
    recon = (
        "(element_at(los, i) + (CASE WHEN element_at(his, i) = element_at(los, i) "
        "THEN CAST(0 AS BIGINT) ELSE CAST(FLOOR((CAST(element_at(embedding, i) "
        "AS DOUBLE) - element_at(los, i)) / (element_at(his, i) - "
        "element_at(los, i)) * 255 + 0.5) AS BIGINT) END) "
        "* (element_at(his, i) - element_at(los, i)) / 255)"
    )
    diff = f"(CAST(element_at(embedding, i) AS DOUBLE) - {recon})"
    err = F.expr(
        "aggregate(transform(sequence(1, size(embedding)), i -> "
        f"CAST(FLOOR({diff} * {diff} * 1000000000000.0 + 0.5) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return (
        emb.crossJoin(F.broadcast(bounds))
        .select("label", err.alias("err_q"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("err_q").cast("long").alias("err_sum_q"),
            F.max("err_q").cast("long").alias("max_err_q"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# r10: embedding-norm drift by ingest decile — the encoder-version
# drift monitor for a growing corpus: if a re-deployed text encoder
# shifts output scale, mean vector norm moves with vec_id (ingest
# order). Norms as exact integer quantized dot products; per-decile
# mean emitted as the exact integer pair (sum, n) plus their division
# (identical int-derived doubles).
# ---------------------------------------------------------------------------

_NORM_DRIFT_ORACLE = f"""
  WITH n AS (
    SELECT vec_id,
           {sim_op._qdot_sql('embedding', 'embedding')} AS n2q
    FROM embeddings
  ),
  b AS (SELECT MAX(vec_id) AS mx FROM embeddings)
  SELECT CAST((n.vec_id * 10) // (b.mx + 1) AS INT) AS decile,
         COUNT(*) AS n_vecs,
         CAST(SUM(n.n2q) AS BIGINT) AS norm2_sum_q,
         CAST(SUM(n.n2q) AS DOUBLE) / COUNT(*) AS mean_norm2_q
  FROM n, b
  GROUP BY 1 ORDER BY 1
"""


@register("embedding_norm_ingest_drift", _NORM_DRIFT_ORACLE)
def embedding_norm_ingest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean squared vector norm per ingest decile (see
    _NORM_DRIFT_ORACLE). One scan projection + a 10-row rollup."""
    emb = load(spark, "embeddings", sf_dir)
    mx = emb.agg(F.max("vec_id").alias("mx"))
    n = emb.select(
        "vec_id", sim_op._qdot("embedding", "embedding").alias("n2q")
    )
    return (
        n.crossJoin(F.broadcast(mx))
        .groupBy(
            F.expr("CAST((vec_id * 10) DIV (mx + 1) AS INT)").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("n2q").cast("long").alias("norm2_sum_q"),
            (F.sum("n2q").cast("double") / F.count(F.lit(1)))
            .alias("mean_norm2_q"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# r11 (ROADMAP candidate): ANN probes served AT a pinned flag version —
# version pinning composed ACROSS two artifacts: the retrieval pool is
# the embedding corpus minus the vectors tombstoned by a VERSIONED
# quality-flag table (snapshot sink, CASA flagmanager discipline
# applied to vectors: v1 = first quality pass, v2 = stricter re-pass),
# read back via TIME TRAVEL per serving version. The report pins each
# probe's top-1 under v1 and under v2 — the "what did the stricter
# filter change in retrieval" audit an embedding-store rollout runs.
# Exact: the cosine tier's quantized arithmetic; flags reconstructed in
# the oracle from their defining predicates.
# ---------------------------------------------------------------------------

_FLAG_V1_PRED = "vec_id % 10 = 0"
_FLAG_V2_PRED = "vec_id % 10 = 0 OR vec_id % 7 = 0"


def _ann_flagver_ranked_sql(ver: int) -> str:
    # integer-grid rank key + output (r11 ADVICE: removes the
    # round(x, 9) cross-engine half-boundary class — ONE rounding to
    # the q9 BIGINT grid, used for ordering AND emission, mirrored by
    # rank_grid=1e9 on the Spark side)
    dot = sim_op._qdot_sql("q.embedding", "c.embedding")
    qq = sim_op._qdot_sql("q.embedding", "q.embedding")
    cc = sim_op._qdot_sql("c.embedding", "c.embedding")
    qsim = f"CAST(ROUND({dot} / (sqrt({qq}) * sqrt({cc})) * 1000000000) AS BIGINT)"
    return f"""
      SELECT {ver} AS version, q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {qsim} AS sim_q,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {qsim} DESC,
                                         c.vec_id) AS rank
      FROM embeddings q, embeddings c
      WHERE q.vec_id % 125 = 0 AND q.vec_id <> c.vec_id
        AND NOT (c.vec_id % 10 = 0 OR ({ver} = 2 AND c.vec_id % 7 = 0))
    """


_ANN_FLAGVER_ORACLE = f"""
  WITH r1 AS ({_ann_flagver_ranked_sql(1)}),
  r2 AS ({_ann_flagver_ranked_sql(2)})
  SELECT a.query_id AS query_id,
         a.neighbor_id AS top1_v1,
         b.neighbor_id AS top1_v2,
         CAST(CASE WHEN a.neighbor_id <> b.neighbor_id THEN 1 ELSE 0 END AS INT)
           AS changed,
         a.sim_q AS sim_v1_q9,
         b.sim_q AS sim_v2_q9
  FROM r1 a JOIN r2 b ON a.query_id = b.query_id
  WHERE a.rank = 1 AND b.rank = 1
  ORDER BY query_id
"""


@register("ann_probe_at_flag_version", _ANN_FLAGVER_ORACLE)
def ann_probe_at_flag_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-1 retrieval under version-pinned vector tombstones
    (see the section comment). The flags travel through the snapshot
    sink (v1 commit, v2 overwrite) and each serving version anti-joins
    its OWN time-travel read — the probe layer never sees the other
    version's state. Versions are CAPTURED from commit() (not assumed
    1/2) and the snapshot root is per-process (r11 ADVICE: a fixed path
    raced a concurrent run of the same query; rmtree keeps same-process
    repeats from accumulating)."""
    import os
    import shutil
    import tempfile

    from codex_africanus_spark.sources import snapshot as snap

    emb = load(spark, "embeddings", sf_dir)
    root = f"{tempfile.gettempdir()}/cas_snapshot/vec_flags_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    v1 = snap.commit(
        emb.filter(F.expr(_FLAG_V1_PRED)).select("vec_id"), root,
        mode="overwrite",
    )
    v2 = snap.commit(
        emb.filter(F.expr(_FLAG_V2_PRED)).select("vec_id"), root,
        mode="overwrite",
    )
    probes = emb.filter(F.col("vec_id") % 125 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tops = []
    for ver, snapv in ((1, v1), (2, v2)):
        tomb = snap.read_snapshot(spark, root, version=snapv)
        pool = emb.join(tomb, "vec_id", "left_anti")
        ranked = sim_op.cosine_topk_probes(
            pool, probes, k=1, exclude_self=True, rank_grid=1e9
        )
        tops.append(
            ranked.filter(F.col("rank") == 1).select(
                "query_id",
                F.col("neighbor_id").alias(f"top1_v{ver}"),
                F.col("sim_q").alias(f"sim_v{ver}_q9"),
            )
        )
    return (
        tops[0].join(tops[1], "query_id")
        .select(
            "query_id", "top1_v1", "top1_v2",
            F.when(F.col("top1_v1") != F.col("top1_v2"), 1)
            .otherwise(0).cast("int").alias("changed"),
            "sim_v1_q9", "sim_v2_q9",
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# r11 (ROADMAP r12 candidate pulled forward): ANN probe serving composed
# WITH the branch/merge catalog — the embedding corpus lives in a
# snapshot table; a staging branch ingests a new vector batch while the
# main table takes a concurrent append; merge_3way (append-only
# key-range conflict detection on disjoint synthetic key bands) lands
# the staged batch on the advanced head. Top-1 retrieval is served at
# THREE catalog states — main@base, branch head, merged head — the
# "what did staging add / what did the merge add" rollout audit of an
# embedding store. Pools reconstructed in the oracle from the split
# predicates:
#   base   = vec_id % 4 != 0                       (table v1)
#   branch = base + (vec_id % 4 = 0 AND % 8 != 0)  = vec_id % 8 != 0
#   merged = branch + (vec_id % 8 = 0)             = everything
# ---------------------------------------------------------------------------


def _ann_branch_ranked_sql(tag: str, pool_pred: str) -> str:
    # integer-grid rank key + output (r11 ADVICE — see
    # _ann_flagver_ranked_sql)
    dot = sim_op._qdot_sql("q.embedding", "c.embedding")
    qq = sim_op._qdot_sql("q.embedding", "q.embedding")
    cc = sim_op._qdot_sql("c.embedding", "c.embedding")
    qsim = f"CAST(ROUND({dot} / (sqrt({qq}) * sqrt({cc})) * 1000000000) AS BIGINT)"
    return f"""
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {qsim} AS sim_q,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {qsim} DESC,
                                         c.vec_id) AS rank
      FROM embeddings q, embeddings c
      WHERE q.vec_id % 125 = 0 AND q.vec_id <> c.vec_id
        AND ({pool_pred})
    """


_ANN_BRANCH_MERGE_ORACLE = f"""
  WITH rb AS ({_ann_branch_ranked_sql('base', 'c.vec_id % 4 <> 0')}),
  rs AS ({_ann_branch_ranked_sql('branch', 'c.vec_id % 8 <> 0')}),
  rm AS ({_ann_branch_ranked_sql('merged', 'TRUE')})
  SELECT b.query_id AS query_id,
         b.neighbor_id AS top1_base,
         s.neighbor_id AS top1_branch,
         m.neighbor_id AS top1_merged,
         b.sim_q AS sim_base_q9,
         s.sim_q AS sim_branch_q9,
         m.sim_q AS sim_merged_q9,
         CAST(CASE WHEN b.neighbor_id <> s.neighbor_id THEN 1 ELSE 0 END AS INT)
           AS changed_by_staging,
         CAST(CASE WHEN s.neighbor_id <> m.neighbor_id THEN 1 ELSE 0 END AS INT)
           AS changed_by_merge
  FROM rb b JOIN rs s ON b.query_id = s.query_id
  JOIN rm m ON b.query_id = m.query_id
  WHERE b.rank = 1 AND s.rank = 1 AND m.rank = 1
  ORDER BY query_id
"""


@register("ann_probe_branch_merge", _ANN_BRANCH_MERGE_ORACLE)
def ann_probe_branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-1 retrieval served at three catalog states of a
    branched + concurrently-advanced + 3-way-merged snapshot table (see
    the section comment). The synthetic key bands (base/src appends
    k = vec_id >= 0, staged branch append k = -vec_id - 1 < 0) make the
    since-base appends provably disjoint in min/max stats, which is
    what lets merge_3way land the branch on the advanced head. The base
    serving read is pinned to the version commit_with_stats RETURNED
    (not a hard-coded 1) and the roots are per-process (r11 ADVICE:
    fixed paths raced a concurrent run of the same query)."""
    import os
    import shutil
    import tempfile

    from codex_africanus_spark.sources import snapshot as snap

    emb = load(spark, "embeddings", sf_dir)
    pid = os.getpid()
    root = f"{tempfile.gettempdir()}/cas_snapshot/emb_branch_merge_{pid}"
    br = f"{tempfile.gettempdir()}/cas_snapshot/emb_branch_merge_{pid}_br"
    for p in (root, br):
        shutil.rmtree(p, ignore_errors=True)

    base = emb.filter(F.col("vec_id") % 4 != 0).select(
        "vec_id", "embedding", F.col("vec_id").cast("long").alias("k")
    )
    base_v = snap.commit_with_stats(base, root, stats_cols=["k"], mode="overwrite")
    snap.create_branch(root, br)
    src_new = emb.filter(F.col("vec_id") % 8 == 0).select(
        "vec_id", "embedding", F.col("vec_id").cast("long").alias("k")
    ).coalesce(1)
    snap.commit_with_stats(src_new, root, stats_cols=["k"])
    staged = emb.filter(
        (F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 8 != 0)
    ).select(
        "vec_id", "embedding", (-F.col("vec_id") - 1).cast("long").alias("k")
    ).coalesce(1)
    snap.commit_with_stats(staged, br, stats_cols=["k"])
    merged_v = snap.merge_3way(br, root, key="k")

    probes = emb.filter(F.col("vec_id") % 125 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tops = []
    for tag, pool in (
        ("base", snap.read_snapshot(spark, root, version=base_v)),
        ("branch", snap.read_snapshot(spark, br)),
        ("merged", snap.read_snapshot(spark, root, version=merged_v)),
    ):
        ranked = sim_op.cosine_topk_probes(
            pool, probes, k=1, exclude_self=True, rank_grid=1e9
        )
        tops.append(
            ranked.filter(F.col("rank") == 1).select(
                "query_id",
                F.col("neighbor_id").alias(f"top1_{tag}"),
                F.col("sim_q").alias(f"sim_{tag}_q9"),
            )
        )
    return (
        tops[0].join(tops[1], "query_id").join(tops[2], "query_id")
        .select(
            "query_id", "top1_base", "top1_branch", "top1_merged",
            "sim_base_q9", "sim_branch_q9", "sim_merged_q9",
            F.when(F.col("top1_base") != F.col("top1_branch"), 1)
            .otherwise(0).cast("int").alias("changed_by_staging"),
            F.when(F.col("top1_branch") != F.col("top1_merged"), 1)
            .otherwise(0).cast("int").alias("changed_by_merge"),
        )
        .orderBy("query_id")
    )
