"""Distinct-count sketches: exact-deterministic KMV (theta-style) and
expression-level HyperLogLog.

The reference has no sketch operators (its cardinalities are exact,
africanus/averaging/support.py:10-117); at 100 TB a training-data
pipeline needs mergeable approximate distincts — dedup-rate dashboards,
per-shard vocabulary sizes — where an exact distinct would shuffle the
full key set. Two tiers:

- ``kmv_distinct``: K-Minimum-Values estimator over the engine-portable
  60-bit md5 hash (functions/text.hash60). Fully deterministic — the
  same k smallest hashes exist in any engine — so the driver's DuckDB
  oracle matches it EXACTLY, sketch included. Scale path: an
  approx_count_distinct prefilter drops all but the ~50·k smallest
  hashes per group before the exact per-group sort, so the window sees
  a bounded set regardless of group cardinality.
- ``hll_distinct`` / ``hll_rollup_union``: HyperLogLog (Flajolet et al.
  2007) built from portable expressions over the same hash60: bucket =
  top 6 hash bits, register = max rank-of-first-one over the remaining
  54 bits, estimate = bias-corrected harmonic mean. Register state is a
  bounded m=64-row group (partial-agg map-side combine ships registers,
  never the key set) and union-rollup is an element-wise register MAX —
  the re-aggregation-without-rescan property, exactly lossless because
  max is associative. Every step is integer/string arithmetic plus ONE
  correctly-rounded IEEE division, so DuckDB reproduces the estimate
  BIT-EXACTLY (``HLL_SQL``) — same oracle discipline as KMV, unlike the
  engine-opaque DataSketches hll_sketch_agg this replaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from codex_africanus_spark.functions.text import hash60, hash60_sql

TWO60 = float(1 << 60)  # 2^60 is exactly representable as a double


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    col: Column | str,
    k: int = 64,
    prefilter: bool = True,
) -> DataFrame:
    """Per-group KMV distinct estimate: (k-1) / U_(k) with U_(k) the k-th
    smallest distinct hash normalized to (0, 1); groups with fewer than k
    distinct values report the exact count.

    Deterministic by construction (order statistics of a fixed hash), so
    exactly reproducible in any engine — see ``KMV_SQL`` for the DuckDB
    mirror.
    """
    col = F.col(col) if isinstance(col, str) else col
    d = df.select(*keys, hash60(col).alias("h")).distinct()
    if prefilter:
        # Scale guard: keep ~50·k smallest hashes per group (≥ k with
        # overwhelming margin), estimated from a cheap mergeable HLL
        # pass. Semantics-preserving: the k smallest survive any
        # threshold that keeps ≥ k values, so the result is unchanged.
        bounds = d.groupBy(*keys).agg(F.approx_count_distinct("h").alias("an"))
        floor_ = F.greatest(F.col("an"), F.lit(50 * k))
        d = d.join(F.broadcast(bounds), keys).filter(
            F.col("h") < F.lit(TWO60) * F.lit(float(50 * k)) / floor_
        )
    w = Window.partitionBy(*keys).orderBy("h")
    ranked = d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    return (
        ranked.groupBy(*keys)
        .agg(
            F.count("*").alias("nk"),
            F.max(F.when(F.col("rk") == k, F.col("h"))).alias("hk"),
        )
        .select(
            *keys,
            F.round(
                F.when(F.col("nk") < k, F.col("nk").cast("double")).otherwise(
                    F.lit(float(k - 1)) * F.lit(TWO60) / F.col("hk")
                ),
                6,
            ).alias("est_distinct"),
        )
    )


def KMV_SQL(table_expr: str, keys: list[str], col_expr: str, k: int = 64) -> str:
    """DuckDB mirror of kmv_distinct (no prefilter — it is semantics-
    preserving, so both sides produce identical order statistics)."""
    ks = ", ".join(keys)
    return f"""
    WITH kmv_d AS (
      SELECT DISTINCT {ks}, {hash60_sql(col_expr)} AS h FROM {table_expr}
    ), kmv_r AS (
      SELECT {ks}, h, row_number() OVER (PARTITION BY {ks} ORDER BY h) AS rk
      FROM kmv_d
    )
    SELECT {ks},
           round(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                 ELSE {float(k - 1)!r}e0 * {TWO60!r} / MAX(CASE WHEN rk = {k} THEN h END)
                 END, 6) AS est_distinct
    FROM kmv_r WHERE rk <= {k}
    GROUP BY {ks}
    ORDER BY {ks}
    """


def kmv_merge_global(
    df: DataFrame, group_keys: list[str], col: Column | str, k: int = 64
) -> DataFrame:
    """Global distinct estimate by MERGING per-group KMV sketches — the
    re-aggregation property: k-min(∪ sets) == k-min(∪ k-min(set_i)), so
    sub-sketches roll up losslessly without rescanning. The oracle
    computes the global k-min directly from the full table and matches
    the merged estimate EXACTLY (KMV_GLOBAL_SQL)."""
    col = F.col(col) if isinstance(col, str) else col
    d = df.select(*group_keys, hash60(col).alias("h")).distinct()
    wg = Window.partitionBy(*group_keys).orderBy("h")
    per_group = (
        d.withColumn("rk", F.row_number().over(wg)).filter(F.col("rk") <= k)
    )
    # merge: pool the sketches, de-dup hashes shared across groups, take
    # the global k smallest (the pooled input is #groups × k rows)
    pooled = per_group.select("h").distinct()
    wall = Window.orderBy("h")
    ranked = pooled.withColumn("rk", F.row_number().over(wall)).filter(
        F.col("rk") <= k
    )
    return ranked.agg(
        F.count("*").alias("nk"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("hk"),
    ).select(
        F.round(
            F.when(F.col("nk") < k, F.col("nk").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(TWO60) / F.col("hk")
            ),
            6,
        ).alias("est_distinct")
    )


def KMV_GLOBAL_SQL(table_expr: str, col_expr: str, k: int = 64) -> str:
    """Direct (un-merged) global k-min estimate — identical to the merged
    rollup by the lossless-merge property."""
    return f"""
    WITH kmv_d AS (
      SELECT DISTINCT {hash60_sql(col_expr)} AS h FROM {table_expr}
    ), kmv_r AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rk FROM kmv_d
    )
    SELECT round(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                 ELSE {float(k - 1)!r}e0 * {TWO60!r} / MAX(CASE WHEN rk = {k} THEN h END)
                 END, 6) AS est_distinct
    FROM kmv_r WHERE rk <= {k}
    """


# Expression-level HyperLogLog geometry: 60-bit hash = 6 bucket bits
# (m = 64 registers) + 54 remainder bits. rho(rem) = leading zeros + 1 =
# 55 - bit_length(rem) ∈ [1, 55] (rem = 0 → 55). The harmonic-mean sum
# Σ 2^-reg is kept EXACT by scaling with 2^55: each term 2^(55-reg) is an
# integer, Σ ≤ m·2^55 = 2^61 < 2^63, and integer addition is
# order-independent — no float-summation drift between engines.
HLL_M = 64
_HLL_REM_BITS = 54
_HLL_RHO_MAX = _HLL_REM_BITS + 1
_HLL_SCALE = 1 << _HLL_RHO_MAX
# Classic alpha_64 bias constant (Flajolet et al. 2007, Fig. 3); the
# numerator alpha·m²·2^55 is a single Python float literal embedded
# identically on both engines.
_HLL_NUM = 0.709 * HLL_M * HLL_M * float(_HLL_SCALE)


def hll_registers(df: DataFrame, keys: list[str], col: Column | str) -> DataFrame:
    """HLL register state: per (group, bucket) the max rank-of-first-one.
    One partial-aggregating shuffle at ≤ m rows per group; bit_length via
    length(bin(x)), identical unpadded semantics in Spark and DuckDB."""
    col = F.col(col) if isinstance(col, str) else col
    h = hash60(col)
    rem = h.bitwiseAND(F.lit((1 << _HLL_REM_BITS) - 1))
    rho = F.when(rem == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(rem))
    )
    return (
        df.select(
            *keys,
            F.shiftrightunsigned(h, _HLL_REM_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Bias-corrected harmonic-mean estimate from register state. Empty
    buckets (register 0) contribute 2^55 each via the (m - occupied)
    term, so the grouped sum never needs a bucket dimension table."""
    return (
        registers.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - reg)")
            ).alias("s_occ"),
        )
        .select(
            *keys,
            F.round(
                F.lit(_HLL_NUM)
                / (
                    F.col("s_occ")
                    + (F.lit(HLL_M) - F.col("occ")) * F.lit(_HLL_SCALE)
                ).cast("double"),
                6,
            ).alias("est_distinct"),
        )
    )


def hll_distinct(df: DataFrame, keys: list[str], col: Column | str) -> DataFrame:
    """Per-group HLL distinct estimate — registers then harmonic mean."""
    return hll_estimate(hll_registers(df, keys, col), keys)


def hll_rollup_union(
    df: DataFrame, fine_keys: list[str], coarse_keys: list[str], col: Column | str
) -> DataFrame:
    """Sketch once at fine granularity, merge up with an element-wise
    register MAX — re-aggregation without rescanning the fact table.
    max(max(a), max(b)) == max(a ∪ b), so the merged state is IDENTICAL
    to sketching the coarse group directly and the direct-computation
    oracle (HLL_SQL at coarse keys) matches bit-exactly."""
    fine = hll_registers(df, fine_keys, col)
    merged = fine.groupBy(*coarse_keys, "bucket").agg(F.max("reg").alias("reg"))
    return hll_estimate(merged, coarse_keys)


def HLL_SQL(table_expr: str, keys: list[str], col_expr: str) -> str:
    """DuckDB mirror of hll_distinct — and of hll_rollup_union at the
    coarse keys, by the lossless register-max merge property."""
    ks = ", ".join(keys)
    mask = (1 << _HLL_REM_BITS) - 1
    return f"""
    WITH hll_h AS (
      SELECT {ks}, {hash60_sql(col_expr)} AS h FROM {table_expr}
    ), hll_rho AS (
      SELECT {ks}, h // {1 << _HLL_REM_BITS} AS bucket,
             CASE WHEN h % {1 << _HLL_REM_BITS} = 0 THEN {_HLL_RHO_MAX}
                  ELSE {_HLL_RHO_MAX} - length(bin(h & {mask})) END AS rho
      FROM hll_h
    ), hll_reg AS (
      SELECT {ks}, bucket, MAX(rho) AS reg FROM hll_rho GROUP BY {ks}, bucket
    )
    SELECT {ks},
           round({_HLL_NUM!r} / CAST(SUM(1::BIGINT << ({_HLL_RHO_MAX} - reg))
                 + ({HLL_M} - COUNT(*)) * {_HLL_SCALE} AS DOUBLE), 6) AS est_distinct
    FROM hll_reg GROUP BY {ks}
    ORDER BY {ks}
    """


# ---------------------------------------------------------------------------
# Quantile sketch (the KLL role, ROADMAP item 6 remainder)
# ---------------------------------------------------------------------------

def grid_quantile_sketch(
    df: DataFrame, keys: list[str], value_expr: str, step: int, nbuckets: int
) -> DataFrame:
    """Mergeable quantile sketch: deterministic fixed-grid histogram over
    an integer value domain (bucket = value DIV step, capped).

    This fills the KLL slot with a different trade-off: KLL's randomized
    compaction gives rank-error guarantees but is non-deterministic and
    partition-order-dependent; the fixed grid gives *value*-error ≤ step,
    is bit-deterministic (⇒ exact DuckDB oracles, partition invariance),
    and its merge is plain count-sum — sub-sketches re-aggregate to any
    coarser grouping LOSSLESSLY (bit-equal to sketching the coarse group
    directly, unlike KLL whose merged compaction paths differ). Size is
    ≤ nbuckets rows per group regardless of group cardinality — the same
    bounded-state argument as KMV/HLL above.

    `value_expr` must be an integer-typed SQL expression: all bucket /
    rank arithmetic stays in BIGINT, so engine parity is trivial."""
    b = F.least(
        F.expr(f"({value_expr}) DIV {step}"), F.lit(nbuckets - 1).cast("long")
    ).alias("bucket")
    return df.groupBy(*[F.col(k) for k in keys], b).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def grid_quantile_rollup(sketch: DataFrame, coarse_keys: list[str]) -> DataFrame:
    """Merge sub-sketches up to coarser keys: count-sum per bucket —
    the lossless re-aggregation-without-rescan property."""
    return sketch.groupBy(*coarse_keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def grid_quantile_estimate(
    sketch: DataFrame,
    keys: list[str],
    quantiles: list[tuple[str, int, int]],
    step: int,
) -> DataFrame:
    """Estimate quantiles from a grid sketch: for q = num/den, the
    estimate is the upper edge (bucket+1)·step of the first bucket whose
    cumulative count reaches rank ceil(q·n) — a conservative upper bound
    with error ≤ step. `quantiles` is [(out_name, num, den), ...];
    integer rank arithmetic: ceil(a/b) = (a + b − 1) DIV b."""
    wc = Window.partitionBy(*keys).orderBy("bucket")
    wt = Window.partitionBy(*keys)
    c = (
        sketch.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("n", F.sum("cnt").over(wt))
    )
    aggs = [F.max("n").alias("n")]
    for name, num, den in quantiles:
        rank = F.expr(f"({num} * n + {den - 1}) DIV {den}")
        aggs.append(
            F.min(
                F.when(F.col("cum") >= rank, (F.col("bucket") + 1) * F.lit(step))
            ).alias(name)
        )
    return c.groupBy(*keys).agg(*aggs)


def kmv_intersection(
    df: DataFrame, seg_col: str, col: Column | str, k: int = 64
) -> DataFrame:
    """Theta-sketch set algebra: estimated distinct-value overlap between
    every pair of segments, from per-segment KMV sketches alone.

    Standard theta intersection: each segment retains its k smallest
    hashes and a threshold θ (the k-th smallest, or 2^60 when the segment
    has < k distinct values and the sketch IS the exact set); for a pair,
    θ∩ = min(θa, θb) and the estimate is |{h in both sketches, h < θ∩}| ·
    2^60 / θ∩ (which degrades gracefully to the exact intersection count
    when both sides are exact). Deterministic end-to-end — order
    statistics of the portable hash — so the DuckDB oracle reproduces the
    estimate bit-for-bit.

    Scale: sketches are k-row groups (partial-agg friendly); the pair
    join touches #segments × k rows, never the base table — the whole
    point of sketch algebra at 100 TB is that segment-overlap dashboards
    never rescan the fact table.
    """
    col = F.col(col) if isinstance(col, str) else col
    d = df.select(F.col(seg_col).alias("seg"), hash60(col).alias("h")).distinct()
    w = Window.partitionBy("seg").orderBy("h")
    sk = d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    theta = sk.groupBy("seg").agg(
        F.when(F.count("*") < k, F.lit(TWO60))
        .otherwise(F.max(F.when(F.col("rk") == k, F.col("h"))).cast("double"))
        .alias("theta")
    )
    a = sk.select(F.col("seg").alias("seg_a"), "h").join(
        F.broadcast(theta.select(F.col("seg").alias("seg_a"), F.col("theta").alias("ta"))),
        "seg_a",
    )
    b = sk.select(F.col("seg").alias("seg_b"), "h").join(
        F.broadcast(theta.select(F.col("seg").alias("seg_b"), F.col("theta").alias("tb"))),
        "seg_b",
    )
    pairs = a.join(b, "h").filter(F.col("seg_a") < F.col("seg_b"))
    tmin = F.least(F.col("ta"), F.col("tb"))
    common = (
        pairs.filter(F.col("h") < tmin)
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").alias("n_common"), F.first(tmin).alias("theta"))
    )
    return common.select(
        "seg_a",
        "seg_b",
        F.round(F.col("n_common") * F.lit(TWO60) / F.col("theta"), 6).alias(
            "est_common"
        ),
    ).orderBy("seg_a", "seg_b")


def KMV_INTERSECT_SQL(table_expr: str, seg_expr: str, col_expr: str, k: int = 64) -> str:
    return f"""
    WITH ki_d AS (
      SELECT DISTINCT {seg_expr} AS seg, {hash60_sql(col_expr)} AS h
      FROM {table_expr}
    ),
    ki_r AS (
      SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS rk
      FROM ki_d
    ),
    ki_sk AS (SELECT seg, h, rk FROM ki_r WHERE rk <= {k}),
    ki_th AS (
      SELECT seg,
             CASE WHEN COUNT(*) < {k} THEN {TWO60!r}
                  ELSE CAST(MAX(CASE WHEN rk = {k} THEN h END) AS DOUBLE)
             END AS theta
      FROM ki_sk GROUP BY seg
    ),
    ki_pairs AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b, a.h AS h,
             least(ta.theta, tb.theta) AS theta
      FROM ki_sk a
      JOIN ki_sk b ON a.h = b.h AND a.seg < b.seg
      JOIN ki_th ta ON ta.seg = a.seg
      JOIN ki_th tb ON tb.seg = b.seg
    )
    SELECT seg_a, seg_b,
           round(COUNT(*) * {TWO60!r} / ANY_VALUE(theta), 6) AS est_common
    FROM ki_pairs WHERE h < theta
    GROUP BY seg_a, seg_b
    ORDER BY seg_a, seg_b
    """


CMS_D = 4      # hash rows
CMS_W = 1024   # cells per row (state 4x1024 cells; tight at the test
               # vocabulary, still partial-agg-sized at any corpus scale)


def _cms_cell(col: Column, row: int) -> Column:
    """Row-specific cell index: salt the portable hash with the row id."""
    return hash60(F.concat(F.lit(f"r{row}|"), col)) % CMS_W


def _cms_cell_sql(expr: str, row: int) -> str:
    salted = "concat('r" + str(row) + "|', " + expr + ")"
    return f"({hash60_sql(salted)} % {CMS_W})"


def cms_token_estimates(documents: DataFrame, top_n: int = 20) -> DataFrame:
    """Count-Min sketch frequency estimates for the corpus's true top-N
    tokens — the frequency member of the sketch family (distinct = KMV /
    HLL / theta, quantiles = grid-KLL, frequency = CMS).

    The sketch is D×W = 256 cells of token-occurrence counts (cell =
    salted-hash of the token per row; estimate = MIN over rows); cells
    are plain conditional-sum aggregates, so the state is partial-agg
    friendly and two sketches merge by cell-wise addition (lossless for
    the estimate definition — at 100 TB per-shard sketches roll up
    without rescanning). Deterministic hash → the ESTIMATES are exactly
    oracled, and CMS's one-sided guarantee (estimate ≥ true) is assertable
    row by row. Output: token, true count, estimate, overestimate."""
    tok = documents.select(F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    top = tf.orderBy(F.col("true_count").desc(), "token").limit(top_n)
    cells = tok.groupBy(
        *[_cms_cell(F.col("token"), r).alias(f"c{r}") for r in range(CMS_D)]
    ).agg(F.count(F.lit(1)).alias("n"))
    # fold the D cell tables: for each row r, per-cell totals
    rows = [
        cells.groupBy(F.col(f"c{r}").alias("cell")).agg(F.sum("n").alias(f"n{r}"))
        for r in range(CMS_D)
    ]
    probe = top
    for r in range(CMS_D):
        probe = probe.join(
            F.broadcast(
                rows[r].select(F.col("cell").alias(f"cell{r}"), f"n{r}")
            ),
            _cms_cell(F.col("token"), r) == F.col(f"cell{r}"),
        )
    est = F.least(*[F.col(f"n{r}") for r in range(CMS_D)])
    return probe.select(
        "token",
        "true_count",
        est.alias("cms_estimate"),
        (est - F.col("true_count")).alias("overestimate"),
    ).orderBy(F.col("true_count").desc(), "token")


def CMS_SQL(top_n: int = 20) -> str:
    cell_defs = ",\n           ".join(
        f"{_cms_cell_sql('token', r)} AS c{r}" for r in range(CMS_D)
    )
    row_ctes = ",\n      ".join(
        f"row{r} AS (SELECT c{r} AS cell, CAST(SUM(n) AS BIGINT) AS n{r} "
        f"FROM cells GROUP BY c{r})"
        for r in range(CMS_D)
    )
    joins = "\n      ".join(
        f"JOIN row{r} ON row{r}.cell = {_cms_cell_sql('t.token', r)}"
        for r in range(CMS_D)
    )
    least = "least(" + ", ".join(f"n{r}" for r in range(CMS_D)) + ")"
    return f"""
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
      ),
      tf AS (SELECT token, COUNT(*) AS true_count FROM tok GROUP BY token),
      top AS (
        SELECT token, true_count FROM tf
        ORDER BY true_count DESC, token LIMIT {top_n}
      ),
      cells AS (
        SELECT {cell_defs}, COUNT(*) AS n
        FROM tok GROUP BY ALL
      ),
      {row_ctes}
      SELECT t.token, CAST(t.true_count AS BIGINT) AS true_count,
             {least} AS cms_estimate,
             {least} - t.true_count AS overestimate
      FROM top t
      {joins}
      ORDER BY t.true_count DESC, t.token
    """


def cms_heavy_hitters(
    df: DataFrame, key: Column | str, ppm_threshold: int = 7000
) -> DataFrame:
    """Heavy-hitter detection THROUGH the sketch — the production probe
    surface of the CMS (the streaming twin keeps the same 4×1024 cell
    state across micro-batches): a key is reported heavy when its CMS
    estimate clears `ppm_threshold` parts-per-million of the stream
    total. The decision uses integer cross-multiplication
    (est·10⁶ ≥ N·ppm) — no float compare, so the report is exactly
    oracled even at the threshold boundary.

    The candidate set probed here is the distinct keys (exact at test
    scale); at 100 TB the candidate set is whatever bounded working set
    the pipeline tracks (e.g. keys of the current window) — the probe
    itself stays D broadcast joins against W-cell row tables regardless
    of stream size. Output includes the exact count so the one-sided
    error (estimate ≥ true) is assertable per row."""
    key_col = F.col(key) if isinstance(key, str) else key
    keyed = df.select(key_col.cast("string").alias("key"))
    total = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    truth = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("true_count"))
    cells = keyed.groupBy(
        *[_cms_cell(F.col("key"), r).alias(f"c{r}") for r in range(CMS_D)]
    ).agg(F.count(F.lit(1)).alias("n"))
    probe = truth
    for r in range(CMS_D):
        row_tbl = cells.groupBy(F.col(f"c{r}").alias(f"cell{r}")).agg(
            F.sum("n").alias(f"n{r}")
        )
        probe = probe.join(
            F.broadcast(row_tbl), _cms_cell(F.col("key"), r) == F.col(f"cell{r}")
        )
    est = F.least(*[F.col(f"n{r}") for r in range(CMS_D)])
    return (
        probe.crossJoin(F.broadcast(total))
        .filter(est * 1000000 >= F.col("n_total") * ppm_threshold)
        .select(
            "key",
            "true_count",
            est.alias("cms_estimate"),
            (est - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.col("cms_estimate").desc(), "key")
    )


def CMS_HEAVY_SQL(
    table_expr: str, key_expr: str, ppm_threshold: int = 7000
) -> str:
    cell_defs = ",\n           ".join(
        f"{_cms_cell_sql('key', r)} AS c{r}" for r in range(CMS_D)
    )
    row_ctes = ",\n      ".join(
        f"row{r} AS (SELECT c{r} AS cell, CAST(SUM(n) AS BIGINT) AS n{r} "
        f"FROM cells GROUP BY c{r})"
        for r in range(CMS_D)
    )
    joins = "\n      ".join(
        f"JOIN row{r} ON row{r}.cell = {_cms_cell_sql('t.key', r)}"
        for r in range(CMS_D)
    )
    least = "least(" + ", ".join(f"n{r}" for r in range(CMS_D)) + ")"
    return f"""
      WITH keyed AS (
        SELECT CAST({key_expr} AS VARCHAR) AS key FROM {table_expr}
      ),
      total AS (SELECT COUNT(*) AS n_total FROM keyed),
      truth AS (SELECT key, COUNT(*) AS true_count FROM keyed GROUP BY key),
      cells AS (
        SELECT {cell_defs}, COUNT(*) AS n
        FROM keyed
        GROUP BY ALL
      ),
      {row_ctes}
      SELECT t.key, t.true_count,
             {least} AS cms_estimate,
             {least} - t.true_count AS overestimate
      FROM truth t
      {joins}
      , total
      WHERE {least} * 1000000 >= total.n_total * {ppm_threshold}
      ORDER BY cms_estimate DESC, t.key
    """
