"""Distinct-count sketches: KMV determinism + error bounds, HLL merge
identity (ROADMAP #6)."""

import pyspark.sql.functions as F
import pytest

from codex_africanus_spark.operators import sketches
from codex_africanus_spark.sources.tables import load


def _exact(df, keys, col):
    return {
        tuple(r[k] for k in keys): r.n
        for r in df.groupBy(*keys).agg(F.countDistinct(col).alias("n")).collect()
    }


def test_kmv_error_bound(spark, sf_dir):
    """KMV std error ≈ 1/sqrt(k) ≈ 12.5% at k=64; assert 4σ."""
    orders = load(spark, "orders", sf_dir)
    col = F.col("o_custkey").cast("string")
    est = {
        (r.o_orderpriority,): r.est_distinct
        for r in sketches.kmv_distinct(orders, ["o_orderpriority"], col).collect()
    }
    exact = _exact(orders, ["o_orderpriority"], col)
    assert est.keys() == exact.keys()
    for key, n in exact.items():
        assert est[key] == pytest.approx(n, rel=0.5)


def test_kmv_prefilter_is_semantics_preserving(spark, sf_dir):
    """The approx-count prefilter (the 100 TB scale guard) must not
    change a single estimate."""
    orders = load(spark, "orders", sf_dir)
    col = F.col("o_custkey").cast("string")
    with_f = sketches.kmv_distinct(orders, ["o_orderpriority"], col, prefilter=True)
    without = sketches.kmv_distinct(orders, ["o_orderpriority"], col, prefilter=False)
    assert sorted(map(tuple, with_f.collect())) == sorted(map(tuple, without.collect()))


def test_kmv_small_group_exact(spark, sf_dir):
    """Groups with < k distinct values report the exact count."""
    nation = load(spark, "nation", sf_dir)
    out = sketches.kmv_distinct(
        nation, ["n_regionkey"], F.col("n_name"), k=64
    ).collect()
    exact = _exact(nation, ["n_regionkey"], F.col("n_name"))
    for r in out:
        assert r.est_distinct == exact[(r.n_regionkey,)]


def test_hll_error_bound(spark, sf_dir):
    """Expression-level HLL at m=64 → ~13% std error (1.04/√64);
    assert a 3σ 40% relative bound against the exact distinct."""
    li = load(spark, "lineitem", sf_dir)
    col = F.col("l_partkey").cast("string")
    est = {
        (r.l_returnflag,): float(r.est_distinct)
        for r in sketches.hll_distinct(li, ["l_returnflag"], col).collect()
    }
    exact = _exact(li, ["l_returnflag"], F.col("l_partkey"))
    for key, n in exact.items():
        assert est[key] == pytest.approx(n, rel=0.4)


def test_hll_partition_invariant(spark, sf_dir):
    """Register state (max per bucket) is partition-order independent —
    the property that makes the estimate exactly oracle-checkable."""
    li = load(spark, "lineitem", sf_dir)
    col = F.col("l_partkey").cast("string")
    a = sketches.hll_distinct(li, ["l_returnflag"], col).collect()
    b = sketches.hll_distinct(li.repartition(17), ["l_returnflag"], col).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_approx_percentile_error_bound(spark, sf_dir):
    """Grid-sketch percentiles: within one $100 step of the RANK (type-1)
    quantile by construction; the exact tier interpolates (type 7), which
    can land one order statistic past the grid's target rank, so assert
    the one-step bound against the rank quantile computed directly."""
    from codex_africanus_spark.queries import registry

    li = load(spark, "lineitem", sf_dir)
    cents = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    qs = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p99", 99, 100)]
    rank_aggs = []
    for name, num, den in qs:
        # value at rank ceil(q*n): max of the smallest ceil(q*n) values
        rank_aggs.append(
            F.expr(
                f"max(c) FILTER (WHERE rk <= ({num} * n + {den - 1}) DIV {den})"
            ).alias(name)
        )
    from pyspark.sql import Window

    ranked = (
        li.select(F.expr(cents).alias("c"), "l_returnflag")
        .withColumn("rk", F.row_number().over(
            Window.partitionBy("l_returnflag").orderBy("c")))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")))
    )
    rank_q = ranked.groupBy("l_returnflag").agg(*rank_aggs).toPandas().set_index(
        "l_returnflag"
    )
    approx = (
        registry()["approx_percentile_price"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    for name, _, _ in qs:
        diff = approx[f"{name}_cents"] - rank_q[name]
        assert (diff >= 0).all() and (diff <= 10000).all(), (name, diff)


def test_gk_approx_percentile_error_bound(spark, sf_dir):
    """Spark's native GK sketch (accuracy 10^4, rank error ≤ 1/10^4)
    stays exercised against the exact tier even though the registered
    headline query uses the deterministic grid sketch."""
    from codex_africanus_spark.queries import registry

    li = load(spark, "lineitem", sf_dir)
    aggs = [
        F.expr(f"approx_percentile(l_extendedprice, {q}, 10000)").alias(
            f"p{int(q * 100)}"
        )
        for q in (0.25, 0.50, 0.75, 0.99)
    ]
    gk = li.groupBy("l_returnflag").agg(*aggs).toPandas().set_index("l_returnflag")
    exact = (
        registry()["exact_quantiles_price"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    for col in ["p25", "p50", "p75", "p99"]:
        rel = ((gk[col] - exact[col]).abs() / exact[col]).max()
        assert rel < 0.01, (col, rel)


def test_hll_union_rollup_matches_direct(spark, sf_dir):
    """HLL union of sub-sketches has identical register state to
    sketching the union — rollup estimates equal direct estimates
    exactly (the lossless register-max merge property)."""
    li = load(spark, "lineitem", sf_dir)
    col = F.col("l_partkey").cast("string")
    direct = {
        (r.l_returnflag,): float(r.est_distinct)
        for r in sketches.hll_distinct(li, ["l_returnflag"], col).collect()
    }
    rolled = {
        (r.l_returnflag,): float(r.est_distinct)
        for r in sketches.hll_rollup_union(
            li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], col
        ).collect()
    }
    assert direct == rolled


# ---------------------------------------------------------------------------
# Grid quantile sketch (KLL role)
# ---------------------------------------------------------------------------

def test_grid_quantile_error_bound(spark, sf_dir):
    """Estimate is an upper bound within one grid step of the exact
    percentile (value-error guarantee of the fixed grid)."""
    from codex_africanus_spark.operators import sketches
    from codex_africanus_spark.sources.tables import load

    li = load(spark, "lineitem", sf_dir)
    cents = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    sk = sketches.grid_quantile_sketch(li, ["l_returnflag"], cents, 50000, 200)
    est = {
        r.l_returnflag: r.p50_cents
        for r in sketches.grid_quantile_estimate(
            sk, ["l_returnflag"], [("p50_cents", 1, 2)], 50000
        ).collect()
    }
    exact = {
        r.l_returnflag: r.p50
        for r in li.groupBy("l_returnflag")
        .agg(F.expr(f"percentile({cents}, 0.5)").alias("p50"))
        .collect()
    }
    for k, e in exact.items():
        assert 0 <= est[k] - e <= 50000, (k, est[k], e)


def test_grid_quantile_rollup_lossless(spark, sf_dir):
    """Merging fine sub-sketches == sketching the coarse group directly,
    bit-for-bit (the property KLL's randomized merge lacks)."""
    from codex_africanus_spark.operators import sketches
    from codex_africanus_spark.sources.tables import load

    li = load(spark, "lineitem", sf_dir).withColumn(
        "supp_shard", (F.col("l_suppkey") % 7).cast("int")
    )
    cents = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    fine = sketches.grid_quantile_sketch(
        li, ["l_returnflag", "l_linestatus", "supp_shard"], cents, 50000, 200
    )
    merged = sketches.grid_quantile_rollup(fine, ["l_returnflag"])
    direct = sketches.grid_quantile_sketch(li, ["l_returnflag"], cents, 50000, 200)
    a = {(r.l_returnflag, r.bucket): r.cnt for r in merged.collect()}
    b = {(r.l_returnflag, r.bucket): r.cnt for r in direct.collect()}
    assert a == b


def test_grid_quantile_partition_invariant(spark, sf_dir):
    from codex_africanus_spark.operators import sketches
    from codex_africanus_spark.sources.tables import load

    li = load(spark, "lineitem", sf_dir)
    cents = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    qs = [("p50_cents", 1, 2), ("p95_cents", 19, 20)]
    a = sketches.grid_quantile_estimate(
        sketches.grid_quantile_sketch(li, ["l_returnflag"], cents, 50000, 200),
        ["l_returnflag"], qs, 50000,
    ).collect()
    b = sketches.grid_quantile_estimate(
        sketches.grid_quantile_sketch(
            li.repartition(17), ["l_returnflag"], cents, 50000, 200
        ),
        ["l_returnflag"], qs, 50000,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_intersection_accuracy(spark, sf_dir):
    """Theta-intersection estimates must land within sketch error of the
    exact overlaps (k=64 -> RSE ~ 1/sqrt(k-2) ~ 12.6%; assert 3 sigma)."""
    from pyspark.sql import functions as F
    from codex_africanus_spark.operators import sketches as sk

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    est = sk.kmv_intersection(
        orders, "o_orderpriority", F.col("o_custkey").cast("string"), k=64
    ).toPandas().set_index(["seg_a", "seg_b"])
    segs = orders.select(
        F.col("o_orderpriority").alias("seg"), "o_custkey"
    ).distinct().toPandas()
    by_seg = {s: set(g.o_custkey) for s, g in segs.groupby("seg")}
    names = sorted(by_seg)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            exact = len(by_seg[a] & by_seg[b])
            got = est.loc[(a, b)].est_common
            assert abs(got - exact) <= max(0.4 * exact, 10), (a, b, got, exact)


def test_cms_one_sided_and_merge(spark, sf_dir):
    """CMS invariants: estimate >= true for every probed token, and the
    merged sketch of two corpus halves equals the whole-corpus sketch
    (cell-wise additivity)."""
    from pyspark.sql import functions as F
    from codex_africanus_spark.operators import sketches as sk

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = sk.cms_token_estimates(doc).toPandas()
    assert (est.overestimate >= 0).all()
    assert (est.cms_estimate >= est.true_count).all()

    # additivity: per-cell counts over halves sum to the whole
    tok = doc.select(F.explode(F.split("text", " ")).alias("token"),
                     (F.col("doc_id") % 2).alias("half"))
    whole = tok.groupBy(sk._cms_cell(F.col("token"), 0).alias("c")).count()
    halves = (
        tok.groupBy("half", sk._cms_cell(F.col("token"), 0).alias("c")).count()
        .groupBy("c").agg(F.sum("count").alias("count"))
    )
    w = {r.c: r["count"] for r in whole.collect()}
    h = {r.c: r["count"] for r in halves.collect()}
    assert w == h
