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
    """DataSketches HLL at lgK=12 → ~1.6% std error; assert 10%."""
    li = load(spark, "lineitem", sf_dir)
    est = {
        (r.l_returnflag,): float(r.est_distinct)
        for r in sketches.hll_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    exact = _exact(li, ["l_returnflag"], F.col("l_partkey"))
    for key, n in exact.items():
        assert est[key] == pytest.approx(n, rel=0.1)


def test_approx_percentile_error_bound(spark, sf_dir):
    """GK sketch at accuracy 10^4 → rank error ≤ 1/10^4; generous 1%
    value-relative bound on this data."""
    from codex_africanus_spark.queries import registry

    r = registry()
    exact = r["exact_quantiles_price"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    approx = r["approx_percentile_price"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    for col in ["p25", "p50", "p75", "p99"]:
        rel = ((approx[col] - exact[col]).abs() / exact[col]).max()
        assert rel < 0.01, (col, rel)


def test_hll_union_rollup_matches_direct(spark, sf_dir):
    """HLL union of sub-sketches has identical register state to
    sketching the union — rollup estimates equal direct estimates
    exactly (the lossless-merge property)."""
    li = load(spark, "lineitem", sf_dir)
    direct = {
        (r.l_returnflag,): float(r.est_distinct)
        for r in sketches.hll_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    rolled = {
        (r.l_returnflag,): float(r.est_distinct)
        for r in sketches.hll_rollup_union(
            li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_partkey"
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
