"""Sinc-bounded BDA physics (reference bda_mapping.py:111-277)."""

import math

from pyspark.sql import functions as F

from codex_africanus_spark.operators import bda as bda_op
from codex_africanus_spark.sources import tpch_ms


def test_sinc_bda_full_table_invariants(spark, sf_dir):
    vis = tpch_ms.vis_table(spark, sf_dir)
    out = bda_op.bda_sinc_average(vis).cache()
    n_in = vis.count()
    # row conservation: every input row lands in exactly one bin
    assert out.agg(F.sum("n_rows")).collect()[0][0] == n_in
    # averaging actually happens (bins are not all singletons)
    assert out.filter(F.col("n_rows") > 1).count() > 0
    # auto-correlated baselines never split: one bin per autocorr baseline
    autos = out.filter(F.col("antenna1") == F.col("antenna2"))
    assert autos.count() == autos.select("antenna1").distinct().count()
    # autocorr bins carry the -1 delta_nu sentinel, cross bins a positive Δν
    assert autos.filter(F.col("delta_nu") != -1.0).count() == 0
    crosses = out.filter(F.col("antenna1") != F.col("antenna2"))
    assert crosses.filter(F.col("delta_nu") <= 0).count() == 0
    # interval_out spans at least the summed native intervals' endpoints
    bad = out.filter(F.col("interval_out") <= 0).count()
    assert bad == 0
    out.unpersist()


def test_sinc_closure_rule_matches_scalar_replay(spark):
    """Tiny frame where the closure decisions are hand-computable: rows
    along one baseline with growing uvw distance from the bin start must
    split exactly when quantized sinc(Δψ/2) drops below the tolerance."""
    K, GRID, TOL = bda_op.BDA_SINC_K, bda_op.BDA_SINC_GRID, bda_op.BDA_SINC_TOL_Q
    rows = []
    us = [0.0, 50.0, 120.0, 400.0, 410.0]  # |du| from start: 50,120,400 …
    for i, u in enumerate(us):
        rows.append(
            (i, float(1000 + 10 * i), 0, 1, u, 0.0, 0.0, 1.0, False, 2.0, 1.0, 2.0)
        )
    df = spark.createDataFrame(
        rows,
        "row_id long, time double, antenna1 int, antenna2 int, u double, "
        "v double, w double, interval double, flag_row boolean, "
        "vis_re double, vis_im double, weight double",
    )
    out = {r["bin_idx"]: r for r in bda_op.bda_sinc_average(df).collect()}

    # scalar replay of the reference rule
    def closes(du):
        half = math.sqrt(du * du) * K + 1e-8
        s = math.sin(half) / half
        q = int(math.floor(abs(s) * GRID + 0.5)) * (1 if s >= 0 else -1)
        return q < TOL

    # bin starts at u=0; u=50 and u=120 are within tolerance, u=400 closes
    assert not closes(50.0) and not closes(120.0) and closes(400.0)
    # u=410 vs new start 400: |du|=10, stays
    assert not closes(10.0)
    assert len(out) == 2
    assert out[0]["n_rows"] == 3 and out[1]["n_rows"] == 2
