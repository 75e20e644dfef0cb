"""Physics invariants for the round-5 radio diagnostics: closure-phase
gain cancellation, uvlin exactness on linear spectra, delay-fit slope
recovery, RFI detector behavior on planted outliers."""

import math

from pyspark.sql import functions as F

from codex_africanus_spark.operators import calibration as cal_op


def _mk_vis(spark, rows):
    return spark.createDataFrame(
        rows,
        "row_id long, time double, antenna1 int, antenna2 int, chan int, "
        "vis_re double, vis_im double",
    )


def test_closure_phase_cancels_antenna_gains(spark):
    """THE defining property: multiplying V_pq by g_p·g_q* (phase-only
    antenna gains) leaves the triangle sum arg(V_ab)+arg(V_bc)−arg(V_ac)
    unchanged — the phases of g cancel around the triangle."""
    base = {(0, 1): (2.0, 0.5), (1, 2): (1.0, -0.8), (0, 2): (1.5, 1.1)}
    phases = {0: 0.3, 1: -0.7, 2: 1.2}

    def rows(gains):
        out = []
        for i, ((a, b), (re, im)) in enumerate(base.items()):
            if gains:
                th = phases[a] - phases[b]  # g_a · g_b* for unit gains
                re, im = (
                    re * math.cos(th) - im * math.sin(th),
                    re * math.sin(th) + im * math.cos(th),
                )
            out.append((i, 100.0, a, b, 0, re, im))
        return out

    clean = {
        (r["a"], r["b"], r["c"]): r["closure_rad"]
        for r in cal_op.closure_phases(_mk_vis(spark, rows(False))).collect()
    }
    corrupt = {
        (r["a"], r["b"], r["c"]): r["closure_rad"]
        for r in cal_op.closure_phases(_mk_vis(spark, rows(True))).collect()
    }
    assert set(clean) == {(0, 1, 2)} == set(corrupt)
    # gains cancel to the VIS quantization grid: the 1e-6 fixed-point
    # vis sums perturb each leg's phase by ~1e-6/|V| before the exact
    # 1e-9 phase quantization
    assert abs(clean[(0, 1, 2)] - corrupt[(0, 1, 2)]) <= 5e-6
    # and the closure value itself matches the scalar triangle sum
    expected = (
        math.atan2(0.5, 2.0) + math.atan2(-0.8, 1.0) - math.atan2(1.1, 1.5)
    )
    assert abs(clean[(0, 1, 2)] - expected) <= 5e-6


def test_uvlin_zero_residual_on_linear_spectrum(spark):
    """A visibility spectrum that is exactly linear in channel must
    subtract to (quantization-grid) zero at every channel."""
    rows = [
        (c, 100.0, 0, 1, c, 2.0 + 0.5 * c, 1.0 - 0.25 * c) for c in range(8)
    ]
    out = cal_op.uvlin_continuum_subtract(_mk_vis(spark, rows)).collect()
    assert len(out) == 8
    for r in out:
        assert abs(r["line_re"]) <= 2e-6
        assert abs(r["line_im"]) <= 2e-6


def test_delay_fit_recovers_planted_slope(spark):
    """Visibilities e^{i(0.1 + 0.05·chan)} must fit slope 0.05 and
    intercept 0.1 (phases well inside ±π: no wrapping)."""
    rows = [
        (c, 100.0, 0, 1, c, math.cos(0.1 + 0.05 * c), math.sin(0.1 + 0.05 * c))
        for c in range(8)
    ]
    vis = _mk_vis(spark, rows).withColumn("weight", F.lit(1.0))
    [r] = cal_op.fit_delay_slope(vis).collect()
    assert abs(r["phase_slope_rad_per_chan"] - 0.05) < 1e-6
    assert abs(r["phase_intercept_rad"] - 0.1) < 1e-6


def test_rfi_report_flags_planted_outlier(spark, sf_dir):
    """The registered RFI report must flag something on the synthetic
    data and never exceed the population (sanity bounds)."""
    from codex_africanus_spark.queries import registry

    out = registry()["rfi_zscore_flag_report"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(0 <= r["n_rfi_flagged"] <= r["n_samples"] for r in out)
    assert all(0 <= r["rfi_ppm"] <= 1_000_000 for r in out)
