"""Arbitrary-order 2-D shapelet UDF vs a direct scalar-loop reference
implementation of the formulae in
/root/reference/africanus/model/shape/shapelets.py (backend-equivalence
testing style, SURVEY §5 item 5)."""

import math

import numpy as np
from pyspark.sql import functions as F

from codex_africanus_spark.operators.shapelets import shapelet_2d
from codex_africanus_spark.sources import tpch_ms

TWO_PI = 6.283185307179586
C = 299792458.0


def ref_basis(n, xx, beta, delta_x):
    """Scalar complex_basis_function (shapelets.py:36-44), independent
    reimplementation for the test oracle."""
    x = 2 * np.pi * xx
    scale = 1.0 / beta
    herm = [1.0, 2 * (x / scale)]
    for k in range(2, n + 1):
        herm.append(2 * (x / scale) * herm[k - 1] - 2 * (k - 1) * herm[k - 2])
    basis = 1.0 / math.sqrt(2.0**n * math.sqrt(math.pi) * math.factorial(n) * scale)
    expo = herm[n] * math.exp(-(x**2) / (2.0 * scale**2))
    return (1.0j**n) * basis * expo * math.sqrt(2 * np.pi) / delta_x


def _frame(spark, sf_dir, n_rows=40):
    vis = tpch_ms.vis_table(spark, sf_dir).limit(n_rows)
    return (
        vis.select("row_id", "chan", "u", "v", "frequency")
        .withColumn("u_coord", F.col("u") / F.lit(500.0))
        .withColumn("v_coord", F.col("v") / F.lit(500.0))
        .withColumn("beta_u", F.lit(0.08))
        .withColumn("beta_v", F.lit(0.05))
    )


def test_fixed_matrix_matches_reference_formula(spark, sf_dir):
    coeffs = [[0.5, -0.25, 0.1], [0.3, 0.0, 0.2], [-0.4, 0.15, 0.05],
              [0.12, -0.07, 0.02], [0.0, 0.09, -0.03]]  # 5x3: orders > 3
    df = _frame(spark, sf_dir)
    got = shapelet_2d(df, coeffs, delta_l=0.02, delta_m=0.02).toPandas()
    assert len(got) > 0
    for r in got.itertuples():
        fu = r.u_coord * TWO_PI * r.frequency / C
        fv = r.v_coord * TWO_PI * r.frequency / C
        want = sum(
            c * ref_basis(n1, fu, 0.08, 0.02) * ref_basis(n2, fv, 0.05, 0.02)
            for n1, row in enumerate(coeffs)
            for n2, c in enumerate(row)
            if c != 0.0
        )
        np.testing.assert_allclose(r.sh_re, want.real, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(r.sh_im, want.imag, rtol=1e-10, atol=1e-12)


def test_zero_beta_short_circuits_to_one(spark, sf_dir):
    """beta == 0 -> envelope 1 (shapelets.py:85-87)."""
    df = _frame(spark, sf_dir).withColumn("beta_u", F.lit(0.0))
    got = shapelet_2d(df, [[1.0, 0.5], [0.25, -0.125]]).toPandas()
    assert (got.sh_re == 1.0).all() and (got.sh_im == 0.0).all()


def test_per_source_coeff_matrices(spark, sf_dir):
    """The reference signature carries per-source (nmax1, nmax2) coeff
    matrices (shapelets.py:63-64): ragged array<array<double>> column,
    padded and einsum-reduced in one Arrow batch."""
    df = _frame(spark, sf_dir).withColumn(
        "cmat",
        F.when(
            F.col("row_id") % 2 == 0,
            F.array(F.array(F.lit(1.0), F.lit(0.5)), F.array(F.lit(0.25), F.lit(0.0))),
        ).otherwise(
            F.array(
                F.array(F.lit(0.3)), F.array(F.lit(0.2)), F.array(F.lit(0.1)),
                F.array(F.lit(-0.05)), F.array(F.lit(0.02)),
            )
        ),
    )
    got = shapelet_2d(df, "cmat", delta_l=0.02, delta_m=0.02).toPandas()
    assert len(got) > 0
    for r in got.itertuples():
        fu = r.u_coord * TWO_PI * r.frequency / C
        fv = r.v_coord * TWO_PI * r.frequency / C
        cm = [[1.0, 0.5], [0.25, 0.0]] if r.row_id % 2 == 0 else [
            [0.3], [0.2], [0.1], [-0.05], [0.02]]
        want = sum(
            c * ref_basis(n1, fu, 0.08, 0.02) * ref_basis(n2, fv, 0.05, 0.02)
            for n1, row in enumerate(cm)
            for n2, c in enumerate(row)
        )
        np.testing.assert_allclose(r.sh_re, want.real, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(r.sh_im, want.imag, rtol=1e-9, atol=1e-12)
