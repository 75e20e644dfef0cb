"""Property-based tests (hypothesis) for the expression algebra —
SURVEY §5 item 4 (property/adjointness tests instead of golden data)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from codex_africanus_spark.functions.complex_algebra import Cplx
from codex_africanus_spark.functions.coordinates import lm_to_radec, radec_to_lmn

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)


def _eval(spark, cols):
    return spark.range(1).select(*cols).collect()[0]


@settings(max_examples=20, deadline=None)
@given(ar=finite, ai=finite, br=finite, bi=finite)
def test_complex_mul_matches_python(spark_h, ar, ai, br, bi):
    a, b = complex(ar, ai), complex(br, bi)
    z = Cplx(F.lit(ar), F.lit(ai)) * Cplx(F.lit(br), F.lit(bi))
    row = _eval(spark_h, z.alias_pair("z"))
    expected = a * b
    assert math.isclose(row.z_re, expected.real, rel_tol=1e-12, abs_tol=1e-9)
    assert math.isclose(row.z_im, expected.imag, rel_tol=1e-12, abs_tol=1e-9)


@settings(max_examples=20, deadline=None)
@given(ar=finite, ai=finite)
def test_conj_involution_and_abs2(spark_h, ar, ai):
    z = Cplx(F.lit(ar), F.lit(ai))
    row = _eval(
        spark_h,
        [*z.conj().conj().alias_pair("zz"), (z * z.conj()).re.alias("zzbar_re"),
         (z * z.conj()).im.alias("zzbar_im")],
    )
    assert row.zz_re == ar and row.zz_im == ai
    assert math.isclose(row.zzbar_re, ar * ar + ai * ai, rel_tol=1e-12)
    assert abs(row.zzbar_im) < 1e-9


small_angle = st.floats(min_value=-0.3, max_value=0.3, allow_nan=False)


@settings(max_examples=20, deadline=None)
@given(ra=small_angle, dec=small_angle)
def test_radec_lm_roundtrip(spark_h, ra, dec):
    """lm(radec) then radec(lm) is the identity on the tangent-plane
    domain (reference coordinates.py forward/inverse pair)."""
    ra0, dec0 = 0.05, -0.02
    l, m, n = radec_to_lmn(F.lit(ra), F.lit(dec), F.lit(ra0), F.lit(dec0))
    ra2, dec2 = lm_to_radec(l, m, F.lit(ra0), F.lit(dec0))
    row = _eval(spark_h, [ra2.alias("ra"), dec2.alias("dec")])
    assert math.isclose(row.ra, ra, abs_tol=1e-9)
    assert math.isclose(row.dec, dec, abs_tol=1e-9)


def test_dft_adjointness(spark_h):
    """⟨V, A·I⟩ = ⟨Aᴴ·V, I⟩ for the forward/adjoint DFT pair
    (the reference's wgridder adjointness identity,
    test_wgridder.py:125-188, rtol 2e-13 float64)."""
    rng = np.random.default_rng(17)
    n_row, n_src = 40, 6
    u, v, w = (rng.uniform(-100, 100, n_row) for _ in range(3))
    l, m = (rng.uniform(-0.05, 0.05, n_src) for _ in range(2))
    nn = np.sqrt(1 - l * l - m * m)
    freq = 1.2e9
    c = 2.0 * np.pi / 2.99792458e8
    phase = -c * (np.outer(u, l) + np.outer(v, m) + np.outer(w, nn - 1)) * freq
    A = np.exp(1j * phase)  # (row, src) forward operator
    vis = rng.standard_normal(n_row) + 1j * rng.standard_normal(n_row)
    img = rng.standard_normal(n_src)
    lhs = np.vdot(vis, A @ img).real
    rhs = np.vdot(A.conj().T @ vis, img).real
    np.testing.assert_allclose(lhs, rhs, rtol=2e-13)


# session-scoped fixture alias (hypothesis needs a non-function-scoped fixture)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_h(spark):
    return spark
