"""Complex/Jones expression bundles vs NumPy reference formulae
(backend-equivalence style, SURVEY.md §5 item 5)."""

import numpy as np
from pyspark.sql import functions as F

from codex_africanus_spark.functions.complex_algebra import Cplx, cexp_i
from codex_africanus_spark.functions.jones import Jones2x2, jones_chain


def _cplx_df(spark):
    rows = [(float(i), 0.3 * i, -0.7 + 0.2 * i, 1.1 * i) for i in range(1, 9)]
    return spark.createDataFrame(rows, "ar double, ai double, br double, bi double")


def test_complex_mul_div_conj(spark):
    df = _cplx_df(spark)
    a = Cplx(F.col("ar"), F.col("ai"))
    b = Cplx(F.col("br"), F.col("bi"))
    out = df.select(
        *(a * b).alias_pair("mul"),
        *(a / b).alias_pair("div"),
        *a.conj().alias_pair("conj"),
        a.abs2().alias("abs2"),
    ).toPandas()
    za = np.array([complex(r, i) for r, i, _, _ in df.collect()])
    zb = np.array([complex(r, i) for _, _, r, i in df.collect()])
    np.testing.assert_allclose(out.mul_re + 1j * out.mul_im, za * zb, rtol=1e-12)
    np.testing.assert_allclose(out.div_re + 1j * out.div_im, za / zb, rtol=1e-12)
    np.testing.assert_allclose(out.conj_im, -za.imag)
    np.testing.assert_allclose(out.abs2, np.abs(za) ** 2, rtol=1e-12)


def test_cexp_matches_numpy(spark):
    df = spark.range(10).select((F.col("id") * 0.77).alias("theta"))
    out = df.select(*cexp_i(F.col("theta")).alias_pair("z")).toPandas()
    theta = np.arange(10) * 0.77
    np.testing.assert_allclose(out.z_re + 1j * out.z_im, np.exp(1j * theta), rtol=1e-12)


def _rand_jones(rng):
    return (rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2)))


def test_jones_chain_matches_numpy(spark):
    rng = np.random.default_rng(42)
    A, X, B = _rand_jones(rng), _rand_jones(rng), _rand_jones(rng)

    def lift(mat):
        return Jones2x2(
            *[Cplx(F.lit(float(mat[i, j].real)), F.lit(float(mat[i, j].imag)))
              for i in range(2) for j in range(2)]
        )

    df = spark.range(1)
    out = df.select(*jones_chain(lift(A), lift(X), lift(B)).corr_columns("c")).toPandas()
    expected = A @ X @ B.conj().T
    got = np.array(
        [
            [out.c_xx_re[0] + 1j * out.c_xx_im[0], out.c_xy_re[0] + 1j * out.c_xy_im[0]],
            [out.c_yx_re[0] + 1j * out.c_yx_im[0], out.c_yy_re[0] + 1j * out.c_yy_im[0]],
        ]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_jones_inverse(spark):
    rng = np.random.default_rng(7)
    A = _rand_jones(rng)

    def lift(mat):
        return Jones2x2(
            *[Cplx(F.lit(float(mat[i, j].real)), F.lit(float(mat[i, j].imag)))
              for i in range(2) for j in range(2)]
        )

    j = lift(A)
    out = spark.range(1).select(*(j @ j.inverse()).corr_columns("c")).toPandas()
    np.testing.assert_allclose(out.c_xx_re[0], 1.0, atol=1e-12)
    np.testing.assert_allclose(out.c_yy_re[0], 1.0, atol=1e-12)
    np.testing.assert_allclose(
        [out.c_xy_re[0], out.c_xy_im[0], out.c_yx_re[0], out.c_yx_im[0]], 0.0, atol=1e-12
    )


def test_convert_schema_compiler_errors_and_defaults(spark):
    import pytest
    from pyspark.sql import functions as F

    from codex_africanus_spark.functions.stokes import MissingStokesError, convert

    # defaults: missing U/V → 0
    out = convert({"I": F.lit(2.0), "Q": F.lit(0.5)}, ["XX", "XY"], "linear")
    row = spark.range(1).select(
        out["XX"].re.alias("xxr"), out["XY"].re.alias("xyr"), out["XY"].im.alias("xyi")
    ).collect()[0]
    assert row.xxr == 2.5 and row.xyr == 0.0 and row.xyi == 0.0
    # strict mode raises at compile time
    with pytest.raises(MissingStokesError):
        convert({"I": F.lit(1.0)}, ["XY"], "linear", default_missing=False)
    # unknown corr raises
    with pytest.raises(ValueError):
        convert({"I": F.lit(1.0)}, ["RR"], "linear")


def test_convert_general_priority_and_errors(spark):
    """Any-subset → any-output compiler (reference conversion.py:56-205):
    priority prefers real inputs over defaults, falls through to the
    second candidate pair when the first is unavailable, and refuses to
    default correlation inputs."""
    import pytest
    from pyspark.sql import functions as F

    from codex_africanus_spark.functions.stokes import (
        MissingConversionInputs,
        convert_general,
    )

    # ['I'] -> full linear corr set via implicit defaults (the
    # reference's motivating example)
    out = convert_general({"I": F.lit(3.0)}, ["XX", "XY", "YX", "YY"])
    r = spark.range(1).select(
        out["XX"].re.alias("xx"), out["YY"].re.alias("yy"),
        out["XY"].re.alias("xyr"), out["XY"].im.alias("xyi"),
    ).collect()[0]
    assert (r.xx, r.yy, r.xyr, r.xyi) == (3.0, 3.0, 0.0, 0.0)

    # partial circular {RR, LL, RL}: I and V satisfiable via (RR,LL);
    # Q needs (XX,YY) or (RL,LR) — LR is missing and corr inputs never
    # default, so Q must raise
    avail = {"RR": F.lit(2.0), "LL": F.lit(1.0), "RL": F.lit(0.5)}
    out = convert_general(avail, ["I", "V"], implicit_stokes=False)
    r = spark.range(1).select(
        out["I"].re.alias("i"), out["V"].re.alias("v")
    ).collect()[0]
    assert (r.i, r.v) == (1.5, 0.5)
    with pytest.raises(MissingConversionInputs):
        convert_general(avail, ["Q"], implicit_stokes=False)
    # implicit_stokes does NOT rescue corr->stokes outputs either
    with pytest.raises(MissingConversionInputs):
        convert_general(avail, ["Q"], implicit_stokes=True)

    # priority: with BOTH linear and circular inputs available, I uses
    # the first-listed (XX,YY) pair, not (RR,LL)
    both = {"XX": F.lit(10.0), "YY": F.lit(4.0), "RR": F.lit(100.0), "LL": F.lit(0.0)}
    out = convert_general(both, ["I"], implicit_stokes=False)
    assert spark.range(1).select(out["I"].re.alias("i")).collect()[0].i == 7.0

    # unknown output name
    with pytest.raises(ValueError):
        convert_general({"I": F.lit(1.0)}, ["ZZ"])
