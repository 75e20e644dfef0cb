"""Source shape envelopes (Gaussian; shapelet stub) as Column expressions.

Parity with /root/reference/africanus/model/shape/gaussian_shape.py:12-90:
project (emaj, emin, position angle) onto the rotated (u,v), scale by
fwhm = 2·sqrt(2·ln 2) inverse and frequency, return exp(−(fu₁² + fv₁²)).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from codex_africanus_spark.constants import LIGHTSPEED

# fwhm scaling constant (gaussian_shape.py:24-27)
FWHM = 2.0 * math.sqrt(2.0 * math.log(2.0))
FWHMINV = 1.0 / FWHM
GAUSS_SCALE = FWHMINV * math.sqrt(2.0) * math.pi / LIGHTSPEED


def gaussian(
    u: Column,
    v: Column,
    frequency: Column,
    emaj: Column,
    emin: Column,
    angle: Column,
) -> Column:
    """Gaussian envelope per (source,row,chan) (gaussian_shape.py:34-80)."""
    fwhm_ratio = emin / emaj
    scaled_freq = frequency * F.lit(GAUSS_SCALE)
    # rotate uv by position angle
    u1 = (u * F.cos(angle) + v * F.sin(angle)) * fwhm_ratio * (scaled_freq * emaj)
    v1 = (-u * F.sin(angle) + v * F.cos(angle)) * (scaled_freq * emaj)
    return F.exp(-(u1 * u1 + v1 * v1))


def shapelet_1d(x: Column, coeffs: list[float], beta: float) -> Column:
    """1-D shapelet basis evaluation Σ cₙ · φₙ(x/β), closed-form Hermite
    polynomials up to the given coefficient count (parity with the
    recursion at /root/reference/africanus/model/shape/shapelets.py:10-55;
    the reference jits the recursion, here orders ≤ 3 unroll to Column
    expressions so the common case stays in codegen — higher orders take
    the pandas-UDF path like the beam cube).

    φₙ(x) = Hₙ(x)·exp(−x²/2) / sqrt(2ⁿ·n!·sqrt(π))
    H₀=1, H₁=2x, H₂=4x²−2, H₃=8x³−12x.
    """
    if len(coeffs) > 4:
        raise ValueError("expression path supports orders 0..3; use the UDF path")
    xb = x / F.lit(beta)
    env = F.exp(-(xb * xb) / F.lit(2.0))
    pi_r4 = math.pi ** 0.25
    hermites = [
        F.lit(1.0),
        2.0 * xb,
        4.0 * xb * xb - F.lit(2.0),
        8.0 * xb * xb * xb - 12.0 * xb,
    ]
    norms = [
        1.0 / pi_r4,
        1.0 / (math.sqrt(2.0) * pi_r4) / math.sqrt(1.0),
        1.0 / (2.0 * pi_r4) / math.sqrt(2.0),
        1.0 / (2.0 * math.sqrt(2.0) * pi_r4) / math.sqrt(6.0),
    ]
    total = F.lit(0.0)
    for c, h, nrm in zip(coeffs, hermites, norms):
        total = total + F.lit(c) * h * F.lit(nrm) * env
    return total


def _dlit(v: float) -> str:
    """Double literal for DuckDB: scientific suffix forces DOUBLE parsing
    (a bare long decimal would become DECIMAL and convert differently)."""
    r = repr(float(v))
    return r if ("e" in r or "inf" in r or "nan" in r) else f"{r}e0"


def shapelet_1d_sql(x: str, coeffs: list[float], beta: float) -> str:
    """SQL mirror of shapelet_1d with identical arithmetic structure."""
    xb = f"(({x}) / {_dlit(beta)})"
    env = f"exp(-({xb} * {xb}) / 2.0)"
    pi_r4 = math.pi ** 0.25
    hermites = [
        "1.0",
        f"(2.0 * {xb})",
        f"(4.0 * {xb} * {xb} - 2.0)",
        f"(8.0 * {xb} * {xb} * {xb} - 12.0 * {xb})",
    ]
    norms = [
        1.0 / pi_r4,
        1.0 / (math.sqrt(2.0) * pi_r4) / math.sqrt(1.0),
        1.0 / (2.0 * pi_r4) / math.sqrt(2.0),
        1.0 / (2.0 * math.sqrt(2.0) * pi_r4) / math.sqrt(6.0),
    ]
    total = "0.0"
    for c, h, nrm in zip(coeffs, hermites, norms):
        total = f"({total} + {_dlit(c)} * {h} * {_dlit(nrm)} * {env})"
    return total


def shapelet_2d_sql_columns(
    u: str,
    v: str,
    freq: str,
    bu: str,
    bv: str,
    coeffs,
    delta_l: float = 0.01,
    delta_m: float = 0.01,
) -> str:
    """DuckDB mirror of operators/shapelets.shapelet_2d (fixed-matrix
    path): emits a comma-joined list of stepwise computed SELECT aliases
    (DuckDB lateral column references) ending in `sh_re`, `sh_im`, with
    term order, operation order, and scalar literals identical to the
    UDF's NumPy arithmetic — so results hash-match exactly after the
    caller's round()."""
    from codex_africanus_spark.operators.shapelets import (
        LIGHTSPEED,
        TWO_PI,
        basis_konstants,
    )

    C = [[float(c) for c in row] for row in coeffs]
    K1, K2 = len(C), len(C[0])
    tp, ls = _dlit(TWO_PI), _dlit(LIGHTSPEED)
    cols: list[str] = []

    def dim(tag: str, coord: str, beta: str, kmax: int, delta: float) -> None:
        konsts = basis_konstants(kmax)
        flit = _dlit(math.sqrt(TWO_PI) / delta)
        cols.append(f"(({coord}) * {tp}) * ({freq}) / {ls} AS fx{tag}")
        cols.append(f"{tp} * fx{tag} AS x{tag}")
        cols.append(
            f"1.0 / (CASE WHEN ({beta}) = 0.0 THEN 1.0 ELSE ({beta}) END) AS s{tag}"
        )
        cols.append(f"x{tag} / s{tag} AS xs{tag}")
        cols.append(
            f"exp(-(x{tag} * x{tag}) / ((2.0 * s{tag}) * s{tag})) AS env{tag}"
        )
        cols.append(f"1.0 AS h0{tag}")
        if kmax > 1:
            cols.append(f"2.0 * xs{tag} AS h1{tag}")
        for n in range(2, kmax):
            cols.append(
                f"((2.0 * xs{tag}) * h{n - 1}{tag})"
                f" - ({_dlit(2.0 * (n - 1))} * h{n - 2}{tag}) AS h{n}{tag}"
            )
        for n, k in enumerate(konsts):
            cols.append(
                f"(((1.0 / sqrt({_dlit(k)} * s{tag})) * h{n}{tag})"
                f" * env{tag}) * {flit} AS r{n}{tag}"
            )

    dim("u", u, bu, K1, delta_l)
    dim("v", v, bv, K2, delta_m)
    re_expr, im_expr = "0.0", "0.0"
    for n1 in range(K1):
        for n2 in range(K2):
            c = C[n1][n2]
            if c == 0.0:
                continue
            t = f"(({_dlit(c)} * r{n1}u) * r{n2}v)"
            k = (n1 + n2) % 4
            if k == 0:
                re_expr = f"({re_expr} + {t})"
            elif k == 1:
                im_expr = f"({im_expr} + {t})"
            elif k == 2:
                re_expr = f"({re_expr} - {t})"
            else:
                im_expr = f"({im_expr} - {t})"
    zero = f"(({bu}) = 0.0 OR ({bv}) = 0.0)"
    cols.append(f"CASE WHEN {zero} THEN 1.0 ELSE {re_expr} END AS sh_re")
    cols.append(f"CASE WHEN {zero} THEN 0.0 ELSE {im_expr} END AS sh_im")
    return ",\n             ".join(cols)


def gaussian_sql(u: str, v: str, freq: str, emaj: str, emin: str, angle: str) -> str:
    gs = repr(GAUSS_SCALE)
    u1 = (
        f"((({u})*cos({angle}) + ({v})*sin({angle})) * (({emin})/({emaj}))"
        f" * (({freq})*{gs}*({emaj})))"
    )
    v1 = f"((-({u})*sin({angle}) + ({v})*cos({angle})) * (({freq})*{gs}*({emaj})))"
    return f"exp(-({u1}*{u1} + {v1}*{v1}))"
