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


def gaussian_sql(u: str, v: str, freq: str, emaj: str, emin: str, angle: str) -> str:
    gs = repr(GAUSS_SCALE)
    u1 = (
        f"((({u})*cos({angle}) + ({v})*sin({angle})) * (({emin})/({emaj}))"
        f" * (({freq})*{gs}*({emaj})))"
    )
    v1 = f"((-({u})*sin({angle}) + ({v})*cos({angle})) * (({freq})*{gs}*({emaj})))"
    return f"exp(-({u1}*{u1} + {v1}*{v1}))"
