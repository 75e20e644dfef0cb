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


def gaussian_sql(u: str, v: str, freq: str, emaj: str, emin: str, angle: str) -> str:
    gs = repr(GAUSS_SCALE)
    u1 = (
        f"((({u})*cos({angle}) + ({v})*sin({angle})) * (({emin})/({emaj}))"
        f" * (({freq})*{gs}*({emaj})))"
    )
    v1 = f"((-({u})*sin({angle}) + ({v})*cos({angle})) * (({freq})*{gs}*({emaj})))"
    return f"exp(-({u1}*{u1} + {v1}*{v1}))"
