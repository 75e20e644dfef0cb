"""Stokes ↔ correlation conversion as a compile-time expression generator.

Parity with /root/reference/africanus/model/coherency/conversion.py:19-305:
the reference compiles per-output lambdas from CONVERSION_SCHEMA; here the
same schema emits Column expressions (2 real columns per complex corr) —
pure Catalyst after generation, no runtime dispatch.

Linear feeds:   XX = I+Q, XY = U+iV, YX = U−iV, YY = I−Q
Circular feeds: RR = I+V, RL = Q+iU, LR = Q−iU, LL = I−V
Inverse:        I = (XX+YY)/2, Q = (XX−YY)/2, U = (XY+YX)/2, V = (XY−YX)/2i
(schema dict at conversion.py:19-51).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from codex_africanus_spark.functions.complex_algebra import Cplx


def stokes_to_corr(
    i: Column, q: Column, u: Column, v: Column, feed_type: str = "linear"
) -> dict[str, Cplx]:
    zero = F.lit(0.0)
    if feed_type == "linear":
        return {
            "XX": Cplx(i + q, zero),
            "XY": Cplx(u, v),
            "YX": Cplx(u, -v),
            "YY": Cplx(i - q, zero),
        }
    if feed_type == "circular":
        return {
            "RR": Cplx(i + v, zero),
            "RL": Cplx(q, u),
            "LR": Cplx(q, -u),
            "LL": Cplx(i - v, zero),
        }
    raise ValueError(f"feed_type must be linear|circular, got {feed_type!r}")


def corr_to_stokes(
    xx: Cplx, xy: Cplx, yx: Cplx, yy: Cplx, feed_type: str = "linear"
) -> dict[str, Column]:
    if feed_type == "linear":
        return {
            "I": (xx.re + yy.re) * 0.5,
            "Q": (xx.re - yy.re) * 0.5,
            "U": (xy.re + yx.re) * 0.5,
            "V": (xy.im - yx.im) * 0.5,
        }
    if feed_type == "circular":
        return {
            "I": (xx.re + yy.re) * 0.5,
            "V": (xx.re - yy.re) * 0.5,
            "Q": (xy.re + yx.re) * 0.5,
            "U": (xy.im - yx.im) * 0.5,
        }
    raise ValueError(f"feed_type must be linear|circular, got {feed_type!r}")
