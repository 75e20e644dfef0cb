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


class MissingStokesError(ValueError):
    pass


def convert(
    available: dict[str, "Column | Cplx"],
    outputs: list[str],
    feed_type: str = "linear",
    default_missing: bool = True,
) -> dict[str, Cplx]:
    """Schema-driven conversion compiler — the general form of the
    reference's `convert` (conversion.py:144-305): given whatever subset
    of Stokes parameters is available, emit Column expressions for the
    requested correlations, substituting 0 for absent Stokes parameters
    when `default_missing` (the reference's implicit-stokes defaulting,
    conversion.py:56-120 priority scheme) or raising otherwise.

    `available` values may be real Columns (Stokes) — outputs are Cplx
    bundles. Unknown output names raise; missing inputs raise unless
    defaulted. Compilation happens at plan-build time; the result is pure
    Catalyst arithmetic.
    """
    from pyspark.sql import functions as _F

    def get(name: str) -> Column:
        if name in available:
            v = available[name]
            return v.re if isinstance(v, Cplx) else v
        if default_missing:
            return _F.lit(0.0)
        raise MissingStokesError(
            f"stokes {name!r} required for requested outputs but not provided"
        )

    schema = {
        "linear": {
            "XX": lambda: Cplx(get("I") + get("Q"), _F.lit(0.0)),
            "XY": lambda: Cplx(get("U"), get("V")),
            "YX": lambda: Cplx(get("U"), -get("V")),
            "YY": lambda: Cplx(get("I") - get("Q"), _F.lit(0.0)),
        },
        "circular": {
            "RR": lambda: Cplx(get("I") + get("V"), _F.lit(0.0)),
            "RL": lambda: Cplx(get("Q"), get("U")),
            "LR": lambda: Cplx(get("Q"), -get("U")),
            "LL": lambda: Cplx(get("I") - get("V"), _F.lit(0.0)),
        },
    }[feed_type]
    out = {}
    for name in outputs:
        if name not in schema:
            raise ValueError(f"unknown correlation {name!r} for {feed_type} feeds")
        out[name] = schema[name]()
    return out


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
