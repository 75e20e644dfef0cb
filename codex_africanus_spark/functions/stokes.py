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


class MissingConversionInputs(MissingStokesError):
    pass


def _as_cplx(v) -> Cplx:
    return v if isinstance(v, Cplx) else Cplx(v, F.lit(0.0))


def _jmul(c: Cplx) -> Cplx:  # c * 1j
    return Cplx(-c.im, c.re)


def _jdiv(c: Cplx) -> Cplx:  # c / 1j == -1j * c
    return Cplx(c.im, -c.re)


def _half(c: Cplx) -> Cplx:
    return Cplx(c.re * 0.5, c.im * 0.5)


def _add(a: Cplx, b: Cplx) -> Cplx:
    return Cplx(a.re + b.re, a.im + b.im)


def _sub(a: Cplx, b: Cplx) -> Cplx:
    return Cplx(a.re - b.re, a.im - b.im)


# The reference's full CONVERSION_SCHEMA (conversion.py:19-51): every
# producible quantity with its candidate input pairs, in the reference's
# dict order (which decides ties — first option with the highest priority
# wins, conversion.py:167-205 heap).
CONVERSION_SCHEMA: dict[str, list[tuple[tuple[str, str], object]]] = {
    "RR": [(("I", "V"), _add)],
    "RL": [(("Q", "U"), lambda q, u: _add(q, _jmul(u)))],
    "LR": [(("Q", "U"), lambda q, u: _sub(q, _jmul(u)))],
    "LL": [(("I", "V"), _sub)],
    "XX": [(("I", "Q"), _add)],
    "XY": [(("U", "V"), lambda u, v: _add(u, _jmul(v)))],
    "YX": [(("U", "V"), lambda u, v: _sub(u, _jmul(v)))],
    "YY": [(("I", "Q"), _sub)],
    "I": [
        (("XX", "YY"), lambda a, b: _half(_add(a, b))),
        (("RR", "LL"), lambda a, b: _half(_add(a, b))),
    ],
    "Q": [
        (("XX", "YY"), lambda a, b: _half(_sub(a, b))),
        (("RL", "LR"), lambda a, b: _half(_add(a, b))),
    ],
    "U": [
        (("XY", "YX"), lambda a, b: _half(_add(a, b))),
        (("RL", "LR"), lambda a, b: _half(_jdiv(_sub(a, b)))),
    ],
    "V": [
        (("XY", "YX"), lambda a, b: _half(_jdiv(_sub(a, b)))),
        (("RR", "LL"), lambda a, b: _half(_sub(a, b))),
    ],
}

_STOKES_TO_CORR_OUTPUTS = frozenset("RR RL LR LL XX XY YX YY".split())


def convert_general(
    available: dict[str, "Column | Cplx"],
    outputs: list[str],
    implicit_stokes: bool = True,
) -> dict[str, Cplx]:
    """Fully general any-subset → any-output conversion compiler — the
    priority scheme of reference conversion.py:56-205: for each
    requested output, every candidate input pair is scored by how many
    of its inputs are actually available (priority 2 > 1 > 0); absent
    STOKES inputs may substitute a 0 default ONLY when the output is a
    correlation and `implicit_stokes` is set (the reference's
    can_substitute_defaults, :167-170 — this is what makes
    ['I'] → ['XX','XY','YX','YY'] legal); correlation inputs never
    default. The highest-priority satisfiable mapping compiles to Cplx
    Catalyst expressions; an unsatisfiable output raises
    MissingConversionInputs, an unknown output name ValueError.

    Unlike `stokes_to_corr`/`corr_to_stokes` (the four standard full
    forms), mixed and partial schemas work: e.g. Q and U from a partial
    circular set {RR, LL, RL, LR}, or XX/YY from {I} alone."""
    out: dict[str, Cplx] = {}
    for okey in outputs:
        try:
            options = CONVERSION_SCHEMA[okey]
        except KeyError:
            raise ValueError(
                f"Unknown output {okey!r}. Known outputs: "
                f"{list(CONVERSION_SCHEMA)}"
            )
        can_default = implicit_stokes and okey in _STOKES_TO_CORR_OUTPUTS
        best = None  # (priority, fn, args)
        for (c1, c2), fn in options:
            args, priority = [], 0
            ok = True
            for name in (c1, c2):
                if name in available:
                    args.append(_as_cplx(available[name]))
                    priority += 1
                elif can_default:
                    args.append(Cplx(F.lit(0.0), F.lit(0.0)))
                else:
                    ok = False
                    break
            if ok and (best is None or priority > best[0]):
                best = (priority, fn, args)
        if best is None:
            raise MissingConversionInputs(
                f"None of the supplied inputs {sorted(available)} can "
                f"produce output {okey!r}. It can be produced by the "
                f"following combinations "
                f"{[pair for pair, _ in options]}."
            )
        out[okey] = best[1](*best[2])
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
