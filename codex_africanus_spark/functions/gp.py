"""Gaussian-process kernels as pairwise relational expressions.

Parity with /root/reference/africanus/gps/kernels.py:8-40
(exponential_squared covariance) and africanus/gps/utils.py:7-25
(abs_diff pairwise matrix). The reference builds dense (n×n) NumPy
matrices; relationally a covariance matrix IS the cross join
(i, j, k(xᵢ, xⱼ)) — sparse-friendly, spillable, and prunable
(|xᵢ−xⱼ| > cutoff rows never materialize when a band predicate is
pushed down), which is what makes n ≫ 10⁴ tractable at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exponential_squared(x1: Column, x2: Column, sigma_f: Column, length: Column) -> Column:
    """k(x, x') = σ_f² · exp(−(x−x')² / (2ℓ²))  (kernels.py:8-40)."""
    d = x1 - x2
    return sigma_f * sigma_f * F.exp(-(d * d) / (F.lit(2.0) * length * length))


def covariance_frame(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    sigma_f: float = 1.0,
    length: float = 1.0,
    band: float | None = None,
) -> DataFrame:
    """(i, j, k) long-format covariance; `band` prunes |x_i − x_j| > band
    before the kernel evaluates (banded-kernel pushdown)."""
    a = points.select(F.col(id_col).alias("i"), F.col(x_col).alias("xi"))
    b = points.select(F.col(id_col).alias("j"), F.col(x_col).alias("xj"))
    pairs = a.crossJoin(b)
    if band is not None:
        pairs = pairs.filter(F.abs(F.col("xi") - F.col("xj")) <= band)
    k = exponential_squared(
        F.col("xi"), F.col("xj"), F.lit(sigma_f), F.lit(length)
    )
    return pairs.select("i", "j", F.round(k, 9).alias("k"))


# ---------------------------------------------------------------------------
# Deterministic phase screen (the reference's GP-sampled gain screens:
# gps/examples/generate_phase_only_gains.py + calibration/utils/examples/
# apply_phase_screen_to_ms.py — sampling replaced by a fixed coefficient
# field so the screen is reproducible and exactly oracle-able)
# ---------------------------------------------------------------------------

N_INDUCING = 9
INDUCING_SPACING = 0.25
SCREEN_LENGTH = 0.5


def phase_screen(t_norm: Column, antenna: Column) -> Column:
    """Smooth per-antenna phase screen φ(t, a) = Σ_k k(t, t_k)·c_{a,k}:
    the exponential-squared kernel against fixed inducing points t_k with
    a deterministic per-antenna coefficient field. Rounded to 9dp for
    engine reproducibility (exp differs at 1 ULP between libms)."""
    acc = None
    for k in range(N_INDUCING):
        tk = k * INDUCING_SPACING
        kern = exponential_squared(
            t_norm, F.lit(tk), F.lit(1.0), F.lit(SCREEN_LENGTH)
        )
        coeff = ((antenna + F.lit(k)) % 5 - F.lit(2)) / F.lit(10.0)
        term = kern * coeff
        acc = term if acc is None else acc + term
    return F.round(acc, 9)


def phase_screen_sql(t_norm: str, antenna: str) -> str:
    """DuckDB mirror with identical term order and literal forms."""
    terms = []
    for k in range(N_INDUCING):
        tk = repr(k * INDUCING_SPACING)
        kern = (
            f"1.0 * 1.0 * exp(-((({t_norm}) - {tk}) * (({t_norm}) - {tk}))"
            f" / ((2.0 * {SCREEN_LENGTH!r}) * {SCREEN_LENGTH!r}))"
        )
        coeff = f"((({antenna}) + {k}) % 5 - 2) / 10.0"
        terms.append(f"({kern} * ({coeff}))")
    return f"round({' + '.join(terms)}, 9)"
