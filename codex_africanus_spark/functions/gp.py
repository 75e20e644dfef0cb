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
