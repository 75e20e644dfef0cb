"""Zernike-polynomial beam model (DDE) — pandas UDF with broadcast
coefficients.

Capability parity with /root/reference/africanus/rime/zernike.py:110-198
(zernike_dde): evaluate Σ_k c_k · Z_{noll(k)}(ρ, θ) at each (source,
time, ant, chan) pointing. Same architecture as the beam cube
(operators/beam.py): coefficients broadcast, Arrow-batched vectorized
NumPy evaluation — gather/special-function work that does not belong in
SQL expressions.
"""

from __future__ import annotations

from math import factorial

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _zernike_radial(n: int, m: int, rho: np.ndarray) -> np.ndarray:
    """R_n^m(ρ) via the explicit factorial sum."""
    out = np.zeros_like(rho)
    for k in range((n - m) // 2 + 1):
        num = (-1.0) ** k * factorial(n - k)
        den = (
            factorial(k)
            * factorial((n + m) // 2 - k)
            * factorial((n - m) // 2 - k)
        )
        out += num / den * rho ** (n - 2 * k)
    return out


def noll_to_nm(j: int) -> tuple[int, int]:
    """Noll index → (n, m) (the reference stores noll indices per coeff)."""
    n = 0
    j1 = j - 1
    while j1 > n:
        n += 1
        j1 -= n
    m = (-1) ** (j % 2) * (n - 2 * ((n - j1) // 2))
    return n, m


def zernike_eval(n: int, m: int, rho: np.ndarray, theta: np.ndarray) -> np.ndarray:
    am = abs(m)
    r = _zernike_radial(n, am, np.clip(rho, 0.0, 1.0))
    if m >= 0:
        return r * np.cos(am * theta)
    return r * np.sin(am * theta)


def zernike_dde(
    pairs: DataFrame,
    coeffs: list[float],
    noll_indices: list[int],
    l_col: str = "l",
    m_col: str = "m",
    extent: float = 0.1,
    out_col: str = "zernike_gain",
) -> DataFrame:
    """Evaluate the Zernike expansion at each row's (l, m) pointing,
    normalized to the unit disc of radius `extent`."""
    sc = pairs.sparkSession.sparkContext
    nm = [noll_to_nm(j) for j in noll_indices]
    bc = sc.broadcast({"coeffs": list(coeffs), "nm": nm, "extent": extent})

    @F.pandas_udf(DoubleType())
    def sample(l: pd.Series, m: pd.Series) -> pd.Series:
        import numpy as _np

        b = bc.value
        lv = l.to_numpy(_np.float64) / b["extent"]
        mv = m.to_numpy(_np.float64) / b["extent"]
        rho = _np.sqrt(lv * lv + mv * mv)
        theta = _np.arctan2(mv, lv)
        total = _np.zeros(len(lv))
        for c, (n_, m_) in zip(b["coeffs"], b["nm"]):
            am = abs(m_)
            r = _np.zeros_like(rho)
            rc = _np.clip(rho, 0.0, 1.0)
            from math import factorial

            for k in range((n_ - am) // 2 + 1):
                num = (-1.0) ** k * factorial(n_ - k)
                den = (
                    factorial(k)
                    * factorial((n_ + am) // 2 - k)
                    * factorial((n_ - am) // 2 - k)
                )
                r += num / den * rc ** (n_ - 2 * k)
            ang = _np.cos(am * theta) if m_ >= 0 else _np.sin(am * theta)
            total += c * r * ang
        return pd.Series(total)

    return pairs.withColumn(out_col, sample(F.col(l_col), F.col(m_col)))
