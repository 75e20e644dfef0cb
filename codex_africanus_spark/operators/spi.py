"""Per-component spectral-index fitting — grouped Gauss-Newton.

Parity with /root/reference/africanus/model/spi/component_spi.py:55-120:
fit (I₀, α) of I(ν) = I₀·(ν/ν₀)^α per component from per-channel flux
samples. Embarrassingly parallel per group → applyInPandas (SURVEY §2.9):
the per-group Newton iterations run inside the Arrow batch, no driver
loop, one shuffle on component id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

REF_FREQ = 856e6
FIT_SCHEMA = "source_id int, i0 double, alpha double, n_iter int, rms double"


def fit_spi_components(flux_samples: DataFrame, maxiter: int = 20, tol: float = 1e-10) -> DataFrame:
    """flux_samples: (source_id, frequency, flux). Returns fitted
    (i0, alpha) per source via log-space Newton on the power law."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure: executor workers cannot import this repo
        nu = pdf["frequency"].to_numpy(np.float64) / 856e6
        y = pdf["flux"].to_numpy(np.float64)
        mask = y > 0
        x = np.log(nu[mask])
        ly = np.log(y[mask])
        # linear least squares in log space as starting point = exact for
        # noiseless power laws; Newton refines in linear space
        A = np.vstack([np.ones_like(x), x]).T
        (li0, alpha), *_ = np.linalg.lstsq(A, ly, rcond=None)
        i0 = float(np.exp(li0))
        alpha = float(alpha)
        it = 0
        for it in range(1, maxiter + 1):
            model = i0 * nu**alpha
            r = y - model
            j0 = nu**alpha
            j1 = i0 * nu**alpha * np.log(nu)
            jtj = np.array(
                [[np.dot(j0, j0), np.dot(j0, j1)], [np.dot(j0, j1), np.dot(j1, j1)]]
            )
            jtr = np.array([np.dot(j0, r), np.dot(j1, r)])
            try:
                d0, d1 = np.linalg.solve(jtj, jtr)
            except np.linalg.LinAlgError:
                break
            i0 += d0
            alpha += d1
            if abs(d0) + abs(d1) < tol:
                break
        rms = float(np.sqrt(np.mean((y - i0 * nu**alpha) ** 2)))
        return pd.DataFrame(
            {
                "source_id": [int(pdf["source_id"].iloc[0])],
                "i0": [i0],
                "alpha": [alpha],
                "n_iter": [it],
                "rms": [rms],
            }
        )

    return flux_samples.groupBy("source_id").applyInPandas(fit, FIT_SCHEMA)
