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


def spi_weighted_binned_fit(samples: "DataFrame") -> "DataFrame":
    """Weighted spectral-index fit over channel-AVERAGED bins — the
    production composition the reference runs as two steps (time/channel
    averaging, then per-component SPI fitting, component_spi.py:55-120):
    (1) weighted 2-channel bin averaging of flux and frequency with
    exact integer sums (the time_and_channel_average weighting
    discipline), (2) closed-form WEIGHTED least squares of ln(flux)
    against ln(nu/nu0) per source — alpha and ln(I0) are Cramer ratios
    of exact integer moments, so the whole chain is engine-exact without
    any applyInPandas.

    samples: (source_id, chan, frequency, flux, weight). Scale shape:
    two partial-agg groupBys (source x bin, then source); no joins, no
    windows, no Python.
    """
    from pyspark.sql import functions as F
    from codex_africanus_spark.functions.deterministic import quantize

    dec = "decimal(38,0)"
    binned = (
        samples.select(
            "source_id",
            (F.col("chan") / 2).cast("long").alias("bin"),
            quantize(F.col("weight"), 1e3).alias("w_q"),
            F.round(F.col("frequency")).cast("long").alias("nu_i"),
            quantize(F.col("flux"), 1e6).alias("f_q"),
        )
        .groupBy("source_id", "bin")
        .agg(
            F.sum("w_q").alias("wsum"),
            F.sum(F.col("w_q") * F.col("f_q")).alias("wf"),
            F.sum(F.col("w_q") * F.col("nu_i")).alias("wnu"),
        )
        .select(
            "source_id",
            "wsum",
            quantize(
                F.log(
                    (F.col("wnu").cast("double") / F.col("wsum"))
                    / F.lit(REF_FREQ)
                ),
                1e6,
            ).alias("x_q"),
            quantize(
                F.log(F.col("wf").cast("double") / F.col("wsum") / F.lit(1e6)),
                1e6,
            ).alias("y_q"),
        )
    )
    g = binned.groupBy("source_id").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("wsum").alias("sw"),
        F.sum(F.col("wsum") * F.col("x_q")).alias("sx"),
        F.sum(F.col("wsum") * F.col("y_q")).alias("sy"),
        F.sum(F.col("wsum") * F.col("x_q") * F.col("x_q")).alias("sxx"),
        F.sum(F.col("wsum") * F.col("x_q") * F.col("y_q")).alias("sxy"),
    )
    sw, sx, sy = F.col("sw").cast(dec), F.col("sx").cast(dec), F.col("sy").cast(dec)
    sxx, sxy = F.col("sxx").cast(dec), F.col("sxy").cast(dec)
    den = sw * sxx - sx * sx
    alpha = (sw * sxy - sx * sy).cast("double") / den.cast("double")
    ln_i0 = (
        (sy * sxx - sx * sxy).cast("double") / den.cast("double") / F.lit(1e6)
    )
    # Quantized-integer outputs: the Cramer sums exceed 2^53 and DuckDB's
    # int128->double cast is not correctly rounded (1-ulp drift vs Java
    # BigDecimal, measured) — the nano/micro grids absorb it.
    return g.filter(den.cast("double") != 0).select(
        "source_id",
        "n_bins",
        quantize(alpha, 1e9).alias("alpha_fit_nano"),
        quantize(F.exp(ln_i0), 1e6).alias("i0_fit_micro"),
    )


SPI_WEIGHTED_SQL_BODY = """
  , binned AS (
    SELECT source_id, CAST(chan // 2 AS BIGINT) AS bin,
           CAST(SUM(CAST(ROUND(weight * 1000.0) AS BIGINT)) AS BIGINT) AS wsum,
           CAST(SUM(CAST(ROUND(weight * 1000.0) AS BIGINT)
                    * CAST(ROUND(flux * 1000000.0) AS BIGINT)) AS BIGINT) AS wf,
           CAST(SUM(CAST(ROUND(weight * 1000.0) AS BIGINT)
                    * CAST(ROUND(frequency) AS BIGINT)) AS BIGINT) AS wnu
    FROM samples GROUP BY 1, 2
  ),
  pts AS (
    SELECT source_id, wsum,
           CAST(ROUND(ln((CAST(wnu AS DOUBLE) / wsum) / 856000000.0)
                      * 1000000.0) AS BIGINT) AS x_q,
           CAST(ROUND(ln(CAST(wf AS DOUBLE) / wsum / 1000000.0)
                      * 1000000.0) AS BIGINT) AS y_q
    FROM binned
  ),
  g AS (
    SELECT source_id, COUNT(*) AS n_bins,
           CAST(SUM(wsum) AS HUGEINT) AS sw,
           CAST(SUM(wsum * x_q) AS HUGEINT) AS sx,
           CAST(SUM(wsum * y_q) AS HUGEINT) AS sy,
           CAST(SUM(wsum * x_q * x_q) AS HUGEINT) AS sxx,
           CAST(SUM(wsum * x_q * y_q) AS HUGEINT) AS sxy
    FROM pts GROUP BY source_id
  )
  SELECT source_id, CAST(n_bins AS BIGINT) AS n_bins,
         CAST(ROUND(CAST(sw * sxy - sx * sy AS DOUBLE)
           / CAST(sw * sxx - sx * sx AS DOUBLE)
           * 1000000000.0) AS BIGINT) AS alpha_fit_nano,
         CAST(ROUND(exp(CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(sw * sxx - sx * sx AS DOUBLE) / 1000000.0)
           * 1000000.0) AS BIGINT) AS i0_fit_micro
  FROM g
  WHERE CAST(sw * sxx - sx * sx AS DOUBLE) <> 0
  ORDER BY source_id
"""
