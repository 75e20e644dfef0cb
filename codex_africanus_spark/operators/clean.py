"""Hogbom CLEAN — iterative deconvolution driver loop.

Parity with /root/reference/africanus/deconv/hogbom/clean.py:74-246.
Architecture per SURVEY §2.9: images are single-node arrays — the
*gridding* is distributed (operators/gridding.py), the CLEAN minor cycle
runs on the driver over the collected grid (ny×nx ≪ data), and clean
components come back as a DataFrame. A 100 TB dataset still produces a
~10^6-cell image; only the reduction to that image is cluster work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def hogbom_clean(
    spark: SparkSession,
    grid: DataFrame,
    gamma: float = 0.1,
    threshold_frac: float = 0.2,
    maxiter: int = 50,
) -> DataFrame:
    """Peak-find / subtract loop over a collected uv-grid magnitude image.

    grid: output of operators/gridding.grid_natural (u_cell, v_cell,
    grid_re_q, grid_im_q, wsum_q). A delta-function PSF stands in for the
    fitted PSF patch (psf_fit, reference clean.py:40-72) — the loop
    structure (argmax → subtract γ·peak → record component) is identical.
    """
    pdf = grid.select("u_cell", "v_cell", "grid_re_q", "wsum_q").toPandas()
    if pdf.empty:
        return spark.createDataFrame(
            [], "iteration int, u_cell long, v_cell long, flux double"
        )
    resid = (pdf.grid_re_q / pdf.wsum_q).to_numpy(dtype=np.float64)
    cells = pdf[["u_cell", "v_cell"]].to_numpy()
    thresh = threshold_frac * np.abs(resid).max()
    comps = []
    for it in range(maxiter):
        p = int(np.abs(resid).argmax())
        peak = resid[p]
        if abs(peak) <= thresh:
            break
        comps.append((it, int(cells[p, 0]), int(cells[p, 1]), float(gamma * peak)))
        resid[p] -= gamma * peak
    out = pd.DataFrame(comps, columns=["iteration", "u_cell", "v_cell", "flux"])
    return spark.createDataFrame(out.astype(
        {"iteration": "int32", "u_cell": "int64", "v_cell": "int64", "flux": "float64"}
    )) if comps else spark.createDataFrame([], "iteration int, u_cell long, v_cell long, flux double")
