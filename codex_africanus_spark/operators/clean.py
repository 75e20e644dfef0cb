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


def psf_fit_gaussian(psf: np.ndarray) -> tuple[float, float, float]:
    """Fit (amplitude, σ_u, σ_v) of a separable Gaussian to the PSF peak
    neighbourhood via second moments (reference deconv/hogbom/clean.py:40-72
    fits the clean-beam parameters the same way before restore)."""
    psf = np.asarray(psf, dtype=np.float64)
    peak = np.unravel_index(np.abs(psf).argmax(), psf.shape)
    amp = float(psf[peak])
    iu, iv = np.indices(psf.shape)
    w = np.abs(psf) / np.abs(psf).sum()
    su = float(np.sqrt((w * (iu - peak[0]) ** 2).sum()) + 1e-12)
    sv = float(np.sqrt((w * (iv - peak[1]) ** 2).sum()) + 1e-12)
    return amp, su, sv


def restore(
    components: pd.DataFrame,
    shape: tuple[int, int],
    origin: tuple[int, int],
    sigma: tuple[float, float],
    residual: np.ndarray | None = None,
) -> np.ndarray:
    """Convolve clean components with the fitted clean beam and add the
    residual (reference clean.py:202-246)."""
    ny, nx = shape
    out = np.zeros(shape) if residual is None else residual.astype(np.float64).copy()
    yy, xx = np.indices(shape)
    su, sv = sigma
    for r in components.itertuples():
        cy, cx = int(r.u_cell - origin[0]), int(r.v_cell - origin[1])
        out += r.flux * np.exp(
            -(((yy - cy) / su) ** 2 + ((xx - cx) / sv) ** 2) / 2.0
        )
    return out


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
    # canonical cell order: argmax tie-breaks become deterministic
    # (toPandas order is partition-dependent otherwise)
    pdf = (
        grid.select("u_cell", "v_cell", "grid_re_q", "wsum_q")
        .toPandas()
        .sort_values(["u_cell", "v_cell"])
        .reset_index(drop=True)
    )
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


def _q_half_away(x: np.ndarray, grid: float) -> np.ndarray:
    """sign·floor(|x|·grid + 0.5) — the quantization spelled identically
    in the oracle SQL (the op-sequence-sharing discipline: np.round is
    banker's, SQL ROUND is half-away; sharing the exact float ops
    sidesteps both engines' rounding modes entirely)."""
    return np.sign(x) * np.floor(np.abs(x) * grid + 0.5)


def _hogbom_minor_cycle(grid: DataFrame, gamma: float, threshold_frac: float, maxiter: int):
    """Collect the uv-grid image and run the Hogbom peak/subtract loop
    ONCE (shared by clean_restore and the beam-width sweep — the
    pick/subtract arithmetic is the oracle-parity hot spot and must not
    fork). Returns (cells, resid, comps, picks), or None for an empty
    grid. The subtraction is resid −= γ·resid, bit-identical to the
    oracle's decay recursion."""
    pdf = (
        grid.select("u_cell", "v_cell", "grid_re_q", "wsum_q")
        .toPandas()
        .sort_values(["u_cell", "v_cell"])
        .reset_index(drop=True)
    )
    if pdf.empty:
        return None
    resid = (pdf.grid_re_q / pdf.wsum_q).to_numpy(dtype=np.float64)
    cells = pdf[["u_cell", "v_cell"]].to_numpy()
    thresh = threshold_frac * np.abs(resid).max()
    comps = []
    picks = np.zeros(len(resid), dtype=np.int64)
    for _ in range(maxiter):
        p = int(np.abs(resid).argmax())
        peak = resid[p]
        if abs(peak) <= thresh:
            break
        comps.append((int(cells[p, 0]), int(cells[p, 1]), float(gamma * peak)))
        picks[p] += 1
        resid[p] -= gamma * peak
    return cells, resid, comps, picks


def _beam_splat_q(cells: np.ndarray, comps: list, sigma: float) -> np.ndarray:
    """Σ over components of the 1e-9-quantized restoring-beam Gaussian."""
    beam_q = np.zeros(len(cells), dtype=np.int64)
    for cu, cv, flux in comps:
        du = cells[:, 0] - cu
        dv = cells[:, 1] - cv
        term = flux * np.exp(-(du * du + dv * dv) / (2.0 * sigma * sigma))
        beam_q += _q_half_away(term, 1e9).astype(np.int64)
    return beam_q


def clean_restore(
    spark: SparkSession,
    grid: DataFrame,
    gamma: float = 0.1,
    threshold_frac: float = 0.2,
    maxiter: int = 50,
    sigma: float = 1.5,
) -> DataFrame:
    """Full Hogbom minor cycle + restore over the collected uv-grid
    image (reference deconv/hogbom/clean.py:122-246 end-to-end): run the
    peak/subtract loop, then convolve the clean components with a
    restoring beam (fixed σ in cell units — the reference's restore also
    takes the fitted beam as an input parameter) and add the residual.

    Exactness: the loop's subtraction is resid −= γ·resid (bit-identical
    to the oracle's decay recursion), so the residual after n picks IS
    the decay table at k = n; each Gaussian restore term is quantized to
    a 1e-9 integer before summing. Scale shape: gridding is the cluster
    reduction, everything here is O(#cells × #components) driver work on
    the ~10^6-cell image (SURVEY §2.9)."""
    mc = _hogbom_minor_cycle(grid, gamma, threshold_frac, maxiter)
    if mc is None:
        return spark.createDataFrame(
            [], "u_cell long, v_cell long, n_picks int, residual double, restored double"
        )
    cells, resid, comps, picks = mc
    beam_q = _beam_splat_q(cells, comps, sigma)

    out = pd.DataFrame(
        {
            "u_cell": cells[:, 0],
            "v_cell": cells[:, 1],
            "n_picks": picks,
            "residual": _q_half_away(resid, 1e6) / 1e6,
            "restored": _q_half_away(resid + beam_q / 1e9, 1e6) / 1e6,
        }
    )
    return spark.createDataFrame(
        out.astype(
            {
                "u_cell": "int64",
                "v_cell": "int64",
                "n_picks": "int32",
                "residual": "float64",
                "restored": "float64",
            }
        )
    )


def clean_restore_beam_sweep(
    spark: SparkSession,
    grid: DataFrame,
    sigmas: tuple = (1.0, 1.5, 2.5),
    gamma: float = 0.1,
    threshold_frac: float = 0.2,
    maxiter: int = 50,
) -> DataFrame:
    """Restoring-beam WIDTH SWEEP over one CLEAN solution: the Hogbom
    minor cycle runs ONCE (components are beam-independent; shared
    _hogbom_minor_cycle helper), then the restore convolution is
    evaluated at each σ — the fitted-vs-forced beam comparison an
    imaging pipeline runs when choosing its restoring beam (reference
    restore takes the beam as an input parameter,
    deconv/hogbom/clean.py:200-246). Output is the full restored image
    per σ. Same exactness contract as clean_restore."""
    schema = (
        "sigma double, u_cell long, v_cell long, n_picks int, "
        "residual double, restored double"
    )
    mc = _hogbom_minor_cycle(grid, gamma, threshold_frac, maxiter)
    if mc is None:
        return spark.createDataFrame([], schema)
    cells, resid, comps, picks = mc
    frames = []
    for sigma in sigmas:
        beam_q = _beam_splat_q(cells, comps, sigma)
        frames.append(
            pd.DataFrame(
                {
                    "sigma": float(sigma),
                    "u_cell": cells[:, 0],
                    "v_cell": cells[:, 1],
                    "n_picks": picks,
                    "residual": _q_half_away(resid, 1e6) / 1e6,
                    "restored": _q_half_away(resid + beam_q / 1e9, 1e6) / 1e6,
                }
            )
        )
    out = pd.concat(frames, ignore_index=True).astype(
        {
            "sigma": "float64",
            "u_cell": "int64",
            "v_cell": "int64",
            "n_picks": "int32",
            "residual": "float64",
            "restored": "float64",
        }
    )
    return spark.createDataFrame(out)
