"""Imaging queries: gridding, FFT/DFT imaging, CLEAN, beams,
shapelets, facets, sky-model readers (SURVEY §2.4, §2.8). Mechanically
moved out of the former queries.py (round 9)."""


from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from codex_africanus_spark.functions.coordinates import radec_to_lmn
from codex_africanus_spark.functions.deterministic import qsum
from codex_africanus_spark.functions.phase import phase_delay_angle, phase_path
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.operators import calibration as cal_op  # noqa: E402
from codex_africanus_spark.operators import clean as clean_op  # noqa: E402
from codex_africanus_spark.operators import dft as dft_op  # noqa: E402
from codex_africanus_spark.operators import gridding as grid_op  # noqa: E402
from codex_africanus_spark.plans import rime as rime_plan  # noqa: E402
import os as _os  # noqa: E402
import tempfile as _tempfile  # noqa: E402
from codex_africanus_spark.functions.spectral import wsclean_spectra  # noqa: E402
from codex_africanus_spark.operators import beam as beam_op  # noqa: E402
from codex_africanus_spark.sources import wsclean as wsclean_src  # noqa: E402
from codex_africanus_spark.functions.shapes import shapelet_1d, shapelet_1d_sql  # noqa: E402
from codex_africanus_spark.operators import zernike as zernike_op  # noqa: E402
from codex_africanus_spark.operators import asof as asof_op  # noqa: E402
from codex_africanus_spark.operators import fft_imaging as fft_op  # noqa: E402

from ._core import (  # noqa: F401
    _with_ms,
    register,
)

@register("dft_vis_to_im_adjoint", _with_ms(dft_op.VIS_TO_IM_SQL))
def dft_vis_to_im_adjoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjoint DFT: flag-gated Σ_rows Re(e^{iφ}·V) per (source, chan)
    (reference dft/kernels.py:73-170)."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    src = tpch_ms.source_table(spark, sf_dir)
    return dft_op.vis_to_im(vis, src).orderBy("source_id", "chan")


@register("degrid_nearest_cell", _with_ms(grid_op.DEGRID_SQL))
def degrid_nearest_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degridding: gather dual of the histogram gridder (reference
    degridder.py:78-176) — broadcast grid joined back onto rows."""
    return grid_op.degrid(tpch_ms.vis_table(spark, sf_dir))


@register("grid_kernel_footprint", _with_ms(grid_op.CONV_GRID_SQL))
def grid_kernel_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convolution-kernel gridding: 3×3 separable triangle footprint per
    visibility (reference perleypolyhedron gridder) — a generated-column
    explode before the same single histogram shuffle."""
    return grid_op.grid_convolved(tpch_ms.vis_table(spark, sf_dir)).orderBy(
        "u_cell", "v_cell"
    )


@register("degrid_kernel_footprint", _with_ms(grid_op.DEGRID_CONV_SQL))
def degrid_kernel_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel-footprint degridding — the gather dual: each row samples
    its 3×3 footprint from the broadcast convolved grid and recombines
    taps with the separable weights (reference degridder.py:78-176)."""
    return grid_op.degrid_convolved(tpch_ms.vis_table(spark, sf_dir))


def _sinc_taps() -> list[tuple[int, float]]:
    from codex_africanus_spark.operators import gridding_kernels as gk

    return gk.taps_to_pairs(gk.sinc_kernel(3, oversample=1, a=0.5), 3)


@register("grid_kernel_sinc", _with_ms(grid_op.conv_grid_sql(_sinc_taps())))
def grid_kernel_sinc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprint gridding with a sinc anti-aliasing window from the
    kernel library (reference kernels.py:36-42 sinc; taps generated at
    integer sampling and dropped into the same literal-struct explode) —
    demonstrates the pluggable-window half of the perleypolyhedron
    gridder's policy system."""
    return grid_op.grid_convolved(
        tpch_ms.vis_table(spark, sf_dir), kernel=_sinc_taps()
    ).orderBy("u_cell", "v_cell")


def _kbsinc_taps() -> list[tuple[int, float]]:
    from codex_africanus_spark.operators import gridding_kernels as gk

    return gk.taps_to_pairs(
        gk.kaiser_bessel_sinc_kernel(3, b=2.1, oversample=1), 3
    )


@register("grid_kernel_kbsinc", _with_ms(grid_op.conv_grid_sql(_kbsinc_taps())))
def grid_kernel_kbsinc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprint gridding with the modified Kaiser-Bessel-sinc
    anti-aliasing window (reference kernels.py:52-66 kbsinc; Bessel J_n
    via quadrature since scipy is absent). The driver-side tap values
    are shared verbatim between the Column literals and the SQL oracle,
    so the kernel swap costs nothing in the plan — same explode, same
    single histogram shuffle."""
    return grid_op.grid_convolved(
        tpch_ms.vis_table(spark, sf_dir), kernel=_kbsinc_taps()
    ).orderBy("u_cell", "v_cell")


def _facet_oracle() -> str:
    from codex_africanus_spark.functions.uvw import (
        uvw_planar_w_approx_sql,
        uvw_rotate_sql,
    )

    args = ("u", "v", "w", "0.0", "((-17) / 25.0)", "(1 / 50.0)", "((-33) / 50.0)")
    ru, rv, rw = uvw_rotate_sql(*args)
    pu, pv = uvw_planar_w_approx_sql(*args)
    return _with_ms(
        f"""
        SELECT row_id, antenna1, antenna2, chan,
               round({ru}, 6) AS rot_u, round({rv}, 6) AS rot_v,
               round({rw}, 6) AS rot_w,
               round({pu}, 6) AS wlin_u, round({pv}, 6) AS wlin_v
        FROM vis WHERE row_id % 7 = 0
        ORDER BY row_id, antenna1, antenna2, chan
        """
    )


@register("uvw_facet_transforms", _facet_oracle())
def uvw_facet_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet baseline-transform policies (reference perleypolyhedron
    policies/baseline_transform_policies.py): full tangent-plane uvw
    rotation and the Kogan/Greisen planar w-approximation, both as pure
    Column expressions whose facet-centre trig constant-folds."""
    from codex_africanus_spark.functions.uvw import uvw_planar_w_approx, uvw_rotate

    vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 7 == 0)
    args = (
        F.col("u"), F.col("v"), F.col("w"),
        F.lit(0.0), F.lit(-17) / F.lit(25.0),
        F.lit(1) / F.lit(50.0), F.lit(-33) / F.lit(50.0),
    )
    ru, rv, rw = uvw_rotate(*args)
    pu, pv = uvw_planar_w_approx(*args)
    return vis.select(
        "row_id", "antenna1", "antenna2", "chan",
        F.round(ru, 6).alias("rot_u"), F.round(rv, 6).alias("rot_v"),
        F.round(rw, 6).alias("rot_w"),
        F.round(pu, 6).alias("wlin_u"), F.round(pv, 6).alias("wlin_v"),
    ).orderBy("row_id", "antenna1", "antenna2", "chan")


_FACET_K = "-2.0958450219516816e-08"  # -2π/c, the shared phase constant


_FACETED_MOSAIC_ORACLE = _with_ms(
    f"""
    , fsrc AS (
      SELECT *, CAST(CASE WHEN l >= 0 THEN 2 ELSE 0 END
                   + CASE WHEN m >= 0 THEN 1 ELSE 0 END AS INT) AS facet_id
      FROM src
    ),
    centres AS (
      SELECT facet_id,
             CAST(SUM(CAST(ROUND(l * 1000000000) AS BIGINT)) AS BIGINT)
               / COUNT(*) / 1000000000.0 AS l_c,
             CAST(SUM(CAST(ROUND(m * 1000000000) AS BIGINT)) AS BIGINT)
               / COUNT(*) / 1000000000.0 AS m_c
      FROM fsrc GROUP BY facet_id
    ),
    cn AS (
      SELECT *, sqrt(1.0 - l_c*l_c - m_c*m_c) AS n_c FROM centres
    ),
    off_sum AS (
      -- uvw/frequency are GROUP KEYS, not MIN(): (row_id, baseline,
      -- chan) is not a unique grain in the testdata (duplicate
      -- orderkey/linenumber rows), and steering a merged group by one
      -- row's uvw breaks the faceting identity (r8 property-test find)
      SELECT v.row_id, v.antenna1, v.antenna2, v.chan, s.facet_id,
             c.l_c, c.m_c, c.n_c,
             v.u AS u, v.v AS v_, v.w AS w,
             v.frequency AS frequency,
             SUM(CAST(ROUND(s.flux_i * cos({_FACET_K} * (v.u*(s.l - c.l_c)
                 + v.v*(s.m - c.m_c) + v.w*(s.n - c.n_c)) * v.frequency)
                 * 1000000) AS BIGINT)) / 1000000.0 AS sf_re,
             SUM(CAST(ROUND(s.flux_i * sin({_FACET_K} * (v.u*(s.l - c.l_c)
                 + v.v*(s.m - c.m_c) + v.w*(s.n - c.n_c)) * v.frequency)
                 * 1000000) AS BIGINT)) / 1000000.0 AS sf_im
      FROM vis v, fsrc s JOIN cn c USING (facet_id)
      WHERE v.row_id % 5 = 0
      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12
    ),
    steered AS (
      SELECT row_id, antenna1, antenna2, chan,
             {_FACET_K} * (u*l_c + v_*m_c + w*(n_c - 1.0)) * frequency AS tc,
             sf_re, sf_im
      FROM off_sum
    )
    SELECT row_id, antenna1, antenna2, chan,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           SUM(CAST(ROUND((sf_re * cos(tc) - sf_im * sin(tc)) * 1000000)
               AS BIGINT)) / 1000000.0 AS vis_re,
           SUM(CAST(ROUND((sf_re * sin(tc) + sf_im * cos(tc)) * 1000000)
               AS BIGINT)) / 1000000.0 AS vis_im
    FROM steered
    GROUP BY row_id, antenna1, antenna2, chan
    ORDER BY row_id
    """
)


@register("faceted_mosaic_predict", _FACETED_MOSAIC_ORACLE)
def faceted_mosaic_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted mosaic predict (r7 verdict #7 candidate): the source
    catalogue partitions into 2×2 tangent-plane facets; each facet's
    RIME runs against the FACET CENTRE (offset coordinates l−l_c …,
    the exact faceting identity e^{iθ} = e^{iθ_c}·e^{iθ_off} used by
    wide-field degridders, reference perleypolyhedron facet policies +
    fused RIME), and the mosaic re-steers each facet sum by its centre
    phase before the final reduction. Both reductions (per-facet source
    sum, cross-facet sum) are fixed-point exact, so the two-level
    decomposition is bit-reproducible and exactly oracled. Plan shape:
    sources+centres broadcast (25 rows), ONE fact scan, two partial
    aggs — the per-facet plan inherits the compiled predict shape; at
    1000 facets only the broadcast dim grows."""
    from codex_africanus_spark.functions.deterministic import qsum

    K = float(_FACET_K)
    vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 5 == 0)
    src = tpch_ms.source_table(spark, sf_dir).withColumn(
        "facet_id",
        (
            F.when(F.col("l") >= 0, F.lit(2)).otherwise(F.lit(0))
            + F.when(F.col("m") >= 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("int"),
    )
    from codex_africanus_spark.functions.deterministic import quantize

    centres = src.groupBy("facet_id").agg(
        (F.sum(quantize(F.col("l"), 1e9)) / F.count(F.lit(1)) / F.lit(1e9))
        .alias("l_c"),
        (F.sum(quantize(F.col("m"), 1e9)) / F.count(F.lit(1)) / F.lit(1e9))
        .alias("m_c"),
    ).withColumn(
        "n_c",
        F.sqrt(
            F.lit(1.0) - F.col("l_c") * F.col("l_c") - F.col("m_c") * F.col("m_c")
        ),
    )
    fsrc = src.join(F.broadcast(centres), "facet_id")
    j = vis.crossJoin(F.broadcast(fsrc))
    th_off = (
        F.lit(K)
        * (
            F.col("u") * (F.col("l") - F.col("l_c"))
            + F.col("v") * (F.col("m") - F.col("m_c"))
            + F.col("w") * (F.col("n") - F.col("n_c"))
        )
        * F.col("frequency")
    )
    # uvw/frequency as GROUP KEYS, not MIN(): (row_id, baseline, chan)
    # is not unique in the testdata, and steering a merged group by one
    # row's uvw breaks the faceting identity (r8 property-test find —
    # test_faceted_mosaic_matches_direct_predict)
    off = j.groupBy(
        "row_id", "antenna1", "antenna2", "chan", "facet_id",
        "l_c", "m_c", "n_c", "u", "v", "w", "frequency",
    ).agg(
        (qsum(F.col("flux_i") * F.cos(th_off), 1e6) / F.lit(1e6)).alias("sf_re"),
        (qsum(F.col("flux_i") * F.sin(th_off), 1e6) / F.lit(1e6)).alias("sf_im"),
    )
    tc = (
        F.lit(K)
        * (
            F.col("u") * F.col("l_c")
            + F.col("v") * F.col("m_c")
            + F.col("w") * (F.col("n_c") - F.lit(1.0))
        )
        * F.col("frequency")
    )
    steered = off.select(
        "row_id", "antenna1", "antenna2", "chan",
        tc.alias("tc"), "sf_re", "sf_im",
    )
    return (
        steered.groupBy("row_id", "antenna1", "antenna2", "chan")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (qsum(
                F.col("sf_re") * F.cos("tc") - F.col("sf_im") * F.sin("tc"), 1e6
            ) / F.lit(1e6)).alias("vis_re"),
            (qsum(
                F.col("sf_re") * F.sin("tc") + F.col("sf_im") * F.cos("tc"), 1e6
            ) / F.lit(1e6)).alias("vis_im"),
        )
        .orderBy("row_id")
    )


@register("briggs_robust_weights", _with_ms(grid_op.BRIGGS_SQL()))
def briggs_robust_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Briggs/robust imaging weights — two-pass cell-density reweighting."""
    return grid_op.briggs_weights(tpch_ms.vis_table(spark, sf_dir))


@register("estimate_cell_size", _with_ms(grid_op.ESTIMATE_CELL_SQL))
def estimate_cell_size_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nyquist cell-size estimate from uv extent (reference gridding/util.py)."""
    return grid_op.estimate_cell_size(tpch_ms.vis_table(spark, sf_dir))


# CLEAN oracle: with a delta PSF, hitting a cell multiplies its residual
# by (1−γ) — computed as val − γ·val, mirrored with the same float op —
# and the decayed magnitudes of one cell are strictly decreasing, so the
# loop's peak sequence equals the GLOBAL descending-magnitude ranking of
# per-cell decay candidates (per-cell recursion, no cross-row aggregate
# inside the recursion). The image values are ratios of exact integer
# qsums, identical in both engines; ties break on canonical cell order,
# matching the operator's sorted argmax.
_CLEAN_ORACLE = f"""
    WITH RECURSIVE vis AS ({tpch_ms.VIS_SQL}),
    grid AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell,
             SUM(CAST(ROUND(vis_re * weight * 100) AS BIGINT)) AS grid_re_q,
             SUM(CAST(ROUND(weight * 100) AS BIGINT)) AS wsum_q
      FROM vis WHERE NOT (flag OR flag_row)
      GROUP BY 1, 2
    ),
    cells AS (
      SELECT u_cell, v_cell, CAST(grid_re_q AS DOUBLE) / wsum_q AS v FROM grid
    ),
    decay AS (
      SELECT u_cell, v_cell, 0 AS k, v AS val FROM cells
      UNION ALL
      SELECT u_cell, v_cell, k + 1, val - 0.1e0 * val FROM decay WHERE k < 49
    ),
    thresh AS (SELECT 0.2e0 * MAX(abs(v)) AS t FROM cells),
    ranked AS (
      SELECT u_cell, v_cell, val,
             row_number() OVER (ORDER BY abs(val) DESC, u_cell, v_cell) AS rnk
      FROM decay
    )
    SELECT CAST(r.rnk - 1 AS INT) AS iteration, r.u_cell, r.v_cell,
           0.1e0 * r.val AS flux
    FROM ranked r, thresh t
    WHERE r.rnk <= 50 AND abs(r.val) > t.t
    ORDER BY iteration
"""


@register("hogbom_clean_components", _CLEAN_ORACLE)
def hogbom_clean_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hogbom CLEAN minor cycle over the collected uv-grid (driver loop,
    reference deconv/hogbom/clean.py:122-200) — exactly oracled: the
    delta-PSF decay structure turns the iterative peak sequence into a
    global candidate ranking (see _CLEAN_ORACLE)."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    return clean_op.hogbom_clean(spark, grid_op.grid_natural(vis))


# Restore oracle: residual after n picks = the decay table at k = n (the
# loop's resid -= γ·resid IS the decay recursion), restore terms are
# 1e-9-quantized Gaussian splats summed as BIGINTs, 2σ² = 4.5 (σ=1.5).
# Quantization is sign·floor(|x|·grid + 0.5) — the IDENTICAL float-op
# sequence the operator runs in numpy, so half-even/half-away rounding
# modes never enter (dyadic grid ratios DO land on exact .5 at 6 dp).
def _q_away_sql(expr: str, grid: str) -> str:
    return f"(sign({expr}) * floor(abs({expr}) * {grid} + 0.5))"


_RESTORE_ORACLE = f"""
    WITH RECURSIVE vis AS ({tpch_ms.VIS_SQL}),
    grid AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell,
             SUM(CAST(ROUND(vis_re * weight * 100) AS BIGINT)) AS grid_re_q,
             SUM(CAST(ROUND(weight * 100) AS BIGINT)) AS wsum_q
      FROM vis WHERE NOT (flag OR flag_row)
      GROUP BY 1, 2
    ),
    cells AS (
      SELECT u_cell, v_cell, CAST(grid_re_q AS DOUBLE) / wsum_q AS v FROM grid
    ),
    decay AS (
      SELECT u_cell, v_cell, 0 AS k, v AS val FROM cells
      UNION ALL
      SELECT u_cell, v_cell, k + 1, val - 0.1e0 * val FROM decay WHERE k < 50
    ),
    thresh AS (SELECT 0.2e0 * MAX(abs(v)) AS t FROM cells),
    ranked AS (
      SELECT u_cell, v_cell, val,
             row_number() OVER (ORDER BY abs(val) DESC, u_cell, v_cell) AS rnk
      FROM decay
    ),
    comps AS (
      SELECT r.u_cell AS cu, r.v_cell AS cv, 0.1e0 * r.val AS flux
      FROM ranked r, thresh t
      WHERE r.rnk <= 50 AND abs(r.val) > t.t
    ),
    picks AS (SELECT cu, cv, COUNT(*) AS n FROM comps GROUP BY cu, cv),
    residf AS (
      SELECT c.u_cell, c.v_cell,
             CAST(COALESCE(p.n, 0) AS INT) AS n_picks,
             d.val AS residual
      FROM cells c
      LEFT JOIN picks p ON p.cu = c.u_cell AND p.cv = c.v_cell
      JOIN decay d ON d.u_cell = c.u_cell AND d.v_cell = c.v_cell
                  AND d.k = COALESCE(p.n, 0)
    ),
    beam AS (
      SELECT r.u_cell, r.v_cell,
             CAST(SUM(CAST({_q_away_sql('''m.flux * exp(
               -((r.u_cell - m.cu) * (r.u_cell - m.cu)
                 + (r.v_cell - m.cv) * (r.v_cell - m.cv)) / 4.5e0)''', '1000000000')}
               AS BIGINT)) AS BIGINT) AS bq
      FROM residf r, comps m
      GROUP BY r.u_cell, r.v_cell
    )
    SELECT r.u_cell, r.v_cell, r.n_picks,
           {_q_away_sql('r.residual', '1000000')} / 1000000.0 AS residual,
           {_q_away_sql('(r.residual + COALESCE(b.bq, 0) / 1000000000.0)', '1000000')}
             / 1000000.0 AS restored
    FROM residf r
    LEFT JOIN beam b ON b.u_cell = r.u_cell AND b.v_cell = r.v_cell
    ORDER BY r.u_cell, r.v_cell
"""


def _restore_sweep_oracle(sigmas: tuple = (1.0, 1.5, 2.5)) -> str:
    """Beam-width-sweep oracle: the decay/comps/residf machinery of
    _RESTORE_ORACLE once, then one beam CTE + tagged SELECT per σ
    (2σ² spelled as an exact double literal), UNION ALL'd."""
    assert _RESTORE_ORACLE.count("beam AS (") == 1, "restore oracle reshaped"
    common = _RESTORE_ORACLE.split("beam AS (")[0].rstrip().rstrip(",")
    beams, selects = [], []
    for i, s in enumerate(sigmas):
        # CAST(repr AS DOUBLE): survives scientific-notation reprs of
        # small sigmas, unlike a concatenated e0 suffix
        denom = f"CAST({2.0 * s * s!r} AS DOUBLE)"
        beams.append(
            f"""beam{i} AS (
      SELECT r.u_cell, r.v_cell,
             CAST(SUM(CAST({_q_away_sql(f'''m.flux * exp(
               -((r.u_cell - m.cu) * (r.u_cell - m.cu)
                 + (r.v_cell - m.cv) * (r.v_cell - m.cv)) / {denom})''', '1000000000')}
               AS BIGINT)) AS BIGINT) AS bq
      FROM residf r, comps m
      GROUP BY r.u_cell, r.v_cell
    )"""
        )
        selects.append(
            f"""SELECT CAST({s!r} AS DOUBLE) AS sigma,
           r.u_cell, r.v_cell, r.n_picks,
           {_q_away_sql('r.residual', '1000000')} / 1000000.0 AS residual,
           {_q_away_sql('(r.residual + COALESCE(b.bq, 0) / 1000000000.0)', '1000000')}
             / 1000000.0 AS restored
    FROM residf r
    LEFT JOIN beam{i} b ON b.u_cell = r.u_cell AND b.v_cell = r.v_cell"""
        )
    return (
        common
        + ",\n    "
        + ",\n    ".join(beams)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
        + "\n    ORDER BY sigma, u_cell, v_cell"
    )


@register("clean_restore_beam_sweep", _restore_sweep_oracle())
def clean_restore_beam_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restoring-beam width sweep over one CLEAN solution (σ ∈ {1.0,
    1.5, 2.5} cell units): the minor cycle runs once, the restore
    convolution per beam — the fitted-vs-forced beam comparison of an
    imaging pipeline, exactly oracled per σ."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    return clean_op.clean_restore_beam_sweep(
        spark, grid_op.grid_natural(vis)
    ).orderBy("sigma", "u_cell", "v_cell")


@register("clean_restore_image", _RESTORE_ORACLE)
def clean_restore_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end imaging minor cycle: distributed natural-weight grid →
    driver Hogbom CLEAN → restoring-beam convolution of the components +
    residual (reference deconv/hogbom/clean.py:122-246 composed with the
    gridder) — the full dirty→model→restored loop as one query, exactly
    oracled via the decay-table identity (residual after n picks = decay
    at k=n) and 1e-9-quantized Gaussian splats."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    return clean_op.clean_restore(spark, grid_op.grid_natural(vis)).orderBy(
        "u_cell", "v_cell"
    )


def _write_wsclean_file(sf_dir: str) -> str:
    """Deterministic WSClean text model derived from nation keys (so the
    oracle can recompute every parsed value from the table)."""
    import duckdb as _duckdb

    rows = _duckdb.sql(
        f"SELECT n_nationkey FROM '{sf_dir}/nation.parquet' ORDER BY n_nationkey"
    ).fetchall()
    path = _os.path.join(_tempfile.gettempdir(), "codex_africanus_wsclean_model.txt")
    with open(path, "w") as fh:
        fh.write(
            "Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, "
            "ReferenceFrequency='856000000.0', MajorAxis, MinorAxis, Orientation\n"
        )
        for (n,) in rows:
            sign = "-" if n % 2 else "+"
            ra = f"{n % 24:02d}:{(n * 7) % 60:02d}:{n % 60:02d}"
            dec = f"{sign}{n % 45:02d}.{(n * 3) % 60:02d}.{(n * 11) % 60:02d}"
            gauss = n % 3 == 0
            stype = "GAUSSIAN" if gauss else "POINT"
            spi = f"[{-(n % 3)}e-1,{(n % 2)}e-2]"
            logsi = "true" if n % 2 == 0 else "false"
            maj = f"{(1 + n % 4) * 10}" if gauss else ""
            mnr = f"{(1 + n % 4) * 5}" if gauss else ""
            ori = f"{(n * 15) % 180}" if gauss else ""
            fh.write(f"s{n},{stype},{ra},{dec},{1 + n % 5},{spi},{logsi},,{maj},{mnr},{ori}\n")
    return path


_WSCLEAN_ORACLE = """
    SELECT concat('s', n_nationkey) AS name,
           CASE WHEN n_nationkey % 3 = 0 THEN 'GAUSSIAN' ELSE 'POINT' END AS source_type,
           round(((n_nationkey % 24) + ((n_nationkey * 7) % 60) / 60.0 + (n_nationkey % 60) / 3600.0)
                 * (pi() / 12.0), 9) AS ra,
           round((CASE WHEN n_nationkey % 2 = 1 THEN -1.0 ELSE 1.0 END)
                 * ((n_nationkey % 45) + ((n_nationkey * 3) % 60) / 60.0 + ((n_nationkey * 11) % 60) / 3600.0)
                 * (pi() / 180.0), 9) AS dec,
           CAST(1 + n_nationkey % 5 AS DOUBLE) AS flux_i,
           round(-(n_nationkey % 3) / 10.0, 9) AS spi_0,
           round((n_nationkey % 2) / 100.0, 9) AS spi_1,
           (n_nationkey % 2 = 0) AS log_si,
           856000000.0 AS ref_freq
    FROM nation ORDER BY name
"""


@register("wsclean_model_reader", _WSCLEAN_ORACLE)
def wsclean_model_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WSClean text sky-model ingest: header defaults, sexagesimal Ra/Dec
    converters, bracketed spectral-index lists — all Column expressions
    (reference file_model.py:197-251)."""
    path = _write_wsclean_file(sf_dir)
    src = wsclean_src.read_wsclean_model(spark, path)
    return src.select(
        "name",
        "source_type",
        F.round(F.col("ra"), 9).alias("ra"),
        F.round(F.col("dec"), 9).alias("dec"),
        "flux_i",
        F.round(F.col("spectral_index").getItem(0), 9).alias("spi_0"),
        F.round(F.col("spectral_index").getItem(1), 9).alias("spi_1"),
        "log_si",
        "ref_freq",
    ).orderBy("name")


@register("degrid_policy_phase_rotate", _with_ms(grid_op.degrid_phase_rotated_sql()))
def degrid_policy_phase_rotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-parameterized degridding: nearest-cell gather composed with
    the Perley & Cornwell phase-rotate policy (reference
    perleypolyhedron/policies/phase_transform_policies.py:10-36) — the
    delta-lmn literals constant-fold, so the policy costs nothing beyond
    the broadcast degrid join."""
    return grid_op.degrid_phase_rotated(tpch_ms.vis_table(spark, sf_dir))


def _beam_lg(e: str) -> str:
    """l/m grid value at index e (linspace(-0.1, 0.1, 33)) — the ONE
    definition shared by the corner-value and index/weight CTE builders
    (a drift between two copies would silently corrupt every beam
    oracle)."""
    return f"(({e}) * (0.2e0 / 32) + (-0.1e0))"


def _beam_fgv(e: str) -> str:
    """freq grid value at index e (linspace(856e6, 1712e6, 5))."""
    return f"(({e}) * (856000000.0 / 4) + 856000000.0)"


def _beam_trilinear_total() -> str:
    """SQL expression for the trilinear-interpolated test-cube value over
    the `wts` CTE columns (li/mi/fi + lw/mw/fw) — shared by the sampling
    oracle and the beam-DDE predict oracle so the arithmetic cannot fork."""

    lg, fgv = _beam_lg, _beam_fgv

    def cube(li, mi, fi):
        return (
            f"(cos(({lg(li)} / 0.1e0) * 1.2e0) * cos(({lg(mi)} / 0.1e0) * 1.1e0))"
            f" * (1.0 - 0.1e0 * (({fgv(fi)} / 856000000.0) - 1.0))"
        )

    corners = []
    for dl in (0, 1):
        for dm in (0, 1):
            for df_ in (0, 1):
                w = (
                    f"({'lw' if dl else '(1.0 - lw)'}"
                    f" * {'mw' if dm else '(1.0 - mw)'})"
                    f" * {'fw' if df_ else '(1.0 - fw)'}"
                )
                corners.append(f"({w} * ({cube(f'li + {dl}', f'mi + {dm}', f'fi + {df_}')}))")
    # corner order (dl, dm, df) outer-to-inner == the UDF's tuple order
    # ((0,0,0), (0,0,1), (0,1,0), ...) — summation sequence matches
    total = corners[0]
    for c in corners[1:]:
        total = f"({total} + {c})"
    return total


_BEAM_DEFAULT_PAIRS = """
          SELECT s.source_id, c.chan, s.l, s.m,
                 856000000.0 * (1 + c.chan / 8.0) AS freq
          FROM src s, chan c
        """


def _beam_gain_ctes(pairs_sql: str = _BEAM_DEFAULT_PAIRS) -> str:
    """CTE chain computing the trilinear beam sample over whatever
    `pairs_sql` emits (must provide l, m, freq; extra key columns ride
    through p.*) — the body shared by `_beam_cube_oracle`, the beam-DDE
    predict oracle, and the pointing-error variant (ends with the `wts`
    CTE; select `_beam_trilinear_total()` from it)."""

    lg, fgv = _beam_lg, _beam_fgv

    return f"""
        , chan AS (SELECT CAST(range AS INT) AS chan FROM range(7))
        , pairs AS ({pairs_sql}), idx AS (
          SELECT p.*,
            LEAST(GREATEST(COALESCE((SELECT MAX(g.range) FROM range(33) g
              WHERE {lg('g.range')} <= p.l), -1), 0), 31) AS li,
            LEAST(GREATEST(COALESCE((SELECT MAX(g.range) FROM range(33) g
              WHERE {lg('g.range')} <= p.m), -1), 0), 31) AS mi,
            LEAST(GREATEST(COALESCE((SELECT MAX(g.range) FROM range(5) g
              WHERE {fgv('g.range')} <= p.freq), -1), 0), 3) AS fi
          FROM pairs p
        ), wts AS (
          SELECT *,
            LEAST(GREATEST((l - {lg('li')}) / ({lg('li + 1')} - {lg('li')}), 0.0), 1.0) AS lw,
            LEAST(GREATEST((m - {lg('mi')}) / ({lg('mi + 1')} - {lg('mi')}), 0.0), 1.0) AS mw,
            LEAST(GREATEST((freq - {fgv('fi')}) / ({fgv('fi + 1')} - {fgv('fi')}), 0.0), 1.0) AS fw
          FROM idx
        )"""


def _beam_cube_oracle() -> str:
    """Exact SQL mirror of the trilinear sampling: the synthetic cube is
    closed-form (make_test_beam_cube), linspace grids are affine with a
    dyadic-exact delta (2·0.1 and /32 are both exact), and searchsorted
    is MAX(i) FILTER (g ≤ x) over the same float grid values — so DuckDB
    reproduces the pandas-UDF gather bit-for-bit before the 9dp round."""
    return _with_ms(
        f"""{_beam_gain_ctes()}
        SELECT source_id, chan, round({_beam_trilinear_total()}, 9) AS beam_gain
        FROM wts ORDER BY source_id, chan
        """
    )


@register("beam_cube_dde_sampling", _beam_cube_oracle())
def beam_cube_dde_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trilinear beam-cube interpolation per (source, chan) via broadcast
    cube + Arrow pandas UDF (reference fast_beam_cubes.py:58-301) —
    gather-heavy in general; for the closed-form test cube the DuckDB
    oracle reproduces the gather exactly (see _beam_cube_oracle)."""
    src = tpch_ms.source_table(spark, sf_dir)
    chan = spark.range(7).select(F.col("id").cast("int").alias("chan"))
    pairs = src.crossJoin(chan).select(
        "source_id", "chan", "l", "m",
        (F.lit(tpch_ms.REF_FREQ) * (1 + F.col("chan") / F.lit(8.0))).alias("frequency"),
    )
    beam = beam_op.make_test_beam_cube()
    out = beam_op.beam_cube_dde(pairs, beam)
    return out.select(
        "source_id", "chan", F.round(F.col("beam_gain"), 9).alias("beam_gain")
    ).orderBy("source_id", "chan")


def _beam_stokes_predict_oracle() -> str:
    """Beam-DDE predict mirror: the shared trilinear CTE chain feeds the
    per-(source, chan) gain (rounded to the same 9dp grid as the engine
    side, so bg is the identical double), squared into the I,Q-only
    XX/YY brightness, phase-rotated and reduced on the 1e-6 fixed-point
    grid exactly like _PREDICT_ORACLE."""
    return _with_ms(
        f"""{_beam_gain_ctes()}
        , beamg AS (
          SELECT source_id, chan, round({_beam_trilinear_total()}, 9) AS bg
          FROM wts
        ), coh AS (
          SELECT v.row_id, v.antenna1, v.antenna2, v.chan,
                 ((b.bg * b.bg) * (s.flux_i + s.flux_q)) AS fxx,
                 ((b.bg * b.bg) * (s.flux_i - s.flux_q)) AS fyy,
                 -2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency AS theta
          FROM vis v
          JOIN beamg b ON b.chan = v.chan
          JOIN src s ON s.source_id = b.source_id
        )
        SELECT row_id, antenna1, antenna2, chan,
               SUM(CAST(ROUND(fxx * cos(theta) * 1000000) AS BIGINT)) / 1000000.0 AS xx_re,
               SUM(CAST(ROUND(fxx * sin(theta) * 1000000) AS BIGINT)) / 1000000.0 AS xx_im,
               SUM(CAST(ROUND(fyy * cos(theta) * 1000000) AS BIGINT)) / 1000000.0 AS yy_re,
               SUM(CAST(ROUND(fyy * sin(theta) * 1000000) AS BIGINT)) / 1000000.0 AS yy_im
        FROM coh
        GROUP BY row_id, antenna1, antenna2, chan
        """
    )


@register("beam_stokes_dde_predict", _beam_stokes_predict_oracle())
def beam_stokes_dde_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam-sampled DDE predict through the general stokes compiler: an
    I,Q-only catalogue compiled to diagonal XX/YY correlations (U,V
    implicitly defaulted — reference conversion.py:56-205 priority
    scheme), the trilinear test-cube beam sampled per (source, chan)
    (fast_beam_cubes.py:58-301) applied as the real scalar E-Jones
    sandwich E·B·Eᴴ = bg²·B (the dde path of predict.py:86-150), then
    the deterministic fixed-point source reduction of predict.py:566-649.

    Plan shape: the beam/brightness side is (n_src × n_chan) rows built
    once (the pandas UDF runs on the tiny side only) and broadcast; the
    fact table joins on chan — no fact shuffle before the partial agg."""
    from codex_africanus_spark.functions.stokes import convert_general
    from codex_africanus_spark.sources.tables import fan_out

    src = tpch_ms.source_table(spark, sf_dir)
    chan = spark.range(7).select(F.col("id").cast("int").alias("chan"))
    pairs = src.crossJoin(chan).select(
        "source_id", "chan", "l", "m",
        (F.lit(tpch_ms.REF_FREQ) * (1 + F.col("chan") / F.lit(8.0))).alias("frequency"),
    )
    bg = beam_op.beam_cube_dde(pairs, beam_op.make_test_beam_cube()).select(
        "source_id", "chan", F.round(F.col("beam_gain"), 9).alias("bg")
    )
    corrs = convert_general(
        {"I": F.col("flux_i"), "Q": F.col("flux_q")}, ["XX", "YY"]
    )
    src_corr = src.select(
        "source_id", "l", "m", "n",
        corrs["XX"].re.alias("xx"), corrs["YY"].re.alias("yy"),
    )
    src_beam = src_corr.join(bg, "source_id").select(
        "chan", "l", "m", "n",
        ((F.col("bg") * F.col("bg")) * F.col("xx")).alias("fxx"),
        ((F.col("bg") * F.col("bg")) * F.col("yy")).alias("fyy"),
    )
    vis = tpch_ms.vis_table(spark, sf_dir)
    j = fan_out(vis).join(F.broadcast(src_beam), "chan")
    theta = phase_delay_angle(
        phase_path(F.col("u"), F.col("v"), F.col("w"),
                   F.col("l"), F.col("m"), F.col("n")),
        F.col("frequency"),
    )
    coh = j.select(
        "row_id", "antenna1", "antenna2", "chan",
        (F.col("fxx") * F.cos(theta)).alias("cxx_re"),
        (F.col("fxx") * F.sin(theta)).alias("cxx_im"),
        (F.col("fyy") * F.cos(theta)).alias("cyy_re"),
        (F.col("fyy") * F.sin(theta)).alias("cyy_im"),
    )
    # no output sort: order-insensitive compare; a global sort of a
    # fact-sized result is exactly what dies at 100 TB
    return coh.groupBy("row_id", "antenna1", "antenna2", "chan").agg(
        (qsum(F.col("cxx_re"), 1e6) / F.lit(1e6)).alias("xx_re"),
        (qsum(F.col("cxx_im"), 1e6) / F.lit(1e6)).alias("xx_im"),
        (qsum(F.col("cyy_re"), 1e6) / F.lit(1e6)).alias("yy_re"),
        (qsum(F.col("cyy_im"), 1e6) / F.lit(1e6)).alias("yy_im"),
    )


_WSCLEAN_SPECTRA_ORACLE = _with_ms(
    """
    SELECT s.source_id, CAST(c.range AS INT) AS chan,
           round(CASE WHEN s.source_id % 2 = 0
             THEN exp(ln(s.flux_i) + s.spi * ln((856000000.0 * (1 + c.range / 8.0)) / s.ref_freq)
                      + 0.01 * ln((856000000.0 * (1 + c.range / 8.0)) / s.ref_freq)
                           * ln((856000000.0 * (1 + c.range / 8.0)) / s.ref_freq))
             ELSE s.flux_i + s.spi * ((856000000.0 * (1 + c.range / 8.0)) / s.ref_freq - 1.0)
                  + 0.01 * ((856000000.0 * (1 + c.range / 8.0)) / s.ref_freq - 1.0)
                        * ((856000000.0 * (1 + c.range / 8.0)) / s.ref_freq - 1.0)
             END, 9) AS flux
    FROM src s, range(7) c
    ORDER BY s.source_id, chan
    """
)


@register("wsclean_polynomial_spectra", _WSCLEAN_SPECTRA_ORACLE)
def wsclean_polynomial_spectra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WSClean ordinary vs logarithmic polynomial spectra (reference
    model/wsclean/spec_model.py:9-27,71-132) with coeffs [spi, 0.01]."""
    src = tpch_ms.source_table(spark, sf_dir)
    chan = spark.range(7).select(F.col("id").cast("int").alias("chan"))
    j = src.crossJoin(chan)
    freq = F.lit(tpch_ms.REF_FREQ) * (1 + F.col("chan") / F.lit(8.0))
    flux = wsclean_spectra(
        F.col("flux_i"),
        [F.col("spi"), F.lit(0.01)],
        F.col("source_id") % 2 == 0,
        F.col("ref_freq"),
        freq,
    )
    return j.select(
        "source_id", "chan", F.round(flux, 9).alias("flux")
    ).orderBy("source_id", "chan")


_IM_TO_VIS_ORACLE = _with_ms(
    """
    , gated AS (SELECT * FROM vis WHERE NOT (flag OR flag_row)),
    image AS (
      SELECT s.source_id, s.l, s.m, s.n, v.chan,
             SUM(CAST(ROUND((cos(2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * v.vis_re
                           - sin(2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * v.vis_im)
                      * 1000000) AS BIGINT)) / 1000000.0 AS image
      FROM gated v, src s
      GROUP BY s.source_id, s.l, s.m, s.n, v.chan
    )
    SELECT v.row_id, v.chan,
           SUM(CAST(ROUND(i.image * cos(-2.0958450219516816e-08 * (v.u*i.l + v.v*i.m + v.w*(i.n-1.0)) * v.frequency) * 1000000) AS BIGINT)) / 1000000.0 AS vis_re,
           SUM(CAST(ROUND(i.image * sin(-2.0958450219516816e-08 * (v.u*i.l + v.v*i.m + v.w*(i.n-1.0)) * v.frequency) * 1000000) AS BIGINT)) / 1000000.0 AS vis_im
    FROM gated v JOIN image i ON v.chan = i.chan
    WHERE v.row_id % 31 = 0
    GROUP BY v.row_id, v.chan
    ORDER BY v.row_id, v.chan
    """
)


@register("dft_im_to_vis_forward", _IM_TO_VIS_ORACLE)
def dft_im_to_vis_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward DFT: predict visibilities from the vis_to_im image table
    (reference dft/kernels.py:15-69) — the adjoint round-trip pair."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    src = tpch_ms.source_table(spark, sf_dir)
    image = dft_op.vis_to_im(vis, src).join(
        F.broadcast(
            tpch_ms.source_table(spark, sf_dir).select("source_id", "l", "m", "n")
        ),
        "source_id",
    )
    gated = vis.filter(~(F.col("flag") | F.col("flag_row"))).filter(
        F.col("row_id") % 31 == 0
    )
    j = gated.join(
        F.broadcast(image.select("source_id", "chan", "l", "m", "n", "image")), "chan"
    )
    from codex_africanus_spark.functions.phase import phase_delay_angle, phase_path

    theta = phase_delay_angle(
        phase_path(F.col("u"), F.col("v"), F.col("w"), F.col("l"), F.col("m"), F.col("n")),
        F.col("frequency"),
        "fourier",
    )
    return (
        j.groupBy("row_id", "chan")
        .agg(
            (qsum(F.col("image") * F.cos(theta), 1e6) / F.lit(1e6)).alias("vis_re"),
            (qsum(F.col("image") * F.sin(theta), 1e6) / F.lit(1e6)).alias("vis_im"),
        )
        .orderBy("row_id", "chan")
    )


_SHAPELET_COEFFS = [1.0, 0.5, -0.25, 0.125]


_SHAPELET_ORACLE = _with_ms(
    f"""
    SELECT row_id,
           round({shapelet_1d_sql('u / 100.0', _SHAPELET_COEFFS, 1.0)}, 9) AS shapelet_u,
           round({shapelet_1d_sql('v / 100.0', _SHAPELET_COEFFS, 1.0)}, 9) AS shapelet_v
    FROM vis WHERE row_id % 41 = 0
    ORDER BY row_id
    """
)


@register("shapelet_basis_eval", _SHAPELET_ORACLE)
def shapelet_basis_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hermite shapelet basis evaluation at scaled uv (reference
    model/shape/shapelets.py:57-153; orders ≤ 3 as closed-form Column
    expressions — codegen path; higher orders via pandas UDF)."""
    vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 41 == 0)
    return vis.select(
        "row_id",
        F.round(shapelet_1d(F.col("u") / 100.0, _SHAPELET_COEFFS, 1.0), 9).alias("shapelet_u"),
        F.round(shapelet_1d(F.col("v") / 100.0, _SHAPELET_COEFFS, 1.0), 9).alias("shapelet_v"),
    ).orderBy("row_id")


# Exact SQL mirror of the Zernike UDF for the fixed Noll set [1,2,3,4]
# (Z1=piston, Z2=ρcosθ tilt, Z3=ρsinθ tilt, Z4=2ρ²−1 defocus): radial
# polynomials written with explicit products (no pow), accumulation
# order matching the sampler's coefficient loop.
_ZERNIKE_ORACLE = _with_ms(
    """
    , pol AS (
      SELECT source_id,
             sqrt((l / 0.1e0) * (l / 0.1e0) + (m / 0.1e0) * (m / 0.1e0)) AS rho,
             atan2(m / 0.1e0, l / 0.1e0) AS theta
      FROM src
    ), rc AS (
      SELECT source_id, theta, LEAST(GREATEST(rho, 0.0), 1.0) AS rc FROM pol
    )
    SELECT source_id,
           round((((1.0e0 * (1.0 * cos(0.0 * theta)))
                   + (0.3e0 * (rc * cos(theta))))
                  + ((-0.2e0) * (rc * sin(theta))))
                 + (0.1e0 * (((2.0 * (rc * rc)) - 1.0) * cos(0.0 * theta))), 9)
             AS zernike_gain
    FROM rc ORDER BY source_id
    """
)


@register("zernike_dde_sampling", _ZERNIKE_ORACLE)
def zernike_dde_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zernike-polynomial beam DDE at each catalogue pointing (reference
    rime/zernike.py:110-198) — pandas UDF with broadcast Noll
    coefficients; for the fixed Noll set the polynomial expansion is
    closed-form, so the DuckDB oracle reproduces the sampler exactly
    (NumPy-oracle unit test additionally covers arbitrary indices)."""
    src = tpch_ms.source_table(spark, sf_dir)
    out = zernike_op.zernike_dde(
        src.select("source_id", "l", "m"), [1.0, 0.3, -0.2, 0.1], [1, 2, 3, 4]
    )
    return out.select(
        "source_id", F.round(F.col("zernike_gain"), 9).alias("zernike_gain")
    ).orderBy("source_id")


_FREQ_GRID = [856e6, 1070e6, 1284e6, 1498e6, 1712e6]


_ASOF_ORACLE = _with_ms(
    f"""
    , grid AS (SELECT unnest([{", ".join(f"{g!r}e0" if "e" not in repr(g) else repr(g) for g in _FREQ_GRID)}]) AS g),
    clamped AS (
      SELECT row_id, LEAST(GREATEST(frequency, 856000000.0), 1712000000.0) AS v
      FROM vis WHERE row_id % 37 = 0
    ),
    lo AS (
      SELECT c.row_id, c.v,
             CASE WHEN MAX(g.g) >= 1712000000.0 THEN 1498000000.0 ELSE MAX(g.g) END AS grid_lo
      FROM clamped c JOIN grid g ON g.g <= c.v
      GROUP BY c.row_id, c.v
    ),
    hi AS (
      SELECT l.row_id, l.v, l.grid_lo, MIN(g.g) AS grid_hi
      FROM lo l JOIN grid g ON g.g > l.grid_lo
      GROUP BY l.row_id, l.v, l.grid_lo
    )
    SELECT row_id, grid_lo, grid_hi,
           (v - grid_lo) / (grid_hi - grid_lo) AS interp_weight
    FROM hi ORDER BY row_id
    """
)


@register("asof_freq_grid_interp", _ASOF_ORACLE)
def asof_freq_grid_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam-frequency as-of/interval join: each data frequency matched to
    its enclosing grid interval with clamped linear weight (reference
    fast_beam_cubes.py:11-54 freq_grid_interp)."""
    vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 37 == 0)
    grid = spark.createDataFrame([(g,) for g in _FREQ_GRID], "grid_value double")
    out = asof_op.asof_grid_interp(
        vis.select("row_id", "frequency"), grid, "frequency", keys=["row_id"]
    )
    return out.select("row_id", "grid_lo", "grid_hi", "interp_weight").orderBy("row_id")


_WSCLEAN_PREDICT_ORACLE = _with_ms(
    """
    , wsrc AS (
      SELECT ((n_nationkey % 24) + ((n_nationkey * 7) % 60) / 60.0 + (n_nationkey % 60) / 3600.0)
               * (pi() / 12.0) AS ra,
             (CASE WHEN n_nationkey % 2 = 1 THEN -1.0 ELSE 1.0 END)
               * ((n_nationkey % 45) + ((n_nationkey * 3) % 60) / 60.0 + ((n_nationkey * 11) % 60) / 3600.0)
               * (pi() / 180.0) AS dec,
             CAST(1 + n_nationkey % 5 AS DOUBLE) AS flux_i
      FROM nation
    ),
    lm AS (
      SELECT flux_i,
             cos(dec) * sin(ra - 0.5)                                   AS l,
             sin(dec) * cos(CAST(0.1 AS DOUBLE))
               - cos(dec) * sin(CAST(0.1 AS DOUBLE)) * cos(ra - 0.5)    AS m
      FROM wsrc
    ),
    lmn AS (
      SELECT flux_i, l, m,
             sqrt(greatest(0.0, 1.0 - l*l - m*m)) AS n
      FROM lm
    )
    SELECT v.row_id, v.chan,
           SUM(CAST(ROUND(s.flux_i * cos(-2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * 1000000) AS BIGINT)) / 1000000.0 AS vis_re,
           SUM(CAST(ROUND(s.flux_i * sin(-2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * 1000000) AS BIGINT)) / 1000000.0 AS vis_im
    FROM vis v, lmn s
    WHERE v.row_id % 23 = 0
    GROUP BY v.row_id, v.chan
    ORDER BY v.row_id, v.chan
    """
)


@register("wsclean_predict_end_to_end", _WSCLEAN_PREDICT_ORACLE)
def wsclean_predict_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full predict.py workflow in one Catalyst plan:
    WSClean text model → sexagesimal parse → radec_to_lmn → phase-delay
    cross join → flux-weighted deterministic source reduction
    (examples/predict.py:531-586, re-expressed Spark-first)."""
    path = _write_wsclean_file(sf_dir)
    src = wsclean_src.read_wsclean_model(spark, path)
    l, m, n = radec_to_lmn(F.col("ra"), F.col("dec"), F.lit(0.5), F.lit(0.1))
    lmn = src.select(
        "flux_i", l.alias("l"), m.alias("m"), n.alias("n")
    )
    vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 23 == 0)
    j = vis.crossJoin(F.broadcast(lmn))
    theta = phase_delay_angle(
        phase_path(F.col("u"), F.col("v"), F.col("w"), F.col("l"), F.col("m"), F.col("n")),
        F.col("frequency"),
        "fourier",
    )
    return (
        j.groupBy("row_id", "chan")
        .agg(
            (qsum(F.col("flux_i") * F.cos(theta), 1e6) / F.lit(1e6)).alias("vis_re"),
            (qsum(F.col("flux_i") * F.sin(theta), 1e6) / F.lit(1e6)).alias("vis_im"),
        )
        .orderBy("row_id", "chan")
    )


_RIME_SHAPELET_ORACLE = _with_ms(
    """
    , coh AS (
      SELECT v.row_id, v.antenna1, v.antenna2, v.chan,
             s.flux_i * pow(v.frequency / s.ref_freq, s.spi)
               * {shp} AS flux,
             -2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency AS theta
      FROM vis v, src s
    )
    SELECT row_id, antenna1, antenna2, chan,
           SUM(CAST(ROUND(flux * cos(theta) * 1000000) AS BIGINT)) / 1000000.0 AS vis_re,
           SUM(CAST(ROUND(flux * sin(theta) * 1000000) AS BIGINT)) / 1000000.0 AS vis_im
    FROM coh
    GROUP BY row_id, antenna1, antenna2, chan
    ORDER BY row_id
    """.format(shp=shapelet_1d_sql("v.u / 100.0", [1.0, 0.5, -0.25, 0.125], 1.0))
)


@register("rime_shapelet_predict", _RIME_SHAPELET_ORACLE)
def rime_shapelet_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'(Kpq, Bpq, Sp)': Hermite shapelet envelope composed through the
    RIME spec compiler (reference shapelets.py:57-153 as a fused term).
    The S term is a closed-form Column expression, so the whole spec
    stays in whole-stage codegen and remains exactly oracle-able."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    src = tpch_ms.source_table(spark, sf_dir)
    return rime_plan.rime("(Kpq, Bpq, Sp)", vis, src)


# Orders 6x4 — beyond the expression path's 0..3 limit (ROADMAP #4:
# "shapelet orders > 3 take the UDF path"); a few zeros exercise the
# reference's zero-coefficient skip (shapelets.py:91-97).
SH2D_COEFFS = [
    [((n1 * 4 + n2) * 7 % 11 - 5) / 8.0 if (n1 * 4 + n2) * 7 % 11 != 5 else 0.0
     for n2 in range(4)]
    for n1 in range(6)
]


_SH2D_BU = "CASE WHEN s.source_id = 13 THEN 0.0 ELSE (1 + s.source_id % 3) * 0.05e0 END"


_SH2D_BV = "(1 + s.source_id % 2) * 0.04e0"


def _sh2d_oracle() -> str:
    from codex_africanus_spark.functions.shapes import shapelet_2d_sql_columns

    cols = shapelet_2d_sql_columns(
        "v.u / 500.0", "v.v / 500.0", "v.frequency",
        _SH2D_BU, _SH2D_BV, SH2D_COEFFS,
    )
    return _with_ms(
        f"""
        , sh AS (
          SELECT v.row_id, v.chan, s.source_id,
             cos(-2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) AS ct,
             sin(-2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) AS st,
             {cols}
          FROM vis v, src s
          WHERE v.row_id % 53 = 0
        )
        SELECT row_id, source_id, chan,
               round(sh_re * ct - sh_im * st, 6) AS w_re,
               round(sh_re * st + sh_im * ct, 6) AS w_im
        FROM sh ORDER BY row_id, source_id, chan
        """
    )


@register("shapelet_2d_w_term", _sh2d_oracle())
def shapelet_2d_w_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-order (6x4) 2-D complex shapelet envelope times the
    w-correction phase (reference shapelet_with_w_term,
    shapelets.py:102-149). The Hermite recursion runs in an
    Arrow-batched pandas UDF (operators/shapelets.py); the phase steer
    stays a Column expression — and the whole thing is still EXACTLY
    oracled because the generated DuckDB SQL mirrors the UDF's
    arithmetic term-for-term (shapes.shapelet_2d_sql_columns)."""
    from codex_africanus_spark.functions.complex_algebra import Cplx as _Cplx
    from codex_africanus_spark.functions.complex_algebra import cexp_i
    from codex_africanus_spark.operators.shapelets import shapelet_2d

    vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 53 == 0)
    src = tpch_ms.source_table(spark, sf_dir).select(
        "source_id", "l", "m", "n",
        F.when(F.col("source_id") == 13, F.lit(0.0))
        .otherwise((1 + F.col("source_id") % 3) * F.lit(0.05)).alias("beta_u"),
        ((1 + F.col("source_id") % 2) * F.lit(0.04)).alias("beta_v"),
    )
    joined = (
        vis.crossJoin(F.broadcast(src))
        .withColumn("u_coord", F.col("u") / F.lit(500.0))
        .withColumn("v_coord", F.col("v") / F.lit(500.0))
    )
    env = shapelet_2d(joined, SH2D_COEFFS)
    theta = phase_delay_angle(
        phase_path(F.col("u"), F.col("v"), F.col("w"),
                   F.col("l"), F.col("m"), F.col("n")),
        F.col("frequency"), "fourier",
    )
    out = _Cplx(F.col("sh_re"), F.col("sh_im")) * cexp_i(theta)
    return env.select(
        "row_id", "source_id", "chan",
        F.round(out.re, 6).alias("w_re"),
        F.round(out.im, 6).alias("w_im"),
    ).orderBy("row_id", "source_id", "chan")


_FFT_DIRTY_ORACLE = _with_ms(
    """
    , grid AS (
      SELECT ((CAST(ROUND(u / 10.0) AS BIGINT) % 32) + 32) % 32 AS u_cell,
             ((CAST(ROUND(v / 10.0) AS BIGINT) % 32) + 32) % 32 AS v_cell,
             SUM(CAST(ROUND(vis_re * weight * 1000000) AS BIGINT)) / 1000000.0 AS g_re,
             SUM(CAST(ROUND(vis_im * weight * 1000000) AS BIGINT)) / 1000000.0 AS g_im
      FROM vis WHERE NOT (flag OR flag_row)
      GROUP BY 1, 2
    ), wsum AS (
      SELECT SUM(CAST(ROUND(weight * 1000000) AS BIGINT)) / 1000000.0 AS w
      FROM vis WHERE NOT (flag OR flag_row)
    ), pix AS (
      SELECT CAST(y.range AS INT) AS y, CAST(x.range AS INT) AS x
      FROM range(32) y, range(32) x
    )
    SELECT p.y, p.x,
           round(SUM(g.g_re * cos(2 * pi() * (g.v_cell * p.y / 32.0 + g.u_cell * p.x / 32.0))
                     - g.g_im * sin(2 * pi() * (g.v_cell * p.y / 32.0 + g.u_cell * p.x / 32.0)))
                 / MAX(w.w), 6) AS value
    FROM pix p CROSS JOIN grid g CROSS JOIN wsum w
    GROUP BY p.y, p.x
    ORDER BY p.y, p.x
    """
)


@register("fft_dirty_image", _FFT_DIRTY_ORACLE)
def fft_dirty_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFT imaging tier: distributed exact uv-grid accumulation + driver
    FFT → dirty image (the wgridder architecture, vis2im.py:16-130, with
    NumPy standing in for ducc0). The oracle recomputes the image as a
    direct DFT over the same fixed-point grid — the FFT and the DFT agree
    to ~1e-12, far inside the 6dp output round (the engine-side identity
    is also machine-precision-tested in tests/test_fft_imaging.py)."""
    import pandas as _pd

    vis = tpch_ms.vis_table(spark, sf_dir)
    img, wsum = fft_op.dirty_image(vis, nx=32, ny=32)
    ys, xs = [], []
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            ys.append(y), xs.append(x)
    pdf = _pd.DataFrame(
        {"y": ys, "x": xs, "value": [round(float(img[y, x]), 6) for y, x in zip(ys, xs)]}
    )
    return spark.createDataFrame(pdf)


_FFT_WSTACK_ORACLE = _with_ms(
    """
    , grid AS (
      SELECT CAST(ROUND(w / 2.0) AS BIGINT) AS w_plane,
             ((CAST(ROUND(u / 10.0) AS BIGINT) % 32) + 32) % 32 AS u_cell,
             ((CAST(ROUND(v / 10.0) AS BIGINT) % 32) + 32) % 32 AS v_cell,
             SUM(CAST(ROUND(vis_re * weight * 1000000) AS BIGINT)) / 1000000.0 AS g_re,
             SUM(CAST(ROUND(vis_im * weight * 1000000) AS BIGINT)) / 1000000.0 AS g_im
      FROM vis WHERE NOT (flag OR flag_row)
      GROUP BY 1, 2, 3
    ), wsum AS (
      SELECT SUM(CAST(ROUND(weight * 1000000) AS BIGINT)) / 1000000.0 AS w
      FROM vis WHERE NOT (flag OR flag_row)
    ), pix AS (
      SELECT CAST(y.range AS INT) AS y, CAST(x.range AS INT) AS x,
             (((x.range + 16) % 32) - 16) / 320.0 AS l,
             (((y.range + 16) % 32) - 16) / 320.0 AS m
      FROM range(32) y, range(32) x
    ), pixn AS (
      SELECT y, x, sqrt(greatest(0.0, 1.0 - l*l - m*m)) - 1.0 AS nm1 FROM pix
    )
    SELECT p.y, p.x,
           round(SUM(g.g_re * cos(2 * pi() * (g.v_cell * p.y / 32.0 + g.u_cell * p.x / 32.0
                                              + g.w_plane * 2.0 * p.nm1))
                     - g.g_im * sin(2 * pi() * (g.v_cell * p.y / 32.0 + g.u_cell * p.x / 32.0
                                                + g.w_plane * 2.0 * p.nm1)))
                 / MAX(w.w), 6) AS value
    FROM pixn p CROSS JOIN grid g CROSS JOIN wsum w
    GROUP BY p.y, p.x
    ORDER BY p.y, p.x
    """
)


@register("fft_dirty_image_wstack", _FFT_WSTACK_ORACLE)
def fft_dirty_image_wstack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-field dirty image via w-stacking (the reference wgridder's
    w-correction, vis2im.py:16-130): one distributed (w_plane, cell)
    accumulation, per-plane driver FFT × w-screen e^{2πi·w_p·(n−1)},
    planes summed. The oracle is the direct w-term DFT over the same
    fixed-point plane grids — FFT·screen vs DFT agree to ~1e-12, inside
    the 6dp output round."""
    import pandas as _pd

    vis = tpch_ms.vis_table(spark, sf_dir)
    img, wsum = fft_op.dirty_image_wstack(vis, nx=32, ny=32, cell=10.0, w_step=2.0)
    ys, xs = [], []
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            ys.append(y), xs.append(x)
    pdf = _pd.DataFrame(
        {"y": ys, "x": xs, "value": [round(float(img[y, x]), 6) for y, x in zip(ys, xs)]}
    )
    return spark.createDataFrame(pdf)


# Fixed 8×8 two-pixel model image for the residual query: its forward
# FFT has the closed form G[vc,uc] = e^{-iπ(vc+2uc)/4} + 0.5·e^{-iπ(5vc+3uc)/4},
# which the DuckDB oracle evaluates directly — so the whole distributed
# residual-grid stage is EXACTLY oracled even though the Spark side runs
# a genuine np.fft.fft2 (both sides 9dp-quantize the model grid).
_RESID_ORACLE = _with_ms(
    """
    , mg AS (
      SELECT v.range AS v_cell, u.range AS u_cell,
             round(cos(pi() * (v.range + 2 * u.range) / 4.0)
                   + 0.5e0 * cos(pi() * (5 * v.range + 3 * u.range) / 4.0), 9) + 0.0 AS m_re,
             round(-sin(pi() * (v.range + 2 * u.range) / 4.0)
                   - 0.5e0 * sin(pi() * (5 * v.range + 3 * u.range) / 4.0), 9) + 0.0 AS m_im
      FROM range(8) v, range(8) u
    ), cells AS (
      SELECT ((CAST(ROUND(u / 10.0) AS BIGINT) % 8) + 8) % 8 AS u_cell,
             ((CAST(ROUND(v / 10.0) AS BIGINT) % 8) + 8) % 8 AS v_cell,
             vis_re, vis_im, weight
      FROM vis WHERE NOT (flag OR flag_row)
    )
    SELECT c.u_cell, c.v_cell,
           SUM(CAST(ROUND((c.vis_re - m.m_re) * c.weight * 1000000) AS BIGINT)) / 1000000.0 AS res_re,
           SUM(CAST(ROUND((c.vis_im - m.m_im) * c.weight * 1000000) AS BIGINT)) / 1000000.0 AS res_im,
           SUM(CAST(ROUND(c.weight * 1000000) AS BIGINT)) / 1000000.0 AS wsum
    FROM cells c JOIN mg m ON m.u_cell = c.u_cell AND m.v_cell = c.v_cell
    GROUP BY c.u_cell, c.v_cell
    ORDER BY c.u_cell, c.v_cell
    """
)


@register("fft_residual_grid", _RESID_ORACLE)
def fft_residual_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed stage of the wgridder residual (im2residim.py:40-110):
    model image → driver forward FFT → broadcast uv samples → per-row
    subtraction → exact fixed-point grid accumulation. The driver-side
    inverse FFT (residual_image) is O(n_pix log n_pix) and covered by
    tests/test_fft_residual.py."""
    import numpy as np

    vis = tpch_ms.vis_table(spark, sf_dir)
    image = np.zeros((8, 8))
    image[1, 2] = 1.0
    image[5, 3] = 0.5
    g = fft_op.residual_grid(vis, image, cell=10.0)
    return g.select(
        "u_cell",
        "v_cell",
        (F.col("r_re_q") / F.lit(1e6)).alias("res_re"),
        (F.col("r_im_q") / F.lit(1e6)).alias("res_im"),
        (F.col("w_q") / F.lit(1e6)).alias("wsum"),
    ).orderBy("u_cell", "v_cell")


_FFT_PSF_ORACLE = _with_ms(
    """
    , grid AS (
      SELECT ((CAST(ROUND(u / 10.0) AS BIGINT) % 32) + 32) % 32 AS u_cell,
             ((CAST(ROUND(v / 10.0) AS BIGINT) % 32) + 32) % 32 AS v_cell,
             SUM(CAST(ROUND(weight * 1000000) AS BIGINT)) / 1000000.0 AS g_re
      FROM vis WHERE NOT (flag OR flag_row)
      GROUP BY 1, 2
    ), wsum AS (
      SELECT SUM(CAST(ROUND(weight * 1000000) AS BIGINT)) / 1000000.0 AS w
      FROM vis WHERE NOT (flag OR flag_row)
    ), pix AS (
      SELECT CAST(y.range AS INT) AS y, CAST(x.range AS INT) AS x
      FROM range(32) y, range(32) x
    )
    SELECT p.y, p.x,
           round(SUM(g.g_re * cos(2 * pi() * (g.v_cell * p.y / 32.0 + g.u_cell * p.x / 32.0)))
                 / MAX(w.w), 6) AS value
    FROM pix p CROSS JOIN grid g CROSS JOIN wsum w
    GROUP BY p.y, p.x
    ORDER BY p.y, p.x
    """
)


@register("fft_psf_image", _FFT_PSF_ORACLE)
def fft_psf_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-spread function image: the dirty-image path with unit
    visibilities (weights-only grid → driver FFT → normalize), the third
    member of the imaging triple next to fft_dirty_image and
    fft_residual_grid (reference wgridder vis2im with vis≡1; PSF peak
    normalizes to 1 at the phase centre)."""
    import pandas as _pd

    vis = tpch_ms.vis_table(spark, sf_dir).withColumn(
        "vis_re", F.lit(1.0)
    ).withColumn("vis_im", F.lit(0.0))
    img, wsum = fft_op.dirty_image(vis, nx=32, ny=32)
    ys, xs = [], []
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            ys.append(y), xs.append(x)
    pdf = _pd.DataFrame(
        {"y": ys, "x": xs, "value": [round(float(img[y, x]), 6) for y, x in zip(ys, xs)]}
    )
    return spark.createDataFrame(pdf)


_PSF_FIT_ORACLE = f"""
  WITH px AS (SELECT y, x, value FROM ({_FFT_PSF_ORACLE})),
  peak AS (SELECT y AS py, x AS qx FROM px ORDER BY abs(value) DESC, y, x LIMIT 1),
  q AS (SELECT y, x, CAST(ROUND(abs(value) * 1000000) AS BIGINT) AS wq, value FROM px),
  s AS (
    SELECT CAST(SUM(q.wq) AS BIGINT) AS a,
           CAST(SUM(q.wq * (q.y - pk.py) * (q.y - pk.py)) AS BIGINT) AS mu,
           CAST(SUM(q.wq * (q.x - pk.qx) * (q.x - pk.qx)) AS BIGINT) AS mv
    FROM q, peak pk
  )
  SELECT (SELECT round(px.value, 6) FROM px, peak pk
          WHERE px.y = pk.py AND px.x = pk.qx) AS amp,
         round(sqrt(CAST(mu AS DOUBLE) / a), 6) AS sigma_u,
         round(sqrt(CAST(mv AS DOUBLE) / a), 6) AS sigma_v
  FROM s
"""


@register("psf_gaussian_fit", _PSF_FIT_ORACLE)
def psf_gaussian_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean-beam (restoring beam) fit from the PSF second moments —
    the restore-prep step of Hogbom CLEAN (reference
    deconv/hogbom/clean.py:40-72). Weights are quantized (1e-6) over the
    6dp-rounded PSF pixels so both engines sum identical integers; the
    peak tie-break is (|value| desc, y, x)."""
    import pandas as _pd

    vis = tpch_ms.vis_table(spark, sf_dir).withColumn(
        "vis_re", F.lit(1.0)
    ).withColumn("vis_im", F.lit(0.0))
    img, _ = fft_op.dirty_image(vis, nx=32, ny=32)
    p = [
        (y, x, round(float(img[y, x]), 6))
        for y in range(img.shape[0])
        for x in range(img.shape[1])
    ]
    # peak tie-break: |value| desc, then smallest y, x (matches the oracle)
    py, qx, amp = sorted(p, key=lambda t: (-abs(t[2]), t[0], t[1]))[0]
    wq = [(y, x, int(round(abs(v) * 1000000))) for y, x, v in p]
    a = sum(w for _, _, w in wq)
    mu = sum(w * (y - py) ** 2 for y, _, w in wq)
    mv = sum(w * (x - qx) ** 2 for _, x, w in wq)
    pdf = _pd.DataFrame(
        {
            "amp": [round(amp, 6)],
            "sigma_u": [round((mu / a) ** 0.5, 6)],
            "sigma_v": [round((mv / a) ** 0.5, 6)],
        }
    )
    return spark.createDataFrame(pdf)


_UVDIST_PROFILE_ORACLE = _with_ms(
    """
    SELECT CAST(FLOOR(sqrt(u*u + v*v) / 10.0) AS BIGINT) AS bin,
           COUNT(*) AS n_rows,
           round((SUM(CAST(ROUND(sqrt(vis_re*vis_re + vis_im*vis_im) * 1000000)
                           AS BIGINT)) / 1000000.0) / COUNT(*), 9) AS mean_amp
    FROM vis GROUP BY 1 ORDER BY bin
    """
)


@register("uvdist_radial_profile", _UVDIST_PROFILE_ORACLE)
def uvdist_radial_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radial uv-distance amplitude profile (10-wavelength bins): row
    counts + mean |V| per annulus — the source-structure quick-look
    (resolved sources decline with uv distance). sqrt/floor/division are
    IEEE-exact on identical doubles; the amplitude mean is a 1e6
    fixed-point reduction. One partial-agg shuffle at bin cardinality."""
    from codex_africanus_spark.functions.deterministic import qsum

    vis = tpch_ms.vis_table(spark, sf_dir)
    amp = F.sqrt(F.col("vis_re") * F.col("vis_re") + F.col("vis_im") * F.col("vis_im"))
    binc = F.floor(F.sqrt(F.col("u") * F.col("u") + F.col("v") * F.col("v")) / 10.0)
    return (
        vis.groupBy(binc.cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (qsum(amp, 1e6)).alias("amp_q"),
        )
        .select(
            "bin", "n_rows",
            F.round((F.col("amp_q") / F.lit(1000000.0)) / F.col("n_rows"), 9).alias(
                "mean_amp"
            ),
        )
        .orderBy("bin")
    )


_WSTACK_OCCUPANCY_ORACLE = _with_ms(
    """
    , planes AS (
      SELECT CAST(ROUND(w / 2.0) AS BIGINT) AS w_plane,
             ((CAST(ROUND(u / 10.0) AS BIGINT) % 32) + 32) % 32 AS u_cell,
             ((CAST(ROUND(v / 10.0) AS BIGINT) % 32) + 32) % 32 AS v_cell,
             weight
      FROM vis WHERE NOT (flag OR flag_row)
    ), cells AS (
      SELECT w_plane, u_cell, v_cell, COUNT(*) AS n_rows,
             SUM(CAST(ROUND(weight * 1000000) AS BIGINT)) AS wq
      FROM planes GROUP BY 1, 2, 3
    )
    SELECT w_plane, COUNT(*) AS n_cells, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           round(CAST(SUM(wq) AS DOUBLE) / 1000000.0, 6) AS weight_sum
    FROM cells GROUP BY w_plane ORDER BY w_plane
    """
)


@register("wstack_plane_occupancy", _WSTACK_OCCUPANCY_ORACLE)
def wstack_plane_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w-stacking workload report: rows, occupied cells, and weight per
    w-plane (the partition-sizing input for the wgridder plane loop —
    reference vis2im.py:16-130 picks nplanes from exactly this spread).
    Same grid quantization as the wstack imaging query; two partial
    aggs, cell then plane cardinality."""
    from codex_africanus_spark.functions.deterministic import qsum

    vis = tpch_ms.vis_table(spark, sf_dir).filter(
        ~(F.col("flag") | F.col("flag_row"))
    )
    cells = (
        vis.groupBy(
            F.round(F.col("w") / F.lit(2.0)).cast("long").alias("w_plane"),
            F.pmod(F.round(F.col("u") / F.lit(10.0)).cast("long"), F.lit(32)).alias("u_cell"),
            F.pmod(F.round(F.col("v") / F.lit(10.0)).cast("long"), F.lit(32)).alias("v_cell"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"), qsum(F.col("weight"), 1e6).alias("wq"))
    )
    return (
        cells.groupBy("w_plane")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_rows").alias("n_rows"),
            F.round(F.sum("wq").cast("double") / F.lit(1000000.0), 6).alias("weight_sum"),
        )
        .orderBy("w_plane")
    )


_BRIGGS_SWEEP = (("m1", -1.0), ("r0", 0.0), ("p1", 1.0))


def _briggs_sweep_oracle() -> str:
    parts = []
    for tag, robust in _BRIGGS_SWEEP:
        f2 = repr((5.0 * (10.0 ** (-robust))) ** 2)
        parts.append(
            f"round(g.weight / (1.0 + (c.wq / 100.0) * ({f2} * (t.sum_wq / 100.0)"
            f" / (t.sum_wq2 / 10000.0))), 9) AS w_{tag}"
        )
    sel = ",\n             ".join(parts)
    aggs = []
    for tag, _ in _BRIGGS_SWEEP:
        # w' carries 9 decimals => the 1e9 sum grid is exact; w'^2 needs
        # the finer 1e12 grid or strong-robust settings quantize to zero
        # (whose neff division then dies under ANSI)
        s = f"(SUM(CAST(ROUND(w_{tag} * 1000000000) AS BIGINT)) / 1000000000.0)"
        s2 = f"(SUM(CAST(ROUND((w_{tag} * w_{tag}) * 1000000000000) AS BIGINT)) / 1000000000000.0)"
        aggs.append(f"round({s}, 6) AS wsum_{tag}")
        aggs.append(
            f"CASE WHEN {s2} <> 0.0 THEN round(({s} * {s}) / {s2}, 6) END AS neff_{tag}"
        )
    return _with_ms(
        f"""
        , gated AS (
          SELECT row_id, weight,
                 CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
                 CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell
          FROM vis WHERE NOT (flag OR flag_row)
        ), cellw AS (
          SELECT u_cell, v_cell, SUM(CAST(ROUND(weight * 100) AS BIGINT)) AS wq
          FROM gated GROUP BY u_cell, v_cell
        ), totals AS (SELECT SUM(wq) AS sum_wq, SUM(wq * wq) AS sum_wq2 FROM cellw)
        , wts AS (
          SELECT {sel}
          FROM gated g
          JOIN cellw c ON g.u_cell = c.u_cell AND g.v_cell = c.v_cell
          CROSS JOIN totals t
        )
        SELECT {", ".join(aggs)} FROM wts
        """
    )


@register("briggs_robust_sweep", _briggs_sweep_oracle())
def briggs_robust_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Briggs robust-parameter sensitivity sweep (robust = −1, 0, +1 in
    ONE pass): total imaging weight and effective visibility count
    (Σw')²/Σw'² per setting — the uniform↔natural trade-off curve an
    imager reads before picking robust. The cell-weight table and its
    totals are computed once; the three settings differ only in a
    constant, so they ride the same broadcast join as projections."""
    from codex_africanus_spark.functions.deterministic import qsum

    vis = tpch_ms.vis_table(spark, sf_dir)
    gated = vis.filter(~(F.col("flag") | F.col("flag_row"))).select(
        "row_id", "weight",
        F.floor(F.col("u") / 10.0).cast("long").alias("u_cell"),
        F.floor(F.col("v") / 10.0).cast("long").alias("v_cell"),
    )
    # materialize the cell-cardinality table once: it feeds BOTH the
    # totals reduction and the broadcast join-back — without it each
    # consumer re-scans the fact table. localCheckpoint, not persist():
    # cache entries outlive the query (session leak — r8 advice);
    # checkpoint blocks free when this frame is GC'd.
    cellw = gated.groupBy("u_cell", "v_cell").agg(
        qsum(F.col("weight"), 100.0).alias("wq")
    ).localCheckpoint(eager=True)
    totals = cellw.agg(
        F.sum("wq").alias("sum_wq"),
        F.sum(F.col("wq") * F.col("wq")).alias("sum_wq2"),
    )
    j = gated.join(F.broadcast(cellw), ["u_cell", "v_cell"]).crossJoin(
        F.broadcast(totals)
    )
    wcols = []
    for tag, robust in _BRIGGS_SWEEP:
        f2_num = (5.0 * (10.0 ** (-robust))) ** 2
        f2 = F.lit(f2_num) * (F.col("sum_wq") / 100.0) / (F.col("sum_wq2") / 10000.0)
        wcols.append(
            F.round(
                F.col("weight") / (F.lit(1.0) + (F.col("wq") / 100.0) * f2), 9
            ).alias(f"w_{tag}")
        )
    wts = j.select(*wcols)
    aggs, outs = [], []
    for tag, _ in _BRIGGS_SWEEP:
        aggs.append((qsum(F.col(f"w_{tag}"), 1e9) / F.lit(1e9)).alias(f"s_{tag}"))
        aggs.append(
            (qsum(F.col(f"w_{tag}") * F.col(f"w_{tag}"), 1e12) / F.lit(1e12)).alias(
                f"s2_{tag}"
            )
        )
        outs.append(F.round(F.col(f"s_{tag}"), 6).alias(f"wsum_{tag}"))
        outs.append(
            F.when(
                F.col(f"s2_{tag}") != 0.0,
                F.round(
                    (F.col(f"s_{tag}") * F.col(f"s_{tag}")) / F.col(f"s2_{tag}"), 6
                ),
            ).alias(f"neff_{tag}")
        )
    return wts.agg(*aggs).select(*outs)


# The per-antenna pointing model — ONE definition each side (four copies
# would drift exactly the way the _beam_lg docstring warns about):
# l_eff = l·(1 + a/100) + (a−3)·0.002,  m_eff = m·(1 + a/100) + ((3a)%7−3)·0.0015
_POINTING_PAIRS_SQL = f"""
          SELECT s.source_id, a.antenna, c.chan,
                 s.l * (CAST(1.0 AS DOUBLE) + a.antenna * CAST(0.01 AS DOUBLE))
                   + (a.antenna - 3) * CAST(0.002 AS DOUBLE) AS l,
                 s.m * (CAST(1.0 AS DOUBLE) + a.antenna * CAST(0.01 AS DOUBLE))
                   + ((a.antenna * 3) % 7 - 3) * CAST(0.0015 AS DOUBLE) AS m,
                 856000000.0 * (1 + c.chan / 8.0) AS freq
          FROM src s, ant a, chan c
        """


def _pointing_beam_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_id, antenna, chan, bg): the trilinearly-sampled
    per-antenna displaced/scaled beam, rounded to the shared 9dp grid —
    the Spark twin of _POINTING_PAIRS_SQL, consumed by both
    beam_pointing_error_sampling and beam_dde_full_predict."""
    src = tpch_ms.source_table(spark, sf_dir)
    ants = tpch_ms.antenna_table(spark).select("antenna")
    chan = spark.range(7).select(F.col("id").cast("int").alias("chan"))
    scale = F.lit(1.0) + F.col("antenna") * F.lit(0.01)
    dl = (F.col("antenna") - 3) * F.lit(0.002)
    dm = ((F.col("antenna") * 3) % 7 - 3) * F.lit(0.0015)
    pairs = src.crossJoin(ants).crossJoin(chan).select(
        "source_id", "antenna", "chan",
        (F.col("l") * scale + dl).alias("l"),
        (F.col("m") * scale + dm).alias("m"),
        (F.lit(tpch_ms.REF_FREQ) * (1 + F.col("chan") / F.lit(8.0))).alias(
            "frequency"
        ),
    )
    return beam_op.beam_cube_dde(pairs, beam_op.make_test_beam_cube()).select(
        "source_id", "antenna", "chan",
        F.round(F.col("beam_gain"), 9).alias("bg"),
    )


def _beam_pointing_oracle() -> str:
    """Pointing-error/antenna-scaling beam oracle: the shared trilinear
    machinery over per-(source, ANTENNA, chan) effective (l, m) —
    l·scale_a + δl_a with deterministic per-antenna offsets (all within
    the grid interior, so no clamp edge cases)."""
    return _with_ms(
        f"""
        , ant AS ({tpch_ms.ANTENNA_SQL})
        {_beam_gain_ctes(_POINTING_PAIRS_SQL)}
        SELECT source_id, antenna, chan,
               round({_beam_trilinear_total()}, 9) AS beam_gain
        FROM wts ORDER BY source_id, antenna, chan
        """
    )


@register("beam_pointing_error_sampling", _beam_pointing_oracle())
def beam_pointing_error_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ANTENNA beam sampling with pointing errors and antenna
    scaling — the full signature of the reference's beam_cube_dde
    (fast_beam_cubes.py:58-301 takes point_errors [time, ant, chan, 2]
    and antenna_scaling [ant, chan, 2]; here deterministic per-antenna
    δl/δm offsets and a per-antenna dish-size scale): each antenna sees
    the source through its OWN displaced, scaled beam. The sampled
    frame stays (n_src × n_ant × n_chan) — tiny broadcast side at any
    fact-table scale."""
    return _pointing_beam_table(spark, sf_dir).select(
        "source_id", "antenna", "chan",
        F.col("bg").alias("beam_gain"),
    ).orderBy("source_id", "antenna", "chan")


def _beam_dde_full_predict_oracle() -> str:
    """Full per-antenna beam DDE predict mirror: the pointing-error beam
    CTE (per source, antenna, chan) joined into the coherency once per
    baseline END, then the 1e-6 fixed-point source reduction."""
    return _with_ms(
        f"""
        , ant AS ({tpch_ms.ANTENNA_SQL})
        {_beam_gain_ctes(_POINTING_PAIRS_SQL)}
        , beamg AS (
          SELECT source_id, antenna, chan,
                 round({_beam_trilinear_total()}, 9) AS bg
          FROM wts
        ), coh AS (
          SELECT v.row_id, v.antenna1, v.antenna2, v.chan,
                 ((b1.bg * b2.bg) * (s.flux_i + s.flux_q)) AS fxx,
                 ((b1.bg * b2.bg) * (s.flux_i - s.flux_q)) AS fyy,
                 -2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency AS theta
          FROM vis v
          JOIN beamg b1 ON b1.chan = v.chan AND b1.antenna = v.antenna1
          JOIN beamg b2 ON b2.chan = v.chan AND b2.antenna = v.antenna2
                       AND b2.source_id = b1.source_id
          JOIN src s ON s.source_id = b1.source_id
        )
        SELECT row_id, antenna1, antenna2, chan,
               SUM(CAST(ROUND(fxx * cos(theta) * 1000000) AS BIGINT)) / 1000000.0 AS xx_re,
               SUM(CAST(ROUND(fxx * sin(theta) * 1000000) AS BIGINT)) / 1000000.0 AS xx_im,
               SUM(CAST(ROUND(fyy * cos(theta) * 1000000) AS BIGINT)) / 1000000.0 AS yy_re,
               SUM(CAST(ROUND(fyy * sin(theta) * 1000000) AS BIGINT)) / 1000000.0 AS yy_im
        FROM coh
        GROUP BY row_id, antenna1, antenna2, chan
        """
    )


@register("beam_dde_full_predict", _beam_dde_full_predict_oracle())
def beam_dde_full_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL beam-DDE predict semantics (predict.py:86-150
    dde arguments + fast_beam_cubes.py:58-301): each baseline end applies
    its OWN antenna's displaced, scaled beam — E_p·B·E_qᴴ with real
    scalar E per (source, antenna, chan), over the I,Q-subset XX/YY
    brightness and the fixed-point source reduction.

    Plan: the (src × ant × chan) beam table (1225 rows) is sampled once
    by the pandas UDF and broadcast-joined TWICE into the fact expansion
    (antenna1 and antenna2 ends) — the per-antenna generalization of
    beam_stokes_dde_predict at zero extra fact-side cost."""
    from codex_africanus_spark.functions.stokes import convert_general
    from codex_africanus_spark.sources.tables import fan_out

    src = tpch_ms.source_table(spark, sf_dir)
    bg = _pointing_beam_table(spark, sf_dir)
    corrs = convert_general(
        {"I": F.col("flux_i"), "Q": F.col("flux_q")}, ["XX", "YY"]
    )
    src_corr = src.select(
        "source_id", "l", "m", "n",
        corrs["XX"].re.alias("xx"), corrs["YY"].re.alias("yy"),
    )
    b1 = bg.select(
        "source_id", F.col("antenna").alias("antenna1"),
        "chan", F.col("bg").alias("bg1"),
    )
    b2 = bg.select(
        "source_id", F.col("antenna").alias("antenna2"),
        "chan", F.col("bg").alias("bg2"),
    )
    vis = tpch_ms.vis_table(spark, sf_dir)
    j = (
        fan_out(vis)
        .join(F.broadcast(b1), ["antenna1", "chan"])
        .join(F.broadcast(b2), ["antenna2", "chan", "source_id"])
        .join(F.broadcast(src_corr), "source_id")
    )
    theta = phase_delay_angle(
        phase_path(F.col("u"), F.col("v"), F.col("w"),
                   F.col("l"), F.col("m"), F.col("n")),
        F.col("frequency"),
    )
    fxx = (F.col("bg1") * F.col("bg2")) * F.col("xx")
    fyy = (F.col("bg1") * F.col("bg2")) * F.col("yy")
    coh = j.select(
        "row_id", "antenna1", "antenna2", "chan",
        (fxx * F.cos(theta)).alias("cxx_re"),
        (fxx * F.sin(theta)).alias("cxx_im"),
        (fyy * F.cos(theta)).alias("cyy_re"),
        (fyy * F.sin(theta)).alias("cyy_im"),
    )
    return coh.groupBy("row_id", "antenna1", "antenna2", "chan").agg(
        (qsum(F.col("cxx_re"), 1e6) / F.lit(1e6)).alias("xx_re"),
        (qsum(F.col("cxx_im"), 1e6) / F.lit(1e6)).alias("xx_im"),
        (qsum(F.col("cyy_re"), 1e6) / F.lit(1e6)).alias("yy_re"),
        (qsum(F.col("cyy_im"), 1e6) / F.lit(1e6)).alias("yy_im"),
    )


_FW_NF = 4        # facets


_FW_CELL = 10.0   # uv cell (wstack grid convention)


_FW_WSTEP = 3.0   # w-projection support growth step


_FW_SMAX = 4      # support cap


def _facet_wproj_oracle() -> str:
    from codex_africanus_spark.functions.uvw import uvw_rotate_sql

    args = (
        "v.u", "v.v", "v.w", "0.0", "((-17) / 25.0)",
        "f.ra_f", "f.dec_f",
    )
    ru, rv, rw = uvw_rotate_sql(*args)
    return _with_ms(
        f"""
        , facets AS (
          SELECT CAST(r.range AS BIGINT) AS facet_id,
                 (r.range - 1.5) / 50.0 AS ra_f,
                 ((-17) / 25.0) + ((r.range % 2) - 0.5) / 40.0 AS dec_f
          FROM range({_FW_NF}) r
        ),
        rot AS (
          SELECT f.facet_id,
                 round({ru}, 6) AS u_r,
                 round({rv}, 6) AS v_r,
                 round({rw}, 6) AS w_r,
                 v.weight
          FROM vis v, facets f
          WHERE NOT (v.flag OR v.flag_row)
        ),
        cells AS (
          SELECT facet_id,
                 LEAST({_FW_SMAX}, 1 + CAST(FLOOR(ABS(w_r) / {_FW_WSTEP!r}) AS BIGINT)) AS support,
                 CAST(FLOOR(u_r / {_FW_CELL!r}) AS BIGINT) AS u_cell,
                 CAST(FLOOR(v_r / {_FW_CELL!r}) AS BIGINT) AS v_cell,
                 COUNT(*) AS n_rows,
                 SUM(CAST(ROUND(weight * 1000000) AS BIGINT)) AS wq
          FROM rot GROUP BY 1, 2, 3, 4
        )
        SELECT facet_id, support,
               CAST(SUM(n_rows) AS BIGINT) AS n_rows,
               COUNT(*) AS n_cells,
               CAST(SUM(n_rows) * (2 * support + 1) * (2 * support + 1) AS BIGINT)
                 AS n_kernel_visits,
               round(SUM(wq) / 1000000.0, 6) AS weight_sum
        FROM cells GROUP BY facet_id, support
        ORDER BY facet_id, support
        """
    )


@register("facet_wproj_kernel_sweep", _facet_wproj_oracle())
def facet_wproj_kernel_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceting × W-projection workload sweep — the planning query an
    imaging pipeline runs before gridding: every visibility is rotated
    into each facet's tangent frame (perleypolyhedron
    baseline_transform_policies uvw_rotate), assigned the w-dependent
    kernel support level a W-projection gridder would use (support
    grows with |w'| — the defining W-projection cost driver), and the
    per-(facet, support) workload is reported as rows, occupied cells,
    kernel-tap visits (rows × (2s+1)²) and weight. Pairs the facet
    geometry with the gridder policies (r6 verdict suggestion).

    Plan: broadcast 4-row facet table (×NF fact expansion rides the
    scan), rotation trig in codegen quantized at 1e-6, then the
    wstack-style two-stage agg (cell cardinality, then facet×support).
    At 100 TB: shuffle volume is O(#occupied cells), never O(rows)."""
    from codex_africanus_spark.functions.deterministic import qsum
    from codex_africanus_spark.functions.uvw import uvw_rotate
    from codex_africanus_spark.sources.tables import fan_out

    vis = tpch_ms.vis_table(spark, sf_dir).filter(
        ~(F.col("flag") | F.col("flag_row"))
    )
    facets = spark.range(_FW_NF).select(
        F.col("id").cast("long").alias("facet_id"),
        ((F.col("id") - 1.5) / F.lit(50.0)).alias("ra_f"),
        (
            F.lit(-17) / F.lit(25.0)
            + ((F.col("id") % 2) - 0.5) / F.lit(40.0)
        ).alias("dec_f"),
    )
    j = fan_out(vis).crossJoin(F.broadcast(facets))
    ru, rv, rw = uvw_rotate(
        F.col("u"), F.col("v"), F.col("w"),
        F.lit(0.0), F.lit(-17) / F.lit(25.0),
        F.col("ra_f"), F.col("dec_f"),
    )
    rot = j.select(
        "facet_id",
        F.round(ru, 6).alias("u_r"),
        F.round(rv, 6).alias("v_r"),
        F.round(rw, 6).alias("w_r"),
        "weight",
    )
    cells = rot.groupBy(
        "facet_id",
        F.least(
            F.lit(_FW_SMAX),
            F.lit(1) + F.floor(F.abs(F.col("w_r")) / F.lit(_FW_WSTEP)),
        ).alias("support"),
        F.floor(F.col("u_r") / F.lit(_FW_CELL)).cast("long").alias("u_cell"),
        F.floor(F.col("v_r") / F.lit(_FW_CELL)).cast("long").alias("v_cell"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        qsum(F.col("weight"), 1e6).alias("wq"),
    )
    return (
        cells.groupBy("facet_id", "support")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum("wq").cast("double") / F.lit(1000000.0), 6).alias(
                "weight_sum"
            ),
        )
        .select(
            "facet_id",
            "support",
            "n_rows",
            "n_cells",
            (
                F.col("n_rows") * (2 * F.col("support") + 1)
                * (2 * F.col("support") + 1)
            ).alias("n_kernel_visits"),
            "weight_sum",
        )
        .orderBy("facet_id", "support")
    )


_BEAM_GRID_PAIRS = """
          SELECT i.range AS gi, j.range AS gj,
                 (i.range - 8) / 100.0 AS l,
                 (j.range - 8) / 100.0 AS m,
                 856000000.0 AS freq
          FROM range(17) i, range(17) j
        """


def _beam_map_oracle() -> str:
    return _with_ms(
        f"""{_beam_gain_ctes(_BEAM_GRID_PAIRS)}
        SELECT gi, gj, l, m, round({_beam_trilinear_total()}, 9) AS beam_gain
        FROM wts ORDER BY gi, gj
        """
    )


@register("primary_beam_attenuation_map", _beam_map_oracle())
def primary_beam_attenuation_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-beam attenuation MAP: the beam cube sampled on a regular
    17×17 (l, m) grid at the reference frequency — the mosaic-planning /
    image-correction product (pbcor), as opposed to the per-source
    sampling query. Same broadcast cube + Arrow UDF sampler and the
    same shared trilinear oracle CTEs (one arithmetic definition), just
    a generated grid instead of the catalogue — the grid frame is 289
    rows, so the whole query is sampler-bound."""
    gi = spark.range(17).select(F.col("id").alias("gi"))
    gj = spark.range(17).select(F.col("id").alias("gj"))
    pairs = gi.crossJoin(gj).select(
        "gi", "gj",
        ((F.col("gi") - 8) / F.lit(100.0)).alias("l"),
        ((F.col("gj") - 8) / F.lit(100.0)).alias("m"),
        F.lit(856000000.0).alias("frequency"),
    )
    out = beam_op.beam_cube_dde(pairs, beam_op.make_test_beam_cube())
    return out.select(
        "gi", "gj", "l", "m", F.round(F.col("beam_gain"), 9).alias("beam_gain")
    ).orderBy("gi", "gj")


@register("spectral_regrid_linear", _with_ms(cal_op.REGRID_SQL))
def spectral_regrid_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASA cvel/mstransform spectral regridding: each (time, baseline)
    spectrum resampled onto a quarter-channel-offset target grid by
    linear interpolation between bracketing channels — the affine
    frequency axis turns the as-of bracket into closed-form arithmetic,
    and the dyadic frac makes the integer lerp exact (4x-scaled BIGINT
    outputs, no float at all)."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    return cal_op.spectral_regrid_linear(vis).orderBy(
        "time", "antenna1", "antenna2", "tbin_out"
    )


_ANNULUS_W = 20.0  # uv-distance annulus width


_UV_NOISE_PROFILE_ORACLE = _with_ms(
    f"""
    , spq AS (
      SELECT time, antenna1, antenna2, chan,
             SUM(CAST(ROUND(vis_re * 1000000.0) AS BIGINT)) AS re_q,
             SUM(CAST(ROUND(vis_im * 1000000.0) AS BIGINT)) AS im_q,
             MIN(CAST(ROUND(u * 1000000.0) AS BIGINT)) AS uq,
             MIN(CAST(ROUND(v * 1000000.0) AS BIGINT)) AS vq
      FROM vis GROUP BY 1, 2, 3, 4
    ),
    diffs AS (
      SELECT CAST(FLOOR(sqrt(CAST(uq AS DOUBLE) * uq + CAST(vq AS DOUBLE) * vq)
                        / 1000000.0 / {_ANNULUS_W!r}) AS BIGINT) AS annulus,
             re_q - lag(re_q) OVER w AS dr,
             im_q - lag(im_q) OVER w AS di
      FROM spq
      WINDOW w AS (PARTITION BY time, antenna1, antenna2 ORDER BY chan)
    )
    SELECT annulus, CAST(COUNT(*) AS BIGINT) AS n_diffs,
           CAST(ROUND(CAST(SUM(CAST(dr AS HUGEINT) * dr
                               + CAST(di AS HUGEINT) * di) AS DOUBLE)
                      / (4 * COUNT(*)) / 1000000000000.0
                      * 1000000.0) AS BIGINT) AS sigma2_micro
    FROM diffs WHERE dr IS NOT NULL
    GROUP BY annulus ORDER BY annulus
    """
)


@register("uv_annulus_noise_profile", _UV_NOISE_PROFILE_ORACLE)
def uv_annulus_noise_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radial noise profile: the adjacent-channel-difference noise
    estimator binned by uv-distance annulus — short spacings catching
    extended emission / RFI read hotter than the thermal floor, which
    is exactly what this plot exposes. The spectra collapse carries a
    deterministic representative (component-wise MIN) uv per
    (time, baseline, chan) — the uvw-closure representative rule —
    so the annulus key is engine-exact; squared diffs accumulate in
    decimal(38,0)."""
    from codex_africanus_spark.functions.deterministic import quantize

    dec = "decimal(38,0)"
    vis = tpch_ms.vis_table(spark, sf_dir)
    sp = vis.groupBy("time", "antenna1", "antenna2", "chan").agg(
        F.sum(quantize(F.col("vis_re"), 1e6)).alias("re_q"),
        F.sum(quantize(F.col("vis_im"), 1e6)).alias("im_q"),
        F.min(quantize(F.col("u"), 1e6)).alias("uq"),
        F.min(quantize(F.col("v"), 1e6)).alias("vq"),
    )
    w = W.partitionBy("time", "antenna1", "antenna2").orderBy("chan")
    annulus = F.floor(
        F.sqrt(
            F.col("uq").cast("double") * F.col("uq")
            + F.col("vq").cast("double") * F.col("vq")
        )
        / F.lit(1e6)
        / F.lit(_ANNULUS_W)
    ).cast("long")
    diffs = sp.select(
        annulus.alias("annulus"),
        (F.col("re_q") - F.lag("re_q").over(w)).alias("dr"),
        (F.col("im_q") - F.lag("im_q").over(w)).alias("di"),
    ).filter(F.col("dr").isNotNull())
    g = diffs.groupBy("annulus").agg(
        F.count(F.lit(1)).alias("n_diffs"),
        F.sum(
            F.col("dr").cast(dec) * F.col("dr")
            + F.col("di").cast(dec) * F.col("di")
        ).alias("ss"),
    )
    return g.select(
        "annulus", "n_diffs",
        quantize(
            F.col("ss").cast("double") / (F.lit(4) * F.col("n_diffs"))
            / F.lit(1e12),
            1e6,
        ).alias("sigma2_micro"),
    ).orderBy("annulus")


# Gaussian uv-taper factors exp(-mid_k^2 / (2*50^2)) at annulus midpoints
# mid_k = (k+0.5)*10, precomputed in Python (ppb integers) and interpolated
# into BOTH engines — no exp() ever runs inside either engine.
_TAPER_PPB = [
    995012479, 955997482, 882496903, 782704538, 666976811,
    546074427, 429557358, 324652467, 235746077, 164474457,
    110250525, 71005354, 43936934, 26121410, 14920786,
]


_TAPER_CASE = (
    "CASE annulus "
    + " ".join(f"WHEN {k} THEN {v}" for k, v in enumerate(_TAPER_PPB))
    + " ELSE 0 END"
)


_UV_TAPER_ORACLE = _with_ms(
    f"""
    , samp AS (
      SELECT CAST(FLOOR(sqrt(u*u + v*v) / 10.0) AS BIGINT) AS annulus,
             CAST(weight AS BIGINT) AS w
      FROM vis WHERE NOT (flag OR flag_row)
    ),
    tapered AS (
      SELECT annulus, w, w * {_TAPER_CASE.replace("annulus", "samp.annulus")} AS wt_ppb
      FROM samp
    )
    SELECT annulus, COUNT(*) AS n_samples,
           CAST(SUM(w) AS BIGINT) AS w_nat_sum,
           CAST(SUM(wt_ppb) AS BIGINT) AS w_tap_ppb_sum,
           CAST(SUM(CAST(wt_ppb AS HUGEINT) * wt_ppb) // 1000000000 AS BIGINT)
             AS w_tap_sq_e9,
           {_TAPER_CASE.replace("annulus", "tapered.annulus")} AS taper_ppb
    FROM tapered GROUP BY annulus ORDER BY annulus
    """
)


@register("uv_taper_response", _UV_TAPER_ORACLE)
def uv_taper_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian uv-taper response audit: per uv-annulus natural vs
    tapered imaging weight (the resolution-vs-sensitivity trade every
    imaging run tunes; cf. the density-grid weighting family,
    briggs_robust_weights). The taper factors are Python-precomputed ppb
    literals at annulus midpoints, so no transcendental runs in either
    engine; w^2 sums form in DECIMAL(38,0) (they overflow int64).
    Map-side partial agg onto <=15 annuli — scan-resident at 100 TB."""
    vis = tpch_ms.vis_table(spark, sf_dir).filter(~(F.col("flag") | F.col("flag_row")))
    ann = F.floor(F.sqrt(F.col("u") * F.col("u") + F.col("v") * F.col("v")) / F.lit(10.0)).cast("long")
    d = vis.select(ann.alias("annulus"), F.col("weight").cast("long").alias("w"))
    expr = "CASE annulus " + " ".join(
        f"WHEN {k} THEN {v}" for k, v in enumerate(_TAPER_PPB)
    ) + " ELSE 0 END"
    d = d.select("annulus", "w", (F.col("w") * F.expr(expr)).alias("wt_ppb"))
    return (
        d.groupBy("annulus")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("w").alias("w_nat_sum"),
            F.sum("wt_ppb").alias("w_tap_ppb_sum"),
            # accumulate in decimal(38,0) (squares overflow int64), then
            # emit DIV 1e9 as exact BIGINT — a decimal->double cast here
            # forks 1 ULP between Java BigDecimal and DuckDB HUGEINT
            # rounding (found by the sf0.1 sweep)
            F.expr(
                "CAST(SUM(CAST(wt_ppb AS DECIMAL(38,0)) * wt_ppb)"
                " DIV 1000000000 AS BIGINT)"
            ).alias("w_tap_sq_e9"),
        )
        .select(
            "annulus", "n_samples", "w_nat_sum", "w_tap_ppb_sum", "w_tap_sq_e9",
            F.expr(expr).alias("taper_ppb"),
        )
        .orderBy("annulus")
    )


# Algebraic primary-beam model (1 - r^2/R^2)^2 clamped at 0 — polynomial,
# so both engines evaluate identical doubles (no exp/cos in-engine); R
# chosen so the outermost catalogue sources fall below the pbcor cutoff.
_PB_R2 = 0.06 * 0.06


_PB_CUTOFF = 0.04


_PBCOR_ORACLE = _with_ms(
    f"""
    , gated AS (SELECT * FROM vis WHERE NOT (flag OR flag_row)),
    img AS (
      SELECT s.source_id AS source_id, v.chan AS chan,
             SUM(CAST(ROUND((cos(2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * v.vis_re
                           - sin(2.0958450219516816e-08 * (v.u*s.l + v.v*s.m + v.w*(s.n-1.0)) * v.frequency) * v.vis_im)
                      * 1000000) AS BIGINT)) / 1000000.0 AS image
      FROM gated v, src s
      GROUP BY s.source_id, v.chan
    ),
    beam AS (
      SELECT source_id,
             CASE WHEN 1.0 - (l*l + m*m) / {_PB_R2!r} > 0.0
                  THEN (1.0 - (l*l + m*m) / {_PB_R2!r})
                     * (1.0 - (l*l + m*m) / {_PB_R2!r})
                  ELSE 0.0 END AS bg
      FROM src
    )
    SELECT i.source_id AS source_id, i.chan AS chan, i.image AS image,
           CAST(ROUND(b.bg * 1000000000.0) AS BIGINT) AS beam_gain_q9,
           CASE WHEN b.bg >= {_PB_CUTOFF!r}
                THEN CAST(ROUND(i.image / b.bg * 1000000.0) AS BIGINT)
                ELSE NULL END AS pbcor_q6,
           CASE WHEN b.bg >= {_PB_CUTOFF!r} THEN 0 ELSE 1 END AS masked
    FROM img i JOIN beam b ON b.source_id = i.source_id
    ORDER BY source_id, chan
    """
)


@register("dft_image_pbcor", _PBCOR_ORACLE)
def dft_image_pbcor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-beam correction of the adjoint-DFT image (CASA pbcor):
    each (source, chan) image value divides by the beam gain at its
    (l, m), masked NULL below the standard pblimit-style cutoff — flux
    scales are only trustworthy inside the beam (the image-plane
    counterpart of the reference's beam sampling,
    rime/fast_beam_cubes.py:9-135). The beam model is the
    algebraic (1 - r^2/R^2)^2 taper (polynomial: bit-identical across
    engines), evaluated on the 25-row source dim and broadcast; the
    correction is a dimension-side join after the DFT reduction, so
    pbcor adds ZERO fact-table work at any scale."""
    from codex_africanus_spark.operators import dft as dft_op2

    vis = tpch_ms.vis_table(spark, sf_dir)
    src = tpch_ms.source_table(spark, sf_dir)
    img = dft_op2.vis_to_im(vis, src).select("source_id", "chan", "image")
    r2 = F.col("l") * F.col("l") + F.col("m") * F.col("m")
    raw = F.lit(1.0) - r2 / F.lit(_PB_R2)
    bg = F.when(raw > 0.0, raw * raw).otherwise(F.lit(0.0))
    beam = src.select("source_id", bg.alias("bg"))
    v6 = F.col("image") / F.col("bg") * F.lit(1e6)
    return (
        img.join(F.broadcast(beam), "source_id")
        .select(
            "source_id",
            "chan",
            "image",
            (F.col("bg") * F.lit(1e9) + F.lit(0.5)).cast("long").alias("beam_gain_q9"),
            F.when(
                F.col("bg") >= F.lit(_PB_CUTOFF),
                (v6 + F.when(v6 >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long"),
            ).alias("pbcor_q6"),
            F.when(F.col("bg") >= F.lit(_PB_CUTOFF), 0).otherwise(1).alias("masked"),
        )
        .orderBy("source_id", "chan")
    )


_MFS_ORACLE = _with_ms(
    """
    , g AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS cu,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS cv,
             chan / 8.0 AS x, vis_re, vis_im
      FROM vis WHERE NOT (flag OR flag_row)
    )
    SELECT cu, cv, COUNT(*) AS n_samples,
           CAST(SUM(CAST(ROUND(vis_re * 1000000.0) AS BIGINT)) AS BIGINT) AS t0_re_q,
           CAST(SUM(CAST(ROUND(vis_im * 1000000.0) AS BIGINT)) AS BIGINT) AS t0_im_q,
           CAST(SUM(CAST(ROUND(vis_re * x * 1000000.0) AS BIGINT)) AS BIGINT) AS t1_re_q,
           CAST(SUM(CAST(ROUND(vis_im * x * 1000000.0) AS BIGINT)) AS BIGINT) AS t1_im_q,
           CAST(SUM(CAST(ROUND(vis_re * x * x * 1000000.0) AS BIGINT)) AS BIGINT) AS t2_re_q,
           CAST(SUM(CAST(ROUND(vis_im * x * x * 1000000.0) AS BIGINT)) AS BIGINT) AS t2_im_q
    FROM g GROUP BY cu, cv ORDER BY cu, cv
    """
)


@register("mfs_taylor_term_grids", _MFS_ORACLE)
def mfs_taylor_term_grids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wideband MFS Taylor-term accumulation (wsclean -join-channels
    / CASA mtmfs shape): per uv cell, visibilities accumulate weighted
    by ((nu-nu0)/nu0)^t for t = 0, 1, 2 — the spectral moments the MFS
    deconvolver fits alpha/curvature from (the discrete moments of the
    reference's spectral model, model/spectral/spec_model.py:11-40, fit
    per uv cell instead of per source). x = chan/8 is exact dyadic
    and the powers are explicit multiplies (never pow()), so every term
    is engine-identical; six fixed-point sums in ONE partial-agg pass
    over the fact table onto <=441 cells."""
    from codex_africanus_spark.functions.deterministic import quantize

    vis = tpch_ms.vis_table(spark, sf_dir).filter(~(F.col("flag") | F.col("flag_row")))
    x = F.col("chan") / F.lit(8.0)
    g = vis.select(
        F.floor(F.col("u") / F.lit(10.0)).cast("long").alias("cu"),
        F.floor(F.col("v") / F.lit(10.0)).cast("long").alias("cv"),
        x.alias("x"),
        "vis_re",
        "vis_im",
    )
    return (
        g.groupBy("cu", "cv")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(quantize(F.col("vis_re"), 1e6)).alias("t0_re_q"),
            F.sum(quantize(F.col("vis_im"), 1e6)).alias("t0_im_q"),
            F.sum(quantize(F.col("vis_re") * F.col("x"), 1e6)).alias("t1_re_q"),
            F.sum(quantize(F.col("vis_im") * F.col("x"), 1e6)).alias("t1_im_q"),
            F.sum(quantize(F.col("vis_re") * F.col("x") * F.col("x"), 1e6)).alias("t2_re_q"),
            F.sum(quantize(F.col("vis_im") * F.col("x") * F.col("x"), 1e6)).alias("t2_im_q"),
        )
        .orderBy("cu", "cv")
    )


_MFS_ALPHA_ORACLE = _with_ms(
    """
    , g AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS cu,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS cv,
             chan / 8.0 AS x, vis_re
      FROM vis WHERE NOT (flag OR flag_row)
    ),
    cells AS (
      SELECT cu, cv,
             CAST(SUM(CAST(ROUND(vis_re * 1000000.0) AS BIGINT)) AS BIGINT) AS t0,
             CAST(SUM(CAST(ROUND(vis_re * x * 1000000.0) AS BIGINT)) AS BIGINT) AS t1
      FROM g GROUP BY cu, cv
    )
    SELECT cu, cv, t0 AS t0_re_q, t1 AS t1_re_q,
           CASE WHEN abs(t0) >= 1000000
                THEN CAST(ROUND(CAST(t1 AS DOUBLE) / CAST(t0 AS DOUBLE)
                                * 1000000.0) AS BIGINT)
                ELSE NULL END AS alpha_q6,
           CASE WHEN abs(t0) >= 1000000 THEN 0 ELSE 1 END AS masked
    FROM cells ORDER BY cu, cv
    """
)


@register("mfs_alpha_map", _MFS_ALPHA_ORACLE)
def mfs_alpha_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MFS spectral-index map (the mtmfs alpha product):
    per uv cell the Taylor-term ratio t1/t0 estimates the fractional
    spectral slope, masked where |t0| is below the reliability floor
    (the alpha-mask every wideband imager applies — dividing two noise
    values manufactures fake spectral indices). Ratio of two exact
    integers through one double division, quantized — engine-identical;
    the whole map is the MFS partial agg plus a projection."""
    from codex_africanus_spark.functions.deterministic import quantize

    vis = tpch_ms.vis_table(spark, sf_dir).filter(~(F.col("flag") | F.col("flag_row")))
    x = F.col("chan") / F.lit(8.0)
    cells = (
        vis.select(
            F.floor(F.col("u") / F.lit(10.0)).cast("long").alias("cu"),
            F.floor(F.col("v") / F.lit(10.0)).cast("long").alias("cv"),
            x.alias("x"),
            "vis_re",
        )
        .groupBy("cu", "cv")
        .agg(
            F.sum(quantize(F.col("vis_re"), 1e6)).alias("t0"),
            F.sum(quantize(F.col("vis_re") * F.col("x"), 1e6)).alias("t1"),
        )
    )
    ok = F.abs(F.col("t0")) >= 1000000
    return cells.select(
        "cu",
        "cv",
        F.col("t0").alias("t0_re_q"),
        F.col("t1").alias("t1_re_q"),
        F.when(
            ok,
            quantize(
                F.col("t1").cast("double") / F.col("t0").cast("double"), 1e6
            ),
        ).alias("alpha_q6"),
        F.when(ok, 0).otherwise(1).alias("masked"),
    ).orderBy("cu", "cv")
