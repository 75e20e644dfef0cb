"""Gridding-adjacent operators beyond the histogram accumulator
(queries.uv_grid_histogram): degridding, Briggs weighting, cell-size
estimation.

Parity targets: degridder /root/reference/africanus/gridding/
perleypolyhedron/degridder.py:78-176 (gather dual of the scatter-add
gridder), estimate_cell_size /root/reference/africanus/gridding/util.py:4-82.
The FFT (wgridder/ducc0) tier is out of scope in this container — its
Spark shape (mapInPandas → native lib → per-band image tree-sum) is
documented in SURVEY §2.4 and the plumbing matches operators/multimodal.py.

Scale notes: the grid is the *small* side (ny×nx cells ≪ rows); degridding
broadcasts it. Briggs weighting is the classic two-pass: per-cell weight
totals (one small aggregate) broadcast-joined back onto rows — no second
fact shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.functions.deterministic import qsum

CELL = 10.0


def _cells(df: DataFrame) -> DataFrame:
    return df.withColumn("u_cell", F.floor(F.col("u") / CELL).cast("long")).withColumn(
        "v_cell", F.floor(F.col("v") / CELL).cast("long")
    )


def grid_natural(vis: DataFrame) -> DataFrame:
    """Scatter-add accumulation (same as queries.uv_grid_histogram)."""
    return (
        _cells(vis.filter(~(F.col("flag") | F.col("flag_row"))))
        .groupBy("u_cell", "v_cell")
        .agg(
            F.count(F.lit(1)).alias("nvis"),
            qsum(F.col("vis_re") * F.col("weight"), 100.0).alias("grid_re_q"),
            qsum(F.col("vis_im") * F.col("weight"), 100.0).alias("grid_im_q"),
            qsum(F.col("weight"), 100.0).alias("wsum_q"),
        )
    )


def degrid(vis: DataFrame) -> DataFrame:
    """Gather dual: sample the (broadcast) grid back onto each row —
    nearest-cell kernel (the footprint generalization explodes each row
    into kernel cells first; same join shape)."""
    grid = grid_natural(vis)
    return (
        _cells(vis)
        .join(F.broadcast(grid), ["u_cell", "v_cell"], "left")
        .select(
            "row_id",
            "u_cell",
            "v_cell",
            (F.coalesce(F.col("grid_re_q"), F.lit(0)) / F.coalesce(F.col("wsum_q"), F.lit(100))).alias("degrid_re"),
            (F.coalesce(F.col("grid_im_q"), F.lit(0)) / F.coalesce(F.col("wsum_q"), F.lit(100))).alias("degrid_im"),
        )
    )


# Separable 3-tap triangle kernel: weights exactly representable doubles
# (the reference's conv-kernel policies, perleypolyhedron/policies/
# convolution_filters.py; any separable tap table drops in here)
KERNEL_1D = [(-1, 0.25), (0, 0.5), (1, 0.25)]


def grid_convolved(vis: DataFrame, kernel: list[tuple[int, float]] | None = None) -> DataFrame:
    """Kernel-footprint gridding (reference gridder.py:13-170): each
    visibility scatter-adds into its kernel footprint with separable
    weights (default: 3×3 triangle taps; any separable tap table from
    operators/gridding_kernels.taps_to_pairs drops in), then one
    histogram aggregate.

    The footprint is a generated-column explode — 9 literal (du, dv, w)
    structs per row, fused by codegen — so the operator is exactly the
    nearest-cell plan with a 9× row expansion before the same single
    shuffle. Exact: kernel weights are dyadic rationals, products
    quantized per tap."""
    k1d = KERNEL_1D if kernel is None else kernel
    taps = F.array(*[
        F.struct(F.lit(du).alias("du"), F.lit(dv).alias("dv"),
                 F.lit(wu * wv).alias("kw"))
        for du, wu in k1d for dv, wv in k1d
    ])
    g = (
        _cells(vis.filter(~(F.col("flag") | F.col("flag_row"))))
        .select("u_cell", "v_cell", "vis_re", "vis_im", "weight",
                F.explode(taps).alias("t"))
    )
    return (
        g.groupBy(
            (F.col("u_cell") + F.col("t.du")).alias("u_cell"),
            (F.col("v_cell") + F.col("t.dv")).alias("v_cell"),
        )
        .agg(
            F.count(F.lit(1)).alias("ntaps"),
            qsum(F.col("vis_re") * F.col("weight") * F.col("t.kw"), 100.0).alias("grid_re_q"),
            qsum(F.col("vis_im") * F.col("weight") * F.col("t.kw"), 100.0).alias("grid_im_q"),
            qsum(F.col("weight") * F.col("t.kw"), 100.0).alias("wsum_q"),
        )
    )


CONV_GRID_SQL = """
    , taps AS (
      SELECT * FROM (VALUES (-1, 0.25e0), (0, 0.5e0), (1, 0.25e0)) AS t1(d, w)
    ),
    footprint AS (
      SELECT tu.d AS du, tv.d AS dv, tu.w * tv.w AS kw FROM taps tu, taps tv
    ),
    gated AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell,
             vis_re, vis_im, weight
      FROM vis WHERE NOT (flag OR flag_row)
    )
    SELECT g.u_cell + f.du AS u_cell, g.v_cell + f.dv AS v_cell,
           COUNT(*) AS ntaps,
           CAST(SUM(CAST(ROUND(g.vis_re * g.weight * f.kw * 100) AS BIGINT)) AS BIGINT) AS grid_re_q,
           CAST(SUM(CAST(ROUND(g.vis_im * g.weight * f.kw * 100) AS BIGINT)) AS BIGINT) AS grid_im_q,
           CAST(SUM(CAST(ROUND(g.weight * f.kw * 100) AS BIGINT)) AS BIGINT) AS wsum_q
    FROM gated g, footprint f
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def degrid_convolved(
    vis: DataFrame, kernel: list[tuple[int, float]] | None = None
) -> DataFrame:
    """Kernel-footprint degridding (reference degridder.py:78-176, the
    gather dual): each row samples its footprint from the broadcast
    grid and combines taps with the same separable weights. Exact: the
    grid values are integer-derived; tap combination re-quantizes."""
    grid = grid_convolved(vis, kernel)
    k1d = KERNEL_1D if kernel is None else kernel
    taps = F.array(*[
        F.struct(F.lit(du).alias("du"), F.lit(dv).alias("dv"),
                 F.lit(wu * wv).alias("kw"))
        for du, wu in k1d for dv, wv in k1d
    ])
    rows = _cells(vis).select("row_id", "u_cell", "v_cell", F.explode(taps).alias("t"))
    joined = rows.join(
        F.broadcast(grid),
        (rows.u_cell + F.col("t.du") == grid.u_cell)
        & (rows.v_cell + F.col("t.dv") == grid.v_cell),
        "left",
    )
    val_re = F.coalesce(F.col("grid_re_q"), F.lit(0)) / F.coalesce(F.col("wsum_q"), F.lit(100))
    val_im = F.coalesce(F.col("grid_im_q"), F.lit(0)) / F.coalesce(F.col("wsum_q"), F.lit(100))
    return (
        joined.groupBy("row_id", rows.u_cell, rows.v_cell)
        .agg(
            (qsum(val_re * F.col("t.kw"), 1e6) / F.lit(1e6)).alias("degrid_re"),
            (qsum(val_im * F.col("t.kw"), 1e6) / F.lit(1e6)).alias("degrid_im"),
        )
    )


DEGRID_CONV_SQL = """
    , taps AS (
      SELECT * FROM (VALUES (-1, 0.25e0), (0, 0.5e0), (1, 0.25e0)) AS t1(d, w)
    ),
    footprint AS (
      SELECT tu.d AS du, tv.d AS dv, tu.w * tv.w AS kw FROM taps tu, taps tv
    ),
    gated AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell,
             vis_re, vis_im, weight
      FROM vis WHERE NOT (flag OR flag_row)
    ),
    cgrid AS (
      SELECT g.u_cell + f.du AS u_cell, g.v_cell + f.dv AS v_cell,
             SUM(CAST(ROUND(g.vis_re * g.weight * f.kw * 100) AS BIGINT)) AS grid_re_q,
             SUM(CAST(ROUND(g.vis_im * g.weight * f.kw * 100) AS BIGINT)) AS grid_im_q,
             SUM(CAST(ROUND(g.weight * f.kw * 100) AS BIGINT)) AS wsum_q
      FROM gated g, footprint f GROUP BY 1, 2
    ),
    cells AS (
      SELECT row_id, CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell
      FROM vis
    ),
    sampled AS (
      SELECT c.row_id, c.u_cell, c.v_cell,
             CAST(ROUND(COALESCE(g.grid_re_q, 0) / COALESCE(g.wsum_q, 100) * f.kw * 1000000) AS BIGINT) AS re_q,
             CAST(ROUND(COALESCE(g.grid_im_q, 0) / COALESCE(g.wsum_q, 100) * f.kw * 1000000) AS BIGINT) AS im_q
      FROM cells c
      CROSS JOIN footprint f
      LEFT JOIN cgrid g ON g.u_cell = c.u_cell + f.du AND g.v_cell = c.v_cell + f.dv
    )
    SELECT row_id, u_cell, v_cell,
           SUM(re_q) / 1000000.0 AS degrid_re,
           SUM(im_q) / 1000000.0 AS degrid_im
    FROM sampled GROUP BY 1, 2, 3
    ORDER BY row_id
"""


# Phase-transform policy (reference perleypolyhedron/policies/
# phase_transform_policies.py:10-36, Perley & Cornwell 1992): after
# degridding at the original phase centre, rotate each sampled visibility
# to a new delay centre by e^{i·s·2π·ν/c·(u·Δl + v·Δm + w·Δn)} where the
# delta direction cosines come from the old/new centres. The centres are
# driver-side scalars, so (Δl, Δm, Δn) are computed in Python and reach
# the plan as foldable literals — the policy adds zero shuffles on top of
# the degrid join.

TWO_PI_OVER_C = 2.0958450219516816e-08  # matches functions/phase.py


def _phase_rotate_lmn(ra0: float, dec0: float, ra: float, dec: float):
    import math

    ll = math.cos(dec) * math.sin(ra - ra0)
    mm = math.sin(dec) * math.cos(dec0) - math.cos(dec) * math.sin(dec0) * math.cos(
        ra - ra0
    )
    nn = -(1.0 - math.sqrt(1.0 - ll * ll - mm * mm))
    return ll, mm, nn


def degrid_phase_rotated(
    vis: DataFrame,
    ra0: float = 0.1,
    dec0: float = 0.05,
    ra: float = 0.102,
    dec: float = 0.052,
    phasesign: float = 1.0,
) -> DataFrame:
    """Policy-parameterized degridding: nearest-cell gather + the
    phase_rotate policy applied to the sampled visibility."""
    ll, mm, nn = _phase_rotate_lmn(ra0, dec0, ra, dec)
    grid = grid_natural(vis)
    rows = _cells(vis)
    j = rows.join(F.broadcast(grid), ["u_cell", "v_cell"], "left")
    dre = F.coalesce(F.col("grid_re_q"), F.lit(0)) / F.coalesce(F.col("wsum_q"), F.lit(100))
    dim = F.coalesce(F.col("grid_im_q"), F.lit(0)) / F.coalesce(F.col("wsum_q"), F.lit(100))
    x = (
        F.lit(phasesign * TWO_PI_OVER_C)
        * (F.col("u") * F.lit(ll) + F.col("v") * F.lit(mm) + F.col("w") * F.lit(nn))
        * F.col("frequency")
    )
    return j.select(
        "row_id",
        "u_cell",
        "v_cell",
        # + 0.0 normalizes IEEE -0.0 → 0.0 (the driver's value hash is
        # bit-sensitive; Spark and DuckDB disagree on round(-0.0))
        (F.round(dre * F.cos(x) - dim * F.sin(x), 6) + F.lit(0.0)).alias("rot_re"),
        (F.round(dre * F.sin(x) + dim * F.cos(x), 6) + F.lit(0.0)).alias("rot_im"),
    )


def degrid_phase_rotated_sql(
    ra0: float = 0.1,
    dec0: float = 0.05,
    ra: float = 0.102,
    dec: float = 0.052,
    phasesign: float = 1.0,
) -> str:
    ll, mm, nn = _phase_rotate_lmn(ra0, dec0, ra, dec)
    x = (
        f"(CAST({phasesign * TWO_PI_OVER_C!r} AS DOUBLE)"
        f" * (c.u * CAST({ll!r} AS DOUBLE) + c.v * CAST({mm!r} AS DOUBLE)"
        f" + c.w * CAST({nn!r} AS DOUBLE)) * c.frequency)"
    )
    return f"""
    , cells AS (
      SELECT row_id, u, v, w, frequency,
             CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell
      FROM vis
    ),
    grid AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell,
             SUM(CAST(ROUND(vis_re * weight * 100) AS BIGINT)) AS grid_re_q,
             SUM(CAST(ROUND(vis_im * weight * 100) AS BIGINT)) AS grid_im_q,
             SUM(CAST(ROUND(weight * 100) AS BIGINT)) AS wsum_q
      FROM vis WHERE NOT (flag OR flag_row)
      GROUP BY 1, 2
    )
    SELECT c.row_id, c.u_cell, c.v_cell,
           round((COALESCE(g.grid_re_q, 0) / COALESCE(g.wsum_q, 100)) * cos({x})
                 - (COALESCE(g.grid_im_q, 0) / COALESCE(g.wsum_q, 100)) * sin({x}), 6)
             + CAST(0 AS DOUBLE) AS rot_re,
           round((COALESCE(g.grid_re_q, 0) / COALESCE(g.wsum_q, 100)) * sin({x})
                 + (COALESCE(g.grid_im_q, 0) / COALESCE(g.wsum_q, 100)) * cos({x}), 6)
             + CAST(0 AS DOUBLE) AS rot_im
    FROM cells c LEFT JOIN grid g ON c.u_cell = g.u_cell AND c.v_cell = g.v_cell
    ORDER BY c.row_id
    """


DEGRID_SQL = """
    , cells AS (
      SELECT row_id, CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell
      FROM vis
    ),
    grid AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell,
             SUM(CAST(ROUND(vis_re * weight * 100) AS BIGINT)) AS grid_re_q,
             SUM(CAST(ROUND(vis_im * weight * 100) AS BIGINT)) AS grid_im_q,
             SUM(CAST(ROUND(weight * 100) AS BIGINT)) AS wsum_q
      FROM vis WHERE NOT (flag OR flag_row)
      GROUP BY 1, 2
    )
    SELECT c.row_id, c.u_cell, c.v_cell,
           COALESCE(g.grid_re_q, 0) / COALESCE(g.wsum_q, 100) AS degrid_re,
           COALESCE(g.grid_im_q, 0) / COALESCE(g.wsum_q, 100) AS degrid_im
    FROM cells c LEFT JOIN grid g ON c.u_cell = g.u_cell AND c.v_cell = g.v_cell
    ORDER BY c.row_id
"""


def briggs_weights(vis: DataFrame, robust: float = 0.0) -> DataFrame:
    """Briggs/robust weighting: per-row imaging weight
    w' = w / (1 + W_cell · f²),  f² = (5·10^(−robust))² · ΣW / ΣW²_cell
    (two-pass: cell totals → broadcast join back)."""
    gated = _cells(vis.filter(~(F.col("flag") | F.col("flag_row"))))
    cellw = gated.groupBy("u_cell", "v_cell").agg(
        qsum(F.col("weight"), 100.0).alias("wq")
    )
    totals = cellw.agg(
        F.sum("wq").alias("sum_wq"), F.sum(F.col("wq") * F.col("wq")).alias("sum_wq2")
    )
    f2_num = (5.0 * (10.0 ** (-robust))) ** 2
    joined = gated.join(F.broadcast(cellw), ["u_cell", "v_cell"]).crossJoin(
        F.broadcast(totals)
    )
    # exact integer-derived doubles: wq/100, sums are BIGINT
    w_cell = F.col("wq") / 100.0
    f2 = F.lit(f2_num) * (F.col("sum_wq") / 100.0) / (F.col("sum_wq2") / 10000.0)
    wprime = F.col("weight") / (F.lit(1.0) + w_cell * f2)
    return joined.select(
        "row_id", "u_cell", "v_cell",
        F.round(wprime, 9).alias("briggs_weight"),
    )


def BRIGGS_SQL(robust: float = 0.0) -> str:
    f2_num = repr((5.0 * (10.0 ** (-robust))) ** 2)
    return f"""
    , gated AS (
      SELECT row_id, weight,
             CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell
      FROM vis WHERE NOT (flag OR flag_row)
    ),
    cellw AS (
      SELECT u_cell, v_cell, SUM(CAST(ROUND(weight * 100) AS BIGINT)) AS wq
      FROM gated GROUP BY u_cell, v_cell
    ),
    totals AS (SELECT SUM(wq) AS sum_wq, SUM(wq * wq) AS sum_wq2 FROM cellw)
    SELECT g.row_id, g.u_cell, g.v_cell,
           round(g.weight / (1.0 + (c.wq / 100.0)
                 * ({f2_num} * (t.sum_wq / 100.0) / (t.sum_wq2 / 10000.0))), 9) AS briggs_weight
    FROM gated g
    JOIN cellw c ON g.u_cell = c.u_cell AND g.v_cell = c.v_cell
    CROSS JOIN totals t
    ORDER BY g.row_id
"""


def estimate_cell_size(vis: DataFrame) -> DataFrame:
    """Nyquist cell size (arcsec) from max |u|,|v| and min wavelength
    (reference gridding/util.py:4-82): cell = 1 / (2·umax·νmax/c) rad."""
    c_ms = 2.99792458e8
    stats = vis.agg(
        F.max(F.abs(F.col("u"))).alias("umax"),
        F.max(F.abs(F.col("v"))).alias("vmax"),
        F.max(F.col("frequency")).alias("fmax"),
    )
    rad2asec = 648000.0 / 3.141592653589793
    return stats.select(
        "umax",
        "vmax",
        F.round(F.lit(rad2asec) / (2.0 * F.col("umax") * F.col("fmax") / F.lit(c_ms)), 9).alias("u_cell_asec"),
        F.round(F.lit(rad2asec) / (2.0 * F.col("vmax") * F.col("fmax") / F.lit(c_ms)), 9).alias("v_cell_asec"),
    )


ESTIMATE_CELL_SQL = f"""
    SELECT MAX(ABS(u)) AS umax, MAX(ABS(v)) AS vmax,
           round({648000.0 / 3.141592653589793!r} / (2.0 * MAX(ABS(u)) * MAX(frequency) / 299792458.0), 9) AS u_cell_asec,
           round({648000.0 / 3.141592653589793!r} / (2.0 * MAX(ABS(v)) * MAX(frequency) / 299792458.0), 9) AS v_cell_asec
    FROM vis
"""


def conv_grid_sql(kernel: list[tuple[int, float]]) -> str:
    """CONV_GRID_SQL generator for arbitrary separable tap tables —
    weights emitted as forced-DOUBLE literals so the DuckDB product
    matches Spark's bit-for-bit."""
    from codex_africanus_spark.functions.shapes import _dlit

    vals = ", ".join(f"({d}, {_dlit(w)})" for d, w in kernel)
    return f"""
    , taps AS (
      SELECT * FROM (VALUES {vals}) AS t1(d, w)
    ),
    footprint AS (
      SELECT tu.d AS du, tv.d AS dv, tu.w * tv.w AS kw FROM taps tu, taps tv
    ),
    gated AS (
      SELECT CAST(FLOOR(u / 10.0) AS BIGINT) AS u_cell,
             CAST(FLOOR(v / 10.0) AS BIGINT) AS v_cell,
             vis_re, vis_im, weight
      FROM vis WHERE NOT (flag OR flag_row)
    )
    SELECT g.u_cell + f.du AS u_cell, g.v_cell + f.dv AS v_cell,
           COUNT(*) AS ntaps,
           CAST(SUM(CAST(ROUND(g.vis_re * g.weight * f.kw * 100) AS BIGINT)) AS BIGINT) AS grid_re_q,
           CAST(SUM(CAST(ROUND(g.vis_im * g.weight * f.kw * 100) AS BIGINT)) AS BIGINT) AS grid_im_q,
           CAST(SUM(CAST(ROUND(g.weight * f.kw * 100) AS BIGINT)) AS BIGINT) AS wsum_q
    FROM gated g, footprint f
    GROUP BY 1, 2
    ORDER BY 1, 2
"""
