"""As-of / interval join: match each row to the nearest-below entry of a
sorted grid.

Parity with the beam frequency grid interpolation
(/root/reference/africanus/rime/fast_beam_cubes.py:11-54
freq_grid_interp): binary-search each data frequency into the beam's
frequency grid, clamp to the ends, and emit (lower grid point, linear
weight).

Spark strategy by grid size:
- grid ≪ rows (the only case in the reference — beam grids are tens of
  points): broadcast the grid, equi-join is unnecessary — a broadcast
  range join (cross + filter + max) lets Catalyst turn it into a
  BroadcastNestedLoopJoin with a pushed range predicate; AQE handles the
  rest. This is exactly the "single-chunk side input" contract of
  SURVEY §1.4.
- comparable sizes: bucketize both sides on floor(value/width) and
  equi-join bucket±1, which makes the range join shuffle-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_grid_interp(
    rows: DataFrame,
    grid: DataFrame,
    value_col: str,
    grid_col: str = "grid_value",
    keys: list[str] | None = None,
) -> DataFrame:
    """For each row, the enclosing grid interval and linear weight.

    rows below the grid clamp to the first interval (weight 0), above to
    the last (weight 1) — the reference's clamping (:30-43).

    The clamp bounds (grid min/max and the point below the max) ride the
    plan as a broadcast 1-row aggregate of the tiny grid side — no driver
    collect, no extra Spark job; the whole operator is one job whose only
    fact-side shuffle is the interval groupBy."""
    keys = keys or rows.columns
    g = grid.select(F.col(grid_col).alias("__g")).distinct()
    # 1-row bounds frame: gmin, gmax, and the grid point just below gmax
    # (the single-partition window is over the grid side only — tens of
    # points by the SURVEY §1.4 side-input contract)
    rn = F.row_number().over(Window.orderBy(F.col("__g").desc()))
    bounds = (
        g.withColumn("__rn", rn)
        .agg(
            F.min("__g").alias("__gmin"),
            F.max("__g").alias("__gmax"),
            F.max(F.when(F.col("__rn") == 2, F.col("__g"))).alias("__prelast"),
        )
    )
    r = rows.crossJoin(F.broadcast(bounds)).withColumn(
        "__v",
        F.least(F.greatest(F.col(value_col), F.col("__gmin")), F.col("__gmax")),
    )
    lo = (
        r.crossJoin(F.broadcast(g))
        .filter(F.col("__g") <= F.col("__v"))
        .groupBy(*keys, "__v", "__gmax", "__prelast")
        .agg(F.max("__g").alias("grid_lo"))
        # the top grid point has no upper interval: step down one
        .withColumn(
            "grid_lo",
            F.when(F.col("grid_lo") >= F.col("__gmax"), F.col("__prelast"))
            .otherwise(F.col("grid_lo")),
        )
    )
    hi = (
        lo.crossJoin(F.broadcast(g.select(F.col("__g").alias("__h"))))
        .filter(F.col("__h") > F.col("grid_lo"))
        .groupBy(*keys, "__v", "grid_lo")
        .agg(F.min("__h").alias("grid_hi"))
    )
    return hi.select(
        *keys,
        "grid_lo",
        "grid_hi",
        ((F.col("__v") - F.col("grid_lo")) / (F.col("grid_hi") - F.col("grid_lo"))).alias(
            "interp_weight"
        ),
    )
