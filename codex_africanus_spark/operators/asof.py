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

from pyspark.sql import DataFrame
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
    """
    keys = keys or rows.columns
    g = grid.select(F.col(grid_col).alias("__g")).distinct()
    bounds = g.agg(F.min("__g").alias("gmin"), F.max("__g").alias("gmax")).collect()[0]
    second = (
        g.filter(F.col("__g") > bounds.gmin).agg(F.min("__g")).collect()[0][0]
    )
    prelast = (
        g.filter(F.col("__g") < bounds.gmax).agg(F.max("__g")).collect()[0][0]
    )
    clamped = F.least(
        F.greatest(F.col(value_col), F.lit(float(bounds.gmin))),
        F.lit(float(bounds.gmax)),
    )
    r = rows.withColumn("__v", clamped)
    lo = (
        r.crossJoin(F.broadcast(g))
        .filter(F.col("__g") <= F.col("__v"))
        .groupBy(*keys, "__v")
        .agg(F.max("__g").alias("grid_lo"))
        # the top grid point has no upper interval: step down one
        .withColumn(
            "grid_lo",
            F.when(F.col("grid_lo") >= float(bounds.gmax), F.lit(float(prelast)))
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
