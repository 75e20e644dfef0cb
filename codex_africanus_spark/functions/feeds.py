"""Feed rotation and parallactic angles.

- feed_rotation: 2×2 rotation Jones per parallactic angle
  (/root/reference/africanus/rime/feeds.py:14-115): linear feeds give the
  real rotation matrix [[cos pa, sin pa], [−sin pa, cos pa]]; circular
  feeds the phase diagonal [[e^{−i·pa}, 0], [0, e^{i·pa}]]. Pure Column
  expressions.
- parallactic_angles: per-(time, antenna) PA. The reference's 'casa' and
  'astropy' backends need ephemeris libraries (parangles_casa.py,
  parangles_astropy.py) which are driver-side only; the 'test' backend is
  an arithmetic placeholder. Architecture per SURVEY §2.8: compute the
  small distinct-(time, antenna) table on the driver (or as expressions
  for the test backend) and broadcast-join it — the table is
  n_utime × n_ant, never large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.functions.complex_algebra import Cplx, cexp_i, clit
from codex_africanus_spark.functions.jones import Jones2x2


def feed_rotation(pa: Column, feed_type: str = "linear") -> Jones2x2:
    if feed_type == "linear":
        zero = F.lit(0.0)
        return Jones2x2(
            Cplx(F.cos(pa), zero), Cplx(F.sin(pa), zero),
            Cplx(-F.sin(pa), zero), Cplx(F.cos(pa), zero),
        )
    if feed_type == "circular":
        z = clit(0.0)
        return Jones2x2(cexp_i(-pa), z, z, cexp_i(pa))
    raise ValueError(f"feed_type must be linear|circular, got {feed_type!r}")


def parallactic_angles_test_backend(time: Column, antenna: Column) -> Column:
    """The reference's 'test' backend formula: a deterministic function of
    (time, antenna) used for pipeline validation (parangles.py 'test')."""
    return F.sin((time % F.lit(86400.0)) / F.lit(86400.0) * F.lit(6.283185307179586)) * (
        F.lit(0.1) + antenna / F.lit(100.0)
    )


def parallactic_angle_table(
    vis: DataFrame, n_ant: int, backend: str = "test"
) -> DataFrame:
    """Distinct-(time, antenna) PA dimension table (broadcast side input).

    For 'casa'/'astropy' backends, compute the same table driver-side
    with the external ephemeris library and `spark.createDataFrame` it —
    the join shape downstream is identical (the reference isolates
    casacore in a spawned process pool for the same reason,
    fused/transformers/parangle.py).
    """
    if backend != "test":
        raise NotImplementedError(
            "ephemeris backends (casa/astropy) are driver-side precompute; "
            "not available in this container"
        )
    times = vis.select("time").distinct()
    ants = vis.sparkSession.range(n_ant).select(F.col("id").cast("int").alias("antenna"))
    return times.crossJoin(ants).select(
        "time",
        "antenna",
        parallactic_angles_test_backend(F.col("time"), F.col("antenna")).alias("pa"),
    )


def transform_sources(
    l: Column, m: Column, pa: Column, ant_scale: Column | None = None
) -> tuple[Column, Column]:
    """Rotate (and optionally scale) source lm by the parallactic angle —
    per-(source,time,ant) pointing transform (reference
    rime/transform.py:47-99)."""
    lt = l * F.cos(pa) - m * F.sin(pa)
    mt = l * F.sin(pa) + m * F.cos(pa)
    if ant_scale is not None:
        lt, mt = lt * ant_scale, mt * ant_scale
    return lt, mt
