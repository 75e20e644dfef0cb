"""Geometric parallactic-angle backend + the bin-axis guard helper."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from codex_africanus_spark.functions import feeds
from codex_africanus_spark.queries import dense_or_distinct_bins
from codex_africanus_spark.sources import tpch_ms


def numpy_pa(times, xyz, ra, dec):
    """Independent NumPy restatement of the geometric PA formula
    (USNO GMST linear approximation + hour-angle PA)."""
    d = (times - 51544.5 * 86400.0) / 86400.0
    gmst = np.fmod(4.894961212823059 + 6.300388098984891 * d, 2 * np.pi)
    lon = np.arctan2(xyz[:, 1], xyz[:, 0])
    lat = np.arctan2(xyz[:, 2], np.hypot(xyz[:, 0], xyz[:, 1]))
    ha = gmst[:, None] + lon[None, :] - ra
    return np.arctan2(
        np.cos(lat)[None, :] * np.sin(ha),
        np.sin(lat)[None, :] * np.cos(dec)
        - np.cos(lat)[None, :] * np.sin(dec) * np.cos(ha),
    )


def test_geometric_pa_matches_numpy(spark):
    times = np.array([4.45e9, 4.45e9 + 3600.0, 4.46e9 + 7200.0])
    ants = tpch_ms.antenna_table(spark).toPandas().sort_values("antenna")
    xyz = ants[["ant_x", "ant_y", "ant_z"]].to_numpy()
    ra, dec = 0.1, -0.6
    expected = numpy_pa(times, xyz, ra, dec)

    tdf = spark.createDataFrame([(float(t),) for t in times], "time double")
    grid = tdf.crossJoin(tpch_ms.antenna_table(spark))
    pa = feeds.parallactic_angle_geometric(
        F.col("time"), F.col("ant_x"), F.col("ant_y"), F.col("ant_z"),
        F.lit(ra), F.lit(dec),
    )
    got = (
        grid.select("time", "antenna", pa.alias("pa"))
        .toPandas()
        .pivot(index="time", columns="antenna", values="pa")
        .to_numpy()
    )
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-12)
    # PA must vary with both time (earth rotation) and antenna (position)
    assert np.ptp(expected, axis=0).min() > 0
    assert np.ptp(expected, axis=1).max() > 0


def test_geometric_pa_range(spark):
    """All angles are finite and in (-pi, pi]."""
    times = np.linspace(4.45e9, 4.45e9 + 86400.0, 25)
    ants = tpch_ms.antenna_table(spark).toPandas()
    xyz = ants[["ant_x", "ant_y", "ant_z"]].to_numpy()
    pa = numpy_pa(times, xyz, 0.1, -0.6)
    assert np.isfinite(pa).all()
    assert (np.abs(pa) <= math.pi).all()


def test_astropy_backend_gated(spark):
    if feeds.HAVE_ASTROPY:
        tab = feeds.astropy_parallactic_angle_table(
            spark, [4.45e9], [(5109224.0, 2006790.0, -3239100.0)], (0.1, -0.6)
        )
        assert tab.count() == 1
    else:
        with pytest.raises(NotImplementedError):
            feeds.astropy_parallactic_angle_table(spark, [0.0], [(1.0, 0.0, 0.0)], (0.0, 0.0))


def test_dense_bins_guard_empty(spark):
    df = spark.range(0).select(F.col("id").alias("time_bin"))
    out = dense_or_distinct_bins(df, "time_bin")
    assert out.count() == 0


def test_dense_bins_guard_wide_axis(spark):
    """A sparse axis spanning 10^6 bins must NOT densify."""
    df = spark.createDataFrame([(0,), (10**6,)], "time_bin long")
    out = dense_or_distinct_bins(df, "time_bin")
    assert out.count() == 2  # distinct fallback, not 10^6+1 dense rows


def test_dense_bins_dense_path(spark):
    df = spark.createDataFrame([(3,), (7,), (5,)], "time_bin long")
    out = dense_or_distinct_bins(df, "time_bin")
    assert sorted(r.time_bin for r in out.collect()) == list(range(3, 8))
