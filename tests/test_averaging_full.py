"""Full-column MS averaging semantics (reference row_average,
time_and_channel_avg.py:76-266, and the sigma-spectrum row-chan averager
:414-640): two-tier flag matching, uvw/centroid means, exposure/weight
sums, sigma = sqrt(Σσ²w²/(Σw)²)."""

import math

from codex_africanus_spark.operators import averaging as avg_op
import pytest


def _vis(spark, rows):
    """rows: (time, a1, a2, chan, u, v, w, tc, exposure, interval,
    weight, sigma, vis_re, vis_im, flag, flag_row)"""
    cols = (
        "time antenna1 antenna2 chan u v w time_centroid exposure "
        "interval weight sigma vis_re vis_im flag flag_row"
    ).split()
    return spark.createDataFrame(rows, cols)


@pytest.mark.slow
def test_row_average_full_unflagged_tier(spark):
    df = _vis(
        spark,
        [
            # one baseline, one bin: two unflagged rows + one flagged row
            (10.0, 0, 1, 0, 1.0, 2.0, 3.0, 10.5, 0.8, 1.0, 2.0, 0.5, 1.0, 0.0, False, False),
            (20.0, 0, 1, 0, 3.0, 4.0, 5.0, 20.5, 0.8, 1.0, 4.0, 1.0, 2.0, 0.0, False, False),
            (30.0, 0, 1, 0, 9.0, 9.0, 9.0, 30.5, 9.9, 9.0, 9.0, 9.0, 9.0, 0.0, False, True),
        ],
    )
    [r] = avg_op.row_average_full(df, time_bin_secs=1e6).collect()
    assert r["n_rows"] == 3
    # flagged row contributes to NOTHING (some unflagged rows exist)
    assert r["u_avg"] == 2.0 and r["v_avg"] == 3.0 and r["w_avg"] == 4.0
    assert r["time_avg"] == 15.0
    assert r["time_centroid_avg"] == 15.5
    assert r["exposure_sum"] == 1.6
    assert r["interval_sum"] == 2.0
    assert r["weight_sum"] == 6.0
    # sigma = sqrt((0.25*4 + 1*16) / 36)
    assert abs(r["sigma_avg"] - math.sqrt(17.0 / 36.0)) < 1e-9
    assert r["bin_flag_row"] is False


def test_row_average_full_all_flagged_fallback(spark):
    df = _vis(
        spark,
        [
            (10.0, 0, 1, 0, 2.0, 2.0, 2.0, 10.0, 1.0, 1.0, 2.0, 1.0, 1.0, 0.0, False, True),
            (20.0, 0, 1, 0, 4.0, 4.0, 4.0, 20.0, 1.0, 1.0, 2.0, 1.0, 2.0, 0.0, False, True),
        ],
    )
    [r] = avg_op.row_average_full(df, time_bin_secs=1e6).collect()
    # every sample flagged ⇒ the flagged tier is used and the bin is flagged
    assert r["bin_flag_row"] is True
    assert r["u_avg"] == 3.0
    assert r["weight_sum"] == 4.0
    assert r["exposure_sum"] == 2.0
    assert abs(r["sigma_avg"] - math.sqrt(8.0 / 16.0)) < 1e-9


def test_sigma_spectrum_two_tier(spark):
    df = _vis(
        spark,
        [
            (10.0, 0, 1, 0, 0, 0, 0, 0, 0, 1.0, 2.0, 0.5, 4.0, 0.0, False, False),
            (10.0, 0, 1, 1, 0, 0, 0, 0, 0, 1.0, 4.0, 1.5, 8.0, 0.0, True, False),
        ],
    )
    # chan_bin_size=2 puts both samples in one (row-bin, chan-bin) cell;
    # the chan-1 sample is flagged so only chan 0 contributes
    [r] = avg_op.time_and_channel_full(df, time_bin_secs=1e6, chan_bin_size=2).collect()
    assert r["nsamples"] == 2 and r["bin_flag"] is False
    assert r["vis_re_avg"] == 4.0
    assert r["weight_sum"] == 2.0
    assert abs(r["sigma_spectrum_avg"] - math.sqrt(0.25 * 4.0 / 4.0)) < 1e-9


def test_row_average_full_single_shuffle(spark, sf_dir):
    """One groupBy ⇒ exactly one exchange — O(#bins) shuffle volume."""
    from pyspark.sql import functions as F

    from codex_africanus_spark.sources import tpch_ms

    vis = tpch_ms.vis_table(spark, sf_dir).withColumns(
        {
            "time_centroid": F.col("time") + (F.col("row_id") % 7) / F.lit(10.0),
            "exposure": F.col("interval") * F.lit(0.875),
        }
    )
    for df in (
        avg_op.row_average_full(vis),
        avg_op.time_and_channel_full(vis),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1
        assert plan.count("HashAggregate") >= 2  # map-side partial agg
