"""FFT imaging vs direct-DFT oracle (the reference's wgridder-vs-
explicit_gridder pattern, test_wgridder.py:18-108)."""

import numpy as np

from codex_africanus_spark.operators import fft_imaging
from codex_africanus_spark.sources import tpch_ms


def test_dirty_image_matches_direct_dft(spark, sf_dir):
    vis = tpch_ms.vis_table(spark, sf_dir).filter("row_id % 11 = 0")
    nx = ny = 16
    img, wsum = fft_imaging.dirty_image(vis, nx, ny)
    rows = vis.select("u", "v", "vis_re", "vis_im", "weight", "flag", "flag_row").collect()
    expected, wsum2 = fft_imaging.dirty_image_direct(rows, nx, ny)
    assert wsum > 0 and abs(wsum - wsum2) < 1e-3
    # identical discretization ⇒ machine-precision agreement (the
    # reference uses l2 ≤ 1e-4 for the approximate wgridder; the exact
    # FFT identity is much tighter)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(img / scale, expected / scale, atol=1e-9)


def test_dirty_image_bands_matches_per_band_filter(spark, sf_dir):
    """The one-pass banded accumulation must equal imaging each band's
    rows separately (the reference's band loop, vis2im.py:46-76) —
    bit-exact, since accumulation is fixed-point."""
    vis = tpch_ms.vis_table(spark, sf_dir).filter("row_id % 7 = 0")
    banded = fft_imaging.dirty_image_bands(vis, 16, 16, chan_per_band=2)
    assert len(banded) >= 2
    for b, (img, wsum) in banded.items():
        img1, w1 = fft_imaging.dirty_image(
            vis.filter(f"chan DIV 2 = {b}"), 16, 16
        )
        assert w1 == wsum
        np.testing.assert_array_equal(img, img1)


def test_dirty_image_deterministic_across_runs(spark, sf_dir):
    vis = tpch_ms.vis_table(spark, sf_dir)
    img1, w1 = fft_imaging.dirty_image(vis, 32, 32)
    img2, w2 = fft_imaging.dirty_image(vis.repartition(7), 32, 32)
    # fixed-point accumulation ⇒ bit-identical regardless of partitioning
    assert w1 == w2
    np.testing.assert_array_equal(img1, img2)
