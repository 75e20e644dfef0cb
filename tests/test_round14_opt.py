"""Round-14 optimization locks: the DDE per-row source fold must stay
bit-identical to the r13 expand-join-aggregate path (same quantized
integer multiset, associative sum), including the duplicate-(row_id,…)
collapse the final groupBy provides."""
import numpy as np
import pytest
from pyspark.sql import functions as F

import codex_africanus_spark.operators.calibration as cal_op
from codex_africanus_spark.queries._core import dense_or_distinct_bins
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.sources.tables import scan_twin as tables_scan_twin

KEY = ["row_id", "antenna1", "antenna2", "time_bin", "chan"]


def _dde_inputs(spark, sf_dir):
    base = tpch_ms.vis_table(spark, sf_dir)
    add_bin = lambda df: df.withColumn(  # noqa: E731
        "time_bin", F.floor(F.col("time") / F.lit(604800.0)).cast("long")
    )
    vis = add_bin(base)
    vis._scan_twin = add_bin(tables_scan_twin(base))
    dirs = tpch_ms.source_table(spark, sf_dir).filter(F.col("source_id") % 6 == 1)
    time_bins = dense_or_distinct_bins(tables_scan_twin(vis), "time_bin")
    gains = tpch_ms.dde_gains_table(spark, time_bins, dirs)
    return vis, dirs, gains


def _bitcompare(a, b):
    a = a.sort_values(KEY).reset_index(drop=True)
    b = b.sort_values(KEY).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert (av.view(np.int64) == bv.view(np.int64)).all(), c
        else:
            assert (av == bv).all(), c


def test_cc_vis_fold_matches_expand(spark, sf_dir):
    vis, dirs, gains = _dde_inputs(spark, sf_dir)
    n_dir = dirs.count()
    assert 0 < n_dir <= cal_op.FOLD_MAX_DIRS
    a = cal_op._cc_vis_expand(vis, dirs, gains, 1e6).toPandas()
    b = cal_op._cc_vis_folded(vis, dirs, gains, 1e6, n_dir).toPandas()
    _bitcompare(a, b)


def test_cc_vis_fold_collapses_duplicate_keys(spark, sf_dir):
    """A vis frame with two rows sharing (row_id, a1, a2, time_bin, chan)
    must still produce ONE output row whose sums span both rows — the
    sf0.01 corpus contains such a collision (row_id 18089) and the fold's
    final groupBy is what preserves the r13 grain."""
    vis, dirs, gains = _dde_inputs(spark, sf_dir)
    dup = vis.unionByName(vis.limit(3))  # force duplicates deterministically
    dup._scan_twin = vis._scan_twin  # bins/chan_freq unchanged by the dup
    n_dir = dirs.count()
    a = cal_op._cc_vis_expand(dup, dirs, gains, 1e6).toPandas()
    b = cal_op._cc_vis_folded(dup, dirs, gains, 1e6, n_dir).toPandas()
    _bitcompare(a, b)
    base = cal_op._cc_vis_folded(vis, dirs, gains, 1e6, n_dir)
    assert len(b) == base.count()  # same grain, bigger sums on 3 keys


def test_cc_vis_dispatch_gate(spark, sf_dir, monkeypatch):
    """> FOLD_MAX_DIRS directions must fall back to the expand path (the
    unrolled codegen is bounded); the registry's 4-direction caller uses
    the fold. Both paths expose the identical output contract."""
    vis, dirs, gains = _dde_inputs(spark, sf_dir)
    folded_out = cal_op.compute_and_corrupt_vis(vis, dirs, gains)
    assert "terms" in folded_out._jdf.queryExecution().analyzed().toString()
    monkeypatch.setattr(cal_op, "FOLD_MAX_DIRS", 0)
    expand_out = cal_op.compute_and_corrupt_vis(vis, dirs, gains)
    assert "terms" not in expand_out._jdf.queryExecution().analyzed().toString()
    assert folded_out.columns == expand_out.columns == [
        "row_id", "antenna1", "antenna2", "time_bin", "chan", "cc_re", "cc_im"
    ]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
