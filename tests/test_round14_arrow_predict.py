"""Round-14 Arrow sincos tier locks: the per-row source fold
(operators/predict_arrow) must stay bit-identical to the JVM
expand-join-aggregate path for every adopting query family, at every
scale the driver verifies (sf0.001 default; sf0.01/sf0.1 in the slow
selection — all three were green at adoption). Same quantized integer
multiset + associative int64 sum; the only numeric divergence sources
(numpy vs JVM cos/sin/exp/pow) are flip-rate-measured to land on the
same 1e-6 grid (tools/sincos_fliprate.py: zero flips through sf10)."""
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from codex_africanus_spark.operators import predict as predict_op
from codex_africanus_spark.operators import predict_arrow
from codex_africanus_spark.plans import rime as rime_plan
from codex_africanus_spark.sources import tpch_ms

KEY = ["row_id", "antenna1", "antenna2", "chan"]
RIME_SPEC = "(Kpq, Bpq, Epq): [I,Q,U,V] -> [XX,XY,YX,YY]"


def _bitcompare(a_df, b_df):
    assert [f.dataType for f in a_df.schema] == [f.dataType for f in b_df.schema]
    a = a_df.toPandas().sort_values(KEY).reset_index(drop=True)
    b = b_df.toPandas().sort_values(KEY).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert (av.view(np.int64) == bv.view(np.int64)).all(), c
        else:
            assert (av == bv).all(), c


def _both_paths(monkeypatch, build):
    monkeypatch.delenv("SPARK_GRAFT_ARROW_PREDICT", raising=False)
    folded = build()
    monkeypatch.setenv("SPARK_GRAFT_ARROW_PREDICT", "0")
    expanded = build()
    monkeypatch.delenv("SPARK_GRAFT_ARROW_PREDICT", raising=False)
    return folded, expanded


def _builders(spark, sf):
    vis = tpch_ms.vis_table(spark, sf)
    src = tpch_ms.source_table(spark, sf)
    gains = tpch_ms.gains_table(spark)
    return {
        "point_shape": lambda: predict_op.predict_point_vis(vis, src),
        "point_noshape": lambda: predict_op.predict_point_vis(
            vis, src.filter(F.col("source_type") == "POINT"), with_shape=False
        ),
        "full_corr": lambda: predict_op.predict_full_corr(vis, src, gains),
        "rime_kbe": lambda: rime_plan.rime(RIME_SPEC, vis, src),
    }


@pytest.mark.parametrize("path", ["point_shape", "point_noshape", "full_corr", "rime_kbe"])
def test_fold_matches_expand(spark, sf_dir, monkeypatch, path):
    build = _builders(spark, sf_dir)[path]
    folded, expanded = _both_paths(monkeypatch, build)
    _bitcompare(folded, expanded)


@pytest.mark.slow
@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
@pytest.mark.parametrize("path", ["point_shape", "point_noshape", "full_corr", "rime_kbe"])
def test_fold_matches_expand_driver_scales(spark, monkeypatch, sf, path):
    build = _builders(spark, sf)[path]
    folded, expanded = _both_paths(monkeypatch, build)
    _bitcompare(folded, expanded)


def test_fold_dispatches_on_bench_queries(spark, sf_dir):
    """The bench queries must actually take the Arrow tier (a silent
    fallback would leave the optimization OFF while tests stay green):
    the fold plan carries a MapInPandas/ArrowEvalPython node and no
    BroadcastNestedLoop/BroadcastHashJoin below the aggregate."""
    assert predict_arrow.enabled()
    vis = tpch_ms.vis_table(spark, sf_dir)
    src = tpch_ms.source_table(spark, sf_dir)
    plan = predict_op.predict_point_vis(vis, src)._jdf.queryExecution().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_fold_collapses_duplicate_keys(spark, sf_dir, monkeypatch):
    """Rows sharing (row_id, a1, a2, chan) must merge in the final
    groupBy exactly as the expand path's aggregate merges them."""
    vis = tpch_ms.vis_table(spark, sf_dir)
    dup = vis.unionByName(vis.limit(7))
    src = tpch_ms.source_table(spark, sf_dir)
    distinct_keys = vis.select(*KEY).distinct().count()
    folded, expanded = _both_paths(
        monkeypatch, lambda: predict_op.predict_point_vis(dup, src)
    )
    # duplicates collapsed to the key grain, not appended (the sf0.001
    # corpus itself carries 6000 rows over 5939 distinct keys)
    assert folded.count() == distinct_keys
    _bitcompare(folded, expanded)


def test_fold_gates(spark, sf_dir, monkeypatch):
    vis = tpch_ms.vis_table(spark, sf_dir)
    src = tpch_ms.source_table(spark, sf_dir)
    # kill-switch
    monkeypatch.setenv("SPARK_GRAFT_ARROW_PREDICT", "0")
    assert predict_arrow.point_fold(vis, src) is None
    monkeypatch.delenv("SPARK_GRAFT_ARROW_PREDICT", raising=False)
    # missing source column -> fallback
    assert predict_arrow.point_fold(vis, src.drop("spi")) is None
    # missing vis column -> fallback
    assert predict_arrow.point_fold(vis.drop("u"), src) is None
    # catalogue over the closure bound -> fallback
    monkeypatch.setattr(predict_arrow, "ARROW_MAX_SRC", 3)
    assert predict_arrow.point_fold(vis, src) is None
    monkeypatch.undo()
    # empty catalogue -> fallback (the expand path emits zero rows; a
    # fold would emit zero-valued rows instead)
    empty = src.filter(F.lit(False))
    assert predict_arrow.point_fold(vis, empty) is None
    assert predict_arrow.full_corr_fold(vis, empty) is None


def test_rime_fold_gates_on_exact_standard_terms(spark, sf_dir):
    """Custom/overridden terms must keep the general compiled path (the
    _HoistedBrightness discipline): an overridden B means no Arrow fold."""

    class MyBrightness(rime_plan.BrightnessTerm):
        pass

    vis = tpch_ms.vis_table(spark, sf_dir)
    src = tpch_ms.source_table(spark, sf_dir)
    df = rime_plan.rime(RIME_SPEC, vis, src, terms={"B": MyBrightness})
    assert "MapInPandas" not in df._jdf.queryExecution().toString()
