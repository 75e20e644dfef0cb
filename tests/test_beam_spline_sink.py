"""NumPy-oracle tests for the gather-heavy / per-group operators the SQL
oracle cannot check (SURVEY §5 backend-equivalence style), plus the
write-back sink contract."""

import numpy as np
from pyspark.sql import functions as F

from codex_africanus_spark.operators import beam as beam_op
from codex_africanus_spark.operators import splines as spline_op
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.sources.sink import write_model_data


def test_beam_cube_matches_numpy_trilinear(spark):
    beam = beam_op.make_test_beam_cube()
    pts = [(i, -0.08 + 0.011 * i, 0.05 - 0.009 * i, 9.0e8 + 5e7 * i) for i in range(20)]
    df = spark.createDataFrame(pts, "id int, l double, m double, frequency double")
    out = (
        beam_op.beam_cube_dde(df, beam)
        .orderBy("id")
        .toPandas()
    )

    def trilinear(l, m, f):
        lg, mg, fg, cube = beam["l_grid"], beam["m_grid"], beam["f_grid"], beam["cube"]

        def ax(grid, x):
            i = np.clip(np.searchsorted(grid, x, side="right") - 1, 0, len(grid) - 2)
            return i, np.clip((x - grid[i]) / (grid[i + 1] - grid[i]), 0, 1)

        li, lw = ax(lg, l)
        mi, mw = ax(mg, m)
        fi, fw = ax(fg, f)
        val = 0.0
        for dl in (0, 1):
            for dm in (0, 1):
                for df_ in (0, 1):
                    w = ((lw if dl else 1 - lw) * (mw if dm else 1 - mw)
                         * (fw if df_ else 1 - fw))
                    val += w * cube[li + dl, mi + dm, fi + df_]
        return val

    expected = [trilinear(l, m, f) for _, l, m, f in pts]
    np.testing.assert_allclose(out.beam_gain.to_numpy(), expected, rtol=1e-12)


def test_beam_cube_clamps_outside_grid(spark):
    beam = beam_op.make_test_beam_cube()
    df = spark.createDataFrame(
        [(0, 10.0, -10.0, 1.0)], "id int, l double, m double, frequency double"
    )
    out = beam_op.beam_cube_dde(df, beam).collect()[0]
    assert np.isfinite(out.beam_gain)


def test_spline_interpolates_knots(spark):
    rng = np.random.default_rng(3)
    rows = []
    for k in range(3):
        xs = np.sort(rng.uniform(0, 10, 8))
        ys = rng.standard_normal(8)
        rows += [(k, float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "key long, x double, y double")
    out = spline_op.evaluate_spline_dense(df, n_eval=64).toPandas()
    # dense eval range spans the knots; endpoints must reproduce y exactly
    for k in range(3):
        grp = [r for r in rows if r[0] == k]
        sub = out[out.key == k].sort_values("x_eval")
        np.testing.assert_allclose(sub.y_eval.iloc[0], grp[0][2], rtol=1e-9)
        np.testing.assert_allclose(sub.y_eval.iloc[-1], grp[-1][2], rtol=1e-9)


def test_spline_exact_on_linear_data(spark):
    rows = [(0, float(x), 2.5 * x - 1.0) for x in range(10)]
    df = spark.createDataFrame(rows, "key long, x double, y double")
    out = spline_op.evaluate_spline_dense(df, n_eval=33).toPandas()
    np.testing.assert_allclose(
        out.y_eval.to_numpy(), 2.5 * out.x_eval.to_numpy() - 1.0, atol=1e-9
    )


def test_write_model_data_roundtrip(spark, sf_dir, tmp_path):
    """xds_to_table analogue: partitioned write + pruned read-back."""
    vis = tpch_ms.vis_table(spark, sf_dir).withColumn(
        "model_data_re", F.col("vis_re") * 2.0
    )
    path = str(tmp_path / "model_out")
    write_model_data(
        vis, path, partition_by=["chan"], sort_within=["time", "antenna1", "antenna2"]
    )
    back = spark.read.parquet(path)
    assert back.count() == vis.count()
    # partition pruning: reading one chan touches one directory
    one = back.filter(F.col("chan") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == vis.filter(F.col("chan") == 3).count()


def test_merge_column_update_partition_scoped(spark, sf_dir, tmp_path):
    """MERGE-style MODEL_DATA update: only touched partitions rewritten,
    matched rows updated, unmatched rows and untouched partitions intact."""
    import os

    from codex_africanus_spark.sources.sink import merge_column_update

    path = str(tmp_path / "ms_table")
    vis = (
        tpch_ms.vis_table(spark, sf_dir)
        .filter("row_id % 5 = 0")
        # lineitem carries duplicate (row_id, a1, a2, chan) keys
        # (FIXTURES.md) — a MERGE key must be unique
        .dropDuplicates(["row_id", "antenna1", "antenna2", "chan"])
        .select(
            "row_id", "antenna1", "antenna2", "chan", "vis_re", "vis_im",
            (F.expr("row_id DIV 8") % 4).cast("int").alias("scan_number"),
            F.lit(0.0).alias("model_re"),
        )
    )
    vis.write.partitionBy("scan_number").parquet(path)

    before = {
        (r.row_id, r.antenna1, r.antenna2, r.chan): r
        for r in spark.read.parquet(path).collect()
    }
    untouched_dir = os.path.join(path, "scan_number=3")
    mtimes_before = {
        f: os.path.getmtime(os.path.join(untouched_dir, f))
        for f in os.listdir(untouched_dir)
    }

    updates = (
        spark.read.parquet(path)
        .filter("scan_number IN (0, 1) AND chan = 2")
        .select(
            "row_id", "antenna1", "antenna2", "chan", "scan_number",
            (F.col("vis_re") * 2).alias("model_re"),
        )
    )
    n_updates = updates.count()
    assert n_updates > 0
    touched = merge_column_update(
        spark, path, updates,
        keys=["row_id", "antenna1", "antenna2", "chan"],
        update_cols=["model_re"],
        partition_by=["scan_number"],
    )
    assert sorted(t[0] for t in touched) == [0, 1]

    after = spark.read.parquet(path).collect()
    assert len(after) == len(before)
    changed = 0
    for r in after:
        b = before[(r.row_id, r.antenna1, r.antenna2, r.chan)]
        if r.scan_number in (0, 1) and r.chan == 2:
            assert r.model_re == b.vis_re * 2
            changed += 1
        else:
            assert r.model_re == b.model_re
        assert r.vis_re == b.vis_re  # non-target columns untouched
    assert changed == n_updates

    # untouched partition files were not rewritten
    mtimes_after = {
        f: os.path.getmtime(os.path.join(untouched_dir, f))
        for f in os.listdir(untouched_dir)
    }
    assert mtimes_after == mtimes_before


def test_merge_column_update_concurrent_multifile_partitions(spark, sf_dir, tmp_path):
    """MERGE under concurrent task-parallel partitions: every partition
    directory holds MULTIPLE parquet files (written by parallel tasks),
    updates span ≥2 partitions, and the staged-rewrite swap must preserve
    full row multiplicity and values across all files — the layout a real
    multi-executor writer produces (reference analogue: xds_to_table
    column update, africanus/rime/examples/predict.py:576-586)."""
    import os

    from codex_africanus_spark.sources.sink import merge_column_update

    path = str(tmp_path / "ms_table_mf")
    vis = (
        tpch_ms.vis_table(spark, sf_dir)
        .filter("row_id % 7 = 0")
        .dropDuplicates(["row_id", "antenna1", "antenna2", "chan"])
        .select(
            "row_id", "antenna1", "antenna2", "chan", "vis_re",
            (F.expr("row_id DIV 16") % 3).cast("int").alias("scan_number"),
            F.lit(0.0).alias("model_re"),
        )
        .repartition(6)  # >1 file per partition directory
    )
    vis.write.partitionBy("scan_number").parquet(path)
    for scan in (0, 1, 2):
        files = [
            f for f in os.listdir(os.path.join(path, f"scan_number={scan}"))
            if f.endswith(".parquet")
        ]
        assert len(files) > 1, f"scan {scan} must be multi-file for this test"

    before = {
        (r.row_id, r.antenna1, r.antenna2, r.chan): r
        for r in spark.read.parquet(path).collect()
    }
    updates = (
        spark.read.parquet(path)
        .filter("scan_number IN (0, 2) AND antenna1 = 1")
        .select(
            "row_id", "antenna1", "antenna2", "chan", "scan_number",
            (F.col("vis_re") * 3).alias("model_re"),
        )
        .repartition(4)  # updates arrive task-parallel too
    )
    n_updates = updates.count()
    assert n_updates > 0
    touched = merge_column_update(
        spark, path, updates,
        keys=["row_id", "antenna1", "antenna2", "chan"],
        update_cols=["model_re"],
        partition_by=["scan_number"],
    )
    assert sorted(t[0] for t in touched) == [0, 2]

    after = spark.read.parquet(path).collect()
    assert len(after) == len(before)  # no row lost or duplicated across files
    changed = 0
    for r in after:
        b = before[(r.row_id, r.antenna1, r.antenna2, r.chan)]
        if r.scan_number in (0, 2) and r.antenna1 == 1:
            assert r.model_re == b.vis_re * 3
            changed += 1
        else:
            assert r.model_re == b.model_re
        assert r.vis_re == b.vis_re
    assert changed == n_updates
