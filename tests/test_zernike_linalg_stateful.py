import numpy as np
import pytest

from codex_africanus_spark.functions import linalg as kla
from codex_africanus_spark.operators import zernike as z_op
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.streaming import stateful, windowed

from tests.conftest import await_done


def test_zernike_matches_numpy(spark):
    """Spark pandas-UDF evaluation vs direct NumPy (backend-equivalence,
    SURVEY §5 item 5)."""
    coeffs = [1.0, 0.3, -0.2, 0.1]
    nolls = [1, 2, 3, 4]
    pts = [(i, -0.08 + 0.008 * i, 0.07 - 0.006 * i) for i in range(20)]
    df = spark.createDataFrame(pts, "id int, l double, m double")
    out = z_op.zernike_dde(df, coeffs, nolls).orderBy("id").toPandas()

    l = np.array([p[1] for p in pts]) / 0.1
    m = np.array([p[2] for p in pts]) / 0.1
    rho, theta = np.sqrt(l * l + m * m), np.arctan2(m, l)
    expected = np.zeros(len(pts))
    for c, j in zip(coeffs, nolls):
        n_, m_ = z_op.noll_to_nm(j)
        expected += c * z_op.zernike_eval(n_, m_, rho, theta)
    np.testing.assert_allclose(out.zernike_gain.to_numpy(), expected, rtol=1e-10)


def test_kron_matvec_matches_dense():
    rng = np.random.default_rng(11)
    As = [rng.standard_normal((3, 3)), rng.standard_normal((4, 4)), rng.standard_normal((2, 2))]
    x = rng.standard_normal(24)
    dense = np.kron(np.kron(As[0], As[1]), As[2])
    np.testing.assert_allclose(kla.kron_matvec(As, x), dense @ x, rtol=1e-10)


def test_kron_cholesky_property():
    rng = np.random.default_rng(5)
    mk = lambda n: (lambda a: a @ a.T + n * np.eye(n))(rng.standard_normal((n, n)))  # noqa: E731
    As = [mk(3), mk(2)]
    Ls = kla.kron_cholesky(As)
    dense = np.kron(As[0], As[1])
    Lk = np.kron(Ls[0], Ls[1])
    np.testing.assert_allclose(Lk @ Lk.T, dense, rtol=1e-9)


def test_convex_hull_mask_square():
    square = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    q = np.array([[0.5, 0.5], [2.0, 0.5], [-0.1, 0.2], [0.99, 0.01]])
    np.testing.assert_array_equal(
        kla.convex_hull_mask(square, q), [True, False, False, True]
    )


@pytest.mark.slow
def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState over the events stream: cumulative per-user
    totals must equal the batch aggregate after AvailableNow drains."""
    stream = windowed.read_events_stream(spark, sf_dir)
    out = stateful.running_user_totals(stream.select("user_id", "value"))
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = spark.sql(
        "SELECT user_id, max(n_events) n, max(value_sum_q) vq FROM stateful_totals GROUP BY user_id"
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    ev = tpch_ms.events_table(spark, sf_dir).toPandas()
    batch = (
        ev.groupby("user_id")
        .agg(n=("event_id", "count"))
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert (got.n.to_numpy() == batch.n.to_numpy()).all()
