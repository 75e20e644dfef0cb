"""Property-based tests for the round-7 kernels: cross-engine rounding,
Morton interleave bijectivity, the hand-expanded D-term algebra, and
end-to-end incremental-ingest correctness on random corpora."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="session")
def spark_h(spark):
    # session-scoped alias: hypothesis re-invokes the test body many
    # times per example set and must not rebuild fixtures
    return spark


finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=25, deadline=None)
@given(x=finite)
def test_quantize_matches_duckdb_round(spark_h, x):
    """quantize() (sign-aware ±0.5 trunc) must equal DuckDB's
    CAST(ROUND(x·s) AS BIGINT) for every double — THE cross-engine
    contract every oracle relies on."""
    from codex_africanus_spark.functions.deterministic import quantize

    got = spark_h.range(1).select(
        quantize(F.lit(x), 1e6).alias("q")
    ).collect()[0].q
    want = duckdb.connect().execute(
        "SELECT CAST(ROUND(CAST(? AS DOUBLE) * 1000000.0) AS BIGINT)", [x]
    ).fetchone()[0]
    assert got == want, (x, got, want)


@settings(max_examples=15, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=255),
    b=st.integers(min_value=0, max_value=255),
)
def test_zorder_interleave_bijective(spark_h, a, b):
    """Morton code must be the exact bit interleave (recoverable by
    de-interleaving), so distinct (a, b) → distinct z."""
    from codex_africanus_spark.sources.snapshot import zorder_column

    z = spark_h.range(1).select(
        zorder_column(F.lit(a), F.lit(b), bits=8).alias("z")
    ).collect()[0].z
    ra = rb = 0
    for i in range(8):
        rb |= ((z >> (2 * i)) & 1) << i
        ra |= ((z >> (2 * i + 1)) & 1) << i
    assert (ra, rb) == (a, b), (a, b, z)


cplx = st.tuples(
    st.floats(min_value=-10, max_value=10, allow_nan=False),
    st.floats(min_value=-10, max_value=10, allow_nan=False),
)


@settings(max_examples=15, deadline=None)
@given(d1=cplx, d2=cplx, vxx=cplx, vyy=cplx)
def test_dterm_expansion_matches_jones_chain(spark_h, d1, d2, vxx, vyy):
    """The hand-expanded leakage formulas in polarization_leakage_apply
    must equal the generic Jones2x2 chain D1·diag(V)·D2ᴴ (the expansion
    exists only to pin float association order for the oracle — it must
    not change the algebra)."""
    from codex_africanus_spark.functions.complex_algebra import Cplx
    from codex_africanus_spark.functions.jones import Jones2x2, jones_chain

    def C(t):
        return Cplx(F.lit(t[0]), F.lit(t[1]))

    def dterm(t):
        return Jones2x2(
            Cplx(F.lit(1.0), F.lit(0.0)), C(t),
            C(t).conj() * F.lit(-1.0), Cplx(F.lit(1.0), F.lit(0.0)),
        )

    v = Jones2x2.diagonal(C(vxx), C(vyy))
    out = jones_chain(dterm(d1), v, dterm(d2))
    d1r, d1i = d1
    d2r, d2i = d2
    xr, xi = vxx
    yr, yi = vyy
    er, ei = d1r * d2r + d1i * d2i, d1i * d2r - d1r * d2i
    fr, fi = d1r * d2r + d1i * d2i, d1r * d2i - d1i * d2r
    want = {
        "xx_re": xr + (er * yr - ei * yi),
        "xx_im": xi + (er * yi + ei * yr),
        "xy_re": -(d2r * xr - d2i * xi) + (d1r * yr - d1i * yi),
        "xy_im": -(d2r * xi + d2i * xr) + (d1r * yi + d1i * yr),
        "yx_re": -(d1r * xr + d1i * xi) + (d2r * yr + d2i * yi),
        "yx_im": -(d1r * xi - d1i * xr) + (d2r * yi - d2i * yr),
        "yy_re": (fr * xr - fi * xi) + yr,
        "yy_im": (fr * xi + fi * xr) + yi,
    }
    row = spark_h.range(1).select(
        *out.xx.alias_pair("xx"), *out.xy.alias_pair("xy"),
        *out.yx.alias_pair("yx"), *out.yy.alias_pair("yy"),
    ).collect()[0]
    for k, v_ in want.items():
        assert abs(getattr(row, k) - v_) < 1e-9, (k, getattr(row, k), v_)


WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_incremental_ingest_matches_bruteforce_random(spark_h, tmp_path_factory, seed):
    """End-to-end property on RANDOM corpora: the prefix+positional-
    filtered, index-probing ingest decision must equal brute-force exact
    jaccard >= 1/2 against the base stratum — for any token sets, any
    df ties, any prefix composition."""
    from codex_africanus_spark.operators import dedup as dedup_op

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(24):
        n = rng.randint(0, 12)
        text = " ".join(WORDS[rng.randint(len(WORDS))] for _ in range(n))
        rows.append((i, text, "en", "src0", len(text)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    docs = spark_h.createDataFrame(pdf)
    root = str(tmp_path_factory.mktemp("ingprop") / f"r{seed}")
    got = {
        r.doc_id: r.is_dup
        for r in dedup_op.incremental_dedup_ingest(spark_h, docs, root).collect()
    }

    def shingles(t):
        w = t.split(" ")
        return (
            {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
            if len(w) >= 3 else set()
        )

    base = {
        r[0]: shingles(r[1])
        for r in rows if r[0] % dedup_op.INGEST_MODULUS != 0
    }
    for r in rows:
        if r[0] % dedup_op.INGEST_MODULUS != 0:
            continue
        s = shingles(r[1])
        dup = any(
            s and b and 3 * len(s & b) >= len(s) + len(b)
            for b in base.values()
        )
        assert got[r[0]] == int(dup), (seed, r[0])
