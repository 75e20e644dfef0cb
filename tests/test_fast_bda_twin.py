"""The anchor-chain BDA replay (_SBDA_FAST_TWIN) must be bit-equal to
the per-row recursive oracle (_SBDA_ORACLE) — it is the TIMED DuckDB
twin recorded in BASELINE.md, so divergence would corrupt the 2x-gate
measurement. Pure-DuckDB test (no Spark session needed)."""

import duckdb
import pandas as pd

from codex_africanus_spark.queries import msops
import pytest

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    return con


def test_fast_twin_bit_equal_sf0001():
    con = _con("/root/testdata/sf0.001")
    slow = con.execute(msops._SBDA_ORACLE).df()
    fast = con.execute(msops._SBDA_FAST_TWIN).df()
    assert len(slow) > 100
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_fast_twin_bit_equal_sf001():
    con = _con("/root/testdata/sf0.01")
    slow = con.execute(msops._SBDA_ORACLE).df()
    fast = con.execute(msops._SBDA_FAST_TWIN).df()
    assert len(slow) > 1000
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


# ---- r11: anchor-chain twins for the two accumulator-free tier-3 ----
# oracles (time-bin span rule; sinc anchor-relative closure). The
# closure rule reads only (candidate, anchor), so first-violator
# anchor recursion is decision-identical to the per-row replay — these
# tests lock that bit-exactly at two scales; tools/sf1_bda_partial.py
# runs the same equality at sf1.0 for the BASELINE.md record.


def test_seq_bin_fast_twin_bit_equal_sf0001():
    con = _con("/root/testdata/sf0.001")
    slow = con.execute(msops._SEQ_BIN_ORACLE).df()
    fast = con.execute(msops._SEQ_BIN_FAST_TWIN).df()
    assert len(slow) > 50
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_seq_bin_fast_twin_bit_equal_sf001():
    con = _con("/root/testdata/sf0.01")
    slow = con.execute(msops._SEQ_BIN_ORACLE).df()
    fast = con.execute(msops._SEQ_BIN_FAST_TWIN).df()
    assert len(slow) > 500
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_sinc_fast_twin_bit_equal_sf0001():
    con = _con("/root/testdata/sf0.001")
    slow = con.execute(msops._BDA_SINC_ORACLE).df()
    fast = con.execute(msops._BDA_SINC_FAST_TWIN).df()
    assert len(slow) > 50
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_sinc_fast_twin_bit_equal_sf001():
    con = _con("/root/testdata/sf0.01")
    slow = con.execute(msops._BDA_SINC_ORACLE).df()
    fast = con.execute(msops._BDA_SINC_FAST_TWIN).df()
    assert len(slow) > 500
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_partial_oracle_rewrites_slice_once():
    sql = msops.bda_partial_oracle(msops._BDA_ORACLE, 85)
    assert "% 85 = 0" in sql and "% 17 = 0" not in sql


# ---- r12: EXACT tie-resolving twins for the two FLOAT-accumulator ----
# oracles (deci-grid anchor chain; decimal ties decided by replaying
# the double fold over the bin window — msops.py section comment).
# These retire tools/sf1_bda_partial.py's 85% gate for the two queries.


def test_float_plain_twin_bit_equal_sf0001():
    con = _con("/root/testdata/sf0.001")
    slow = con.execute(msops._BDA_ORACLE).df()
    fast = con.execute(msops._BDA_PLAIN_FAST_TWIN).df()
    assert len(slow) > 100
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_float_plain_twin_bit_equal_sf001():
    """sf0.01 is the scale where the pre-exact est-prototype FORKED
    (1460 vs 1459 bins) — the tie resolution must hold here."""
    con = _con("/root/testdata/sf0.01")
    slow = con.execute(msops._BDA_ORACLE).df()
    fast = con.execute(msops._BDA_PLAIN_FAST_TWIN).df()
    assert len(slow) > 1000
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_float_ragged_twin_bit_equal_sf0001():
    con = _con("/root/testdata/sf0.001")
    slow = con.execute(msops._BDA_RAGGED_ORACLE).df()
    fast = con.execute(msops._BDA_RAGGED_FAST_TWIN).df()
    assert len(slow) > 100
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_float_ragged_twin_bit_equal_sf001():
    con = _con("/root/testdata/sf0.01")
    slow = con.execute(msops._BDA_RAGGED_ORACLE).df()
    fast = con.execute(msops._BDA_RAGGED_FAST_TWIN).df()
    assert len(slow) > 1000
    pd.testing.assert_frame_equal(
        slow.reset_index(drop=True), fast.reset_index(drop=True)
    )


def test_decomposed_float_twins_bit_equal_both_scales():
    """The big-scale decomposed form (scalar-temp-table recursion,
    precomputed tie tables) must match the oracles exactly where the
    inline twins do — the tool's sf1 evidence rests on this parity."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
        )
        for ragged, oracle in (
            (False, msops._BDA_ORACLE),
            (True, msops._BDA_RAGGED_ORACLE),
        ):
            setups, twin = msops.bda_fast_twin_decomposed(ragged)
            for st in setups:
                con.execute(st)
            fast = con.execute(twin).df()
            slow = con.execute(oracle).df()
            assert len(fast) > 100
            pd.testing.assert_frame_equal(
                slow.reset_index(drop=True), fast.reset_index(drop=True)
            )
