"""TRUE-Spark watermark parity: the real `withWatermark` windowed
aggregation (streaming/windowed.streaming_window_drop) vs the exact
batch replay (operators/watermark.window_drop_replay) that backs the
registered `events_watermark_window_drop` oracle.

The replay encodes three empirically-bisected rules (one-batch filter
lag, inclusive window-end drop boundary, inclusive finalization
boundary). These tests are the lock: if a Spark upgrade changes any of
them, the parity here fails — the oracle never silently forks from the
engine.

Arrival-time control: arrival = ts + (event_id % 7) * jitter, so each
crafted corpus picks event_id residues to land rows in chosen arrival
batches (the same derivation the stager and the replay share)."""

import pandas as pd

from codex_africanus_spark.operators import watermark as wm_op
from codex_africanus_spark.streaming import windowed
import pytest

# Heavyweight end-to-end rehearsal: excluded from the default (driver-budget)
# selection; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow

H = 3_600_000_000
M = 60_000_000


def _mk_events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts_us", "value"]),
        "event_id long, ts_us long, value double",
    )


def _parity(spark, ev, tmp_path, name, jitter_us, batch_us,
            delay_us=wm_op.WM_DELAY_US, hour_us=wm_op.WM_HOUR_US):
    """Run both sides and compare: streaming finalized table ==
    replay's is_emitted subset (bit-exact), and the engine's
    numRowsDroppedByWatermark == the replay's dropped BUFFER-row count
    (distinct (trigger, window) pairs — the metric increments after
    map-side partial aggregation; see window_drop_tagged)."""
    src = str(tmp_path / f"{name}_src")
    ck = str(tmp_path / f"{name}_ck")
    windowed.stage_arrival_batches(ev, src, jitter_us, batch_us)
    got, dropped = windowed.streaming_window_drop(
        spark, src, ck, delay_us, hour_us, name=name
    )
    replay = wm_op.window_drop_replay(
        ev, jitter_us, batch_us, delay_us, hour_us
    ).toPandas()
    want = (
        replay[replay.is_emitted == 1][["hour_bin", "n_events", "val_c_sum"]]
        .astype("int64")
        .reset_index(drop=True)
    )
    got_pdf = (
        got.toPandas()
        .sort_values("hour_bin")
        .astype("int64")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_pdf, want, check_dtype=True)
    tagged = wm_op.window_drop_tagged(
        ev, jitter_us, batch_us, delay_us, hour_us
    ).toPandas()
    want_dropped = tagged[tagged.dropped][["b", "hour_bin"]].drop_duplicates()
    assert dropped == len(want_dropped), name
    return replay.set_index("hour_bin")


def test_lag_and_inclusive_drop_boundary(spark, tmp_path):
    """jitter 1h, hourly batches, 2h delay. Trigger 0 (b=11) commits
    wm 9h. Trigger 1 (b=12) carries a window-[8,9) row: its lagged
    filter watermark is still 0 -> KEPT (no-lag semantics would drop
    it). Trigger 2 (b=13) carries another [8,9) row: lagged wm is now
    exactly 9h == window end -> DROPPED (inclusive boundary)."""
    ev = _mk_events(
        spark,
        [
            (0, 11 * H, 1.0),           # id%7=0: arrival 11h   -> b=11
            (1, 11 * H + 30 * M, 1.0),  # id%7=1: arrival 12h30 -> b=12
            (4, 8 * H + 10 * M, 5.0),   # id%7=4: arrival 12h10 -> b=12
            (12, 8 * H + 30 * M, 7.0),  # id%7=5: arrival 13h30 -> b=13
        ],
    )
    by_bin = _parity(spark, ev, tmp_path, "lag_drop", H, H)
    assert by_bin.loc[8, "n_events"] == 1           # id 4 kept by the lag
    assert by_bin.loc[8, "n_late_dropped"] == 1     # id 12 dropped at ==wm
    assert by_bin.loc[8, "val_c_sum"] == 500
    # final wm = 11h30 - 2h = 9h30: [8,9) emits, [11,12) stays in state
    assert by_bin.loc[8, "is_emitted"] == 1
    assert by_bin.loc[11, "is_emitted"] == 0
    assert by_bin.loc[11, "n_events"] == 2


def test_inclusive_finalization_boundary(spark, tmp_path):
    """A window whose end EQUALS the terminal watermark finalizes on
    the availableNow flush batch (inclusive emission boundary)."""
    ev = _mk_events(
        spark,
        [
            (0, 10 * H + 30 * M, 2.0),  # window [10,11), arrival b=10
            (1, 13 * H, 1.0),           # arrival 14h -> b=14; final wm 11h
        ],
    )
    by_bin = _parity(spark, ev, tmp_path, "final_eq", H, H)
    assert by_bin.loc[10, "is_emitted"] == 1        # end 11h == final wm
    assert by_bin.loc[13, "is_emitted"] == 0


def test_streaming_parity_on_events_corpus(spark, sf_dir, tmp_path):
    """The real corpus through real triggers: 2-day arrival batches
    (~16 triggers at sf0.001) with the registered query's jitter/delay/
    window constants — Spark's own filter + finalization vs the
    replay."""
    from codex_africanus_spark.sources import tpch_ms

    ev = tpch_ms.events_table(spark, sf_dir).select(
        "event_id", "ts_us", "value"
    )
    _parity(spark, ev, tmp_path, "corpus_parity", wm_op.WM_JITTER_US,
            48 * H)


def test_streaming_parity_fuzz_arrival_patterns(spark, tmp_path):
    """Adversarial arrival fuzz: seeded corpora with heavy jitter (rows
    land many batches late), boundary-aligned timestamps (exact
    window-end multiples), and sub-ms microsecond offsets (exercising
    the ms-truncation-neutrality argument in the module docstring)."""
    import numpy as np

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = 200
        ts = (
            rng.integers(5, 72, n) * H
            + rng.integers(0, 60, n) * M
            + rng.integers(0, 1000, n)          # sub-ms µs offsets
        )
        ts[:20] = (ts[:20] // H) * H            # exact window boundaries
        rows = [
            (int(i), int(ts[i]), float(rng.integers(0, 100)) / 10.0)
            for i in range(n)
        ]
        ev = _mk_events(spark, rows)
        replay = _parity(
            spark, ev, tmp_path, f"fuzz_{seed}", 5 * H, 3 * H
        )
        assert replay.n_late_dropped.sum() > 0, (
            f"seed {seed}: fuzz corpus must exercise the drop rule"
        )
