"""Streaming SumThreshold (r9, ROADMAP candidate): the per-(baseline,
chan) SumThreshold tier as a stateful streaming operator.

A cell's flag decision reads up to THREE FUTURE cells (the M=4 window
anchored at it), so the operator is exactly the "bins close on
data-dependent future evidence" shape applyInPandasWithState exists
for: per key it carries the trailing cell buffer (three finalized
context cells for the lag terms + the undecided tail), finalizes every
cell once three successors exist, re-emits the undecided tail as
provisional rows each batch (update-mode upsert, the streaming_bda
contract), and an event-time idle timeout finalizes the tail with
end-of-series semantics (incomplete windows score 0 — exactly the batch
operator's boundary behavior).

Parity contract: the finalized rows reproduce
``operators/flagging.sumthreshold_cell_flags`` bit-for-bit on ordered
cell input (tests/test_streaming_sumthreshold.py, batch-split fuzz).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from codex_africanus_spark.operators.flagging import st_thresholds

ST_OUTPUT_SCHEMA = (
    "antenna1 int, antenna2 int, chan int, time double, mean_mq long, "
    "f1 int, f2 int, f4 int, fany int, closed boolean"
)
# trailing buffer: up to 3 finalized context cells + up to 3 undecided
ST_STATE_SCHEMA = (
    "times array<double>, means array<long>, n_ctx int"
)


def streaming_sumthreshold(
    cell_stream: DataFrame,
    idle_timeout_secs: float | None = None,
) -> DataFrame:
    """cell_stream: (antenna1, antenna2, chan, time, mean_mq) cell-grid
    rows, time-ordered per key across batches (the collapsed output of
    ``operators/flagging._cells`` — the same ordered-cell contract the
    batch windows assume)."""
    th = st_thresholds()
    th1, th2x2, th4x4 = th[1], 2 * th[2], 4 * th[4]

    def update(key, pdfs, state: GroupState):
        # self-contained closure (executors cannot import this package)
        import numpy as np
        import pandas as _pd

        cols = ["antenna1", "antenna2", "chan", "time", "mean_mq",
                "f1", "f2", "f4", "fany", "closed"]
        a1, a2, ch = key
        if state.exists:
            bt, bm, n_ctx = state.get
            bt, bm = list(bt), list(bm)
        else:
            bt, bm, n_ctx = [], [], 0

        def flags(t, m, end_of_series):
            """Vectorized tier flags over the buffer series t/m.
            Windows needing cells past the head are incomplete: they
            score 0 — final if end_of_series, else only cells with
            three successors may be treated as final."""
            n = len(m)
            m = np.asarray(m, dtype=np.int64)
            h2 = np.zeros(n, dtype=np.int64)
            h4 = np.zeros(n, dtype=np.int64)
            if n >= 2:
                h2[: n - 1] = (m[:-1] + m[1:] > th2x2).astype(np.int64)
            if n >= 4:
                s4 = m[:-3] + m[1:-2] + m[2:-1] + m[3:]
                h4[: n - 3] = (s4 > th4x4).astype(np.int64)
            f1 = (m > th1).astype(np.int64)
            pad2 = np.concatenate(([0], h2[:-1])) if n else h2
            f2 = np.maximum(h2, pad2)
            f4 = h4.copy()
            for k in (1, 2, 3):
                pad = np.concatenate((np.zeros(k, np.int64), h4[:-k])) if n > k else np.zeros(n, np.int64)
                f4 = np.maximum(f4, pad)
            fany = np.maximum(f1, np.maximum(f2, f4))
            return f1, f2, f4, fany

        frames = []

        def emit(idx_from, idx_to, t, m, fl, closed):
            if idx_to <= idx_from:
                return
            f1, f2, f4, fany = fl
            k = idx_to - idx_from
            sl = slice(idx_from, idx_to)
            frames.append(_pd.DataFrame({
                "antenna1": np.full(k, int(a1), dtype="int32"),
                "antenna2": np.full(k, int(a2), dtype="int32"),
                "chan": np.full(k, int(ch), dtype="int32"),
                "time": np.asarray(t[sl], dtype="float64"),
                "mean_mq": np.asarray(m[sl], dtype="int64"),
                "f1": f1[sl].astype("int32"), "f2": f2[sl].astype("int32"),
                "f4": f4[sl].astype("int32"),
                "fany": fany[sl].astype("int32"),
                "closed": np.full(k, closed, dtype=bool),
            }))

        def result():
            if frames:
                return _pd.concat(frames, ignore_index=True)
            return _pd.DataFrame(columns=cols)

        if idle_timeout_secs is not None and state.hasTimedOut:
            # end-of-series flush: incomplete windows score 0 — the
            # batch operator's boundary semantics
            fl = flags(bt, bm, end_of_series=True)
            emit(n_ctx, len(bm), bt, bm, fl, True)
            state.remove()
            yield result()
            return

        # collect ALL Arrow chunks first, then sort ONCE: the groupBy
        # shuffle behind applyInPandasWithState orders by key only, so a
        # key whose batch rows span multiple chunks (> Arrow batch size)
        # gives no cross-chunk time order — per-chunk sorting would build
        # a non-monotone buffer and silently corrupt the f1/f2/f4 window
        # decisions (r9 ADVICE, medium)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = _pd.concat(chunks, ignore_index=True).sort_values("time")
            bt.extend(float(x) for x in batch["time"])
            bm.extend(int(x) for x in batch["mean_mq"])
        # NOTE: the lag terms f2/f4 of the first cells in the buffer
        # reference h values of the context cells (kept in bt/bm), so
        # the buffer always re-evaluates the WHOLE local window — cheap,
        # it never exceeds (3 context + undecided tail + batch).
        fl = flags(bt, bm, end_of_series=False)
        n = len(bm)
        n_final = max(n_ctx, n - 3)  # cells with >= 3 successors finalize
        emit(n_ctx, n_final, bt, bm, fl, True)
        emit(n_final, n, bt, bm, fl, False)  # provisional tail (upsert)
        # retain 3 finalized context cells + the undecided tail
        keep_from = max(0, n_final - 3)
        bt, bm = bt[keep_from:], bm[keep_from:]
        n_ctx = n_final - keep_from
        state.update((bt, bm, int(n_ctx)))
        if idle_timeout_secs is not None and bt:
            state.setTimeoutTimestamp(
                int((bt[-1] + idle_timeout_secs) * 1000)
            )
        yield result()

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_timeout_secs is not None
        else GroupStateTimeout.NoTimeout
    )
    return cell_stream.groupBy(
        "antenna1", "antenna2", "chan"
    ).applyInPandasWithState(
        update,
        outputStructType=ST_OUTPUT_SCHEMA,
        stateStructType=ST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
