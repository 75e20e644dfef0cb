"""Custom stateful streaming operator — applyInPandasWithState.

The streaming analogue of the BDA binner (SURVEY §2.10): per-key state
carried across micro-batches with an explicit timeout, the shape the
reference's decorrelation-bounded Binner needs when bins must close on
*data-dependent* conditions rather than fixed windows (session_window
covers only the gap rule).

This operator maintains a running per-user accumulator: event count and
exact fixed-point value sum, emitting one row per key per micro-batch
with the updated totals — the minimal demonstration of the state-store
round-trip (GroupState get/update/timeout) that a production BDA
streaming binner builds on.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum_q long"
STATE_SCHEMA = "n long, vq long"

BDA_OUTPUT_SCHEMA = (
    "antenna1 int, antenna2 int, bin_idx long, n_rows long, "
    "time_start double, time_end double, vis_re_avg double, "
    "vis_im_avg double, weight_sum double, closed boolean"
)
# the open bin's full accumulator — what the reference's Binner jitclass
# holds between add_row calls (bda_mapping.py:111-186), persisted here in
# the state store between micro-batches
BDA_STATE_SCHEMA = (
    "bin_idx long, start_t double, prev_u double, prev_v double, "
    "prev_w double, acc_motion double, n long, t_min double, t_max double, "
    "wsum double, vre_w double, vim_w double"
)


def streaming_bda(
    vis_stream: DataFrame,
    decorr_tol: float = 500.0,
    max_span_secs: float = 2_592_000.0,
    idle_timeout_secs: float | None = None,
) -> DataFrame:
    """True streaming BDA (ROADMAP #3): the decorrelation accumulator of
    operators/bda.py carried across micro-batches per baseline via
    applyInPandasWithState.

    Same closure rule as the batch operator — accumulate rows while
    Σ|Δuvw| ≤ decorr_tol and the span ≤ max_span_secs — with the open
    bin's accumulator persisted in the state store, so a baseline's bin
    can span any number of micro-batches. Closed bins are emitted with
    ``closed=true`` (immutable thereafter); the open bin is re-emitted
    each batch with ``closed=false`` (update-mode upsert). Rows must
    arrive time-ordered per key across batches (the reference's
    monotone-time row contract, predict.py:688 / SURVEY §2.10 — late
    rows would belong to an emitted bin and are the flagged-row case).

    With ``idle_timeout_secs`` set, a baseline whose watermark passes
    `last row time + idle_timeout_secs` without new rows has its open
    bin FLUSHED as closed via GroupState event-time timeout — the input
    stream must then carry a watermarked ``event_time`` timestamp
    column built as timestamp_seconds(time) (caller does
    ``withWatermark``); without a timeout, idle baselines hold their
    last bin open until more data arrives."""

    def update(key, pdfs, state: GroupState):
        # self-contained closure (executors cannot import this package)
        import pandas as _pd

        cols = ["antenna1", "antenna2", "bin_idx", "n_rows",
                "time_start", "time_end", "vis_re_avg", "vis_im_avg",
                "weight_sum", "closed"]
        a1, a2 = key
        if state.exists:
            (bin_idx, start_t, pu, pv, pw, acc, n,
             t_min, t_max, wsum, vre_w, vim_w) = state.get
        else:
            bin_idx, start_t = 0, None
            pu = pv = pw = acc = 0.0
            n, t_min, t_max, wsum, vre_w, vim_w = 0, 0.0, 0.0, 0.0, 0.0, 0.0
        out = []

        def emit(is_closed):
            out.append((int(a1), int(a2), int(bin_idx), int(n), t_min, t_max,
                        vre_w / wsum, vim_w / wsum, wsum, is_closed))

        if idle_timeout_secs is not None and state.hasTimedOut:
            # idle flush: the watermark passed the open bin's deadline
            if n > 0:
                emit(True)
            state.remove()
            yield _pd.DataFrame(out, columns=cols)
            return

        for pdf in pdfs:
            for r in pdf.sort_values(
                ["time", "row_id", "u", "v", "w", "vis_re"]
            ).itertuples():
                if start_t is None:
                    start_t, acc = r.time, 0.0
                else:
                    acc += abs(r.u - pu) + abs(r.v - pv) + abs(r.w - pw)
                    if acc > decorr_tol or (r.time - start_t) > max_span_secs:
                        emit(True)
                        bin_idx += 1
                        start_t, acc = r.time, 0.0
                        n, wsum, vre_w, vim_w = 0, 0.0, 0.0, 0.0
                if n == 0:
                    t_min = t_max = r.time
                n += 1
                t_min, t_max = min(t_min, r.time), max(t_max, r.time)
                wsum += r.weight
                vre_w += r.vis_re * r.weight
                vim_w += r.vis_im * r.weight
                pu, pv, pw = r.u, r.v, r.w
        if n > 0:
            emit(False)  # provisional open bin — upserted next batch
        state.update((bin_idx, start_t if start_t is not None else 0.0,
                      pu, pv, pw, acc, n, t_min, t_max, wsum, vre_w, vim_w))
        if idle_timeout_secs is not None and n > 0:
            # flush deadline in event time: last row + idle window
            state.setTimeoutTimestamp(int((t_max + idle_timeout_secs) * 1000))
        yield _pd.DataFrame(out, columns=cols)

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_timeout_secs is not None
        else GroupStateTimeout.NoTimeout
    )
    return vis_stream.groupBy("antenna1", "antenna2").applyInPandasWithState(
        update,
        outputStructType=BDA_OUTPUT_SCHEMA,
        stateStructType=BDA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events: streaming frame with (user_id, value). Emits cumulative
    (n_events, fixed-point value sum) per user per micro-batch."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        # self-contained closure (executors cannot import this package)
        n, vq = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vq += int(round(float(pdf["value"].sum()) * 1e6))
        state.update((n, vq))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum_q": [vq]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
