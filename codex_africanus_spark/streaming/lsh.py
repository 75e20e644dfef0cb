"""Streaming LSH near-dup candidate gate (SURVEY §2.10 extension).

The batch dedup ladder's candidate tier (operators/dedup.minhash_lsh_pairs)
answers "which document pairs are near-dup candidates" over a corpus at
rest. The live form — "is this arriving document a near-duplicate of
anything ingested recently?" — is a *stream-stream self-join* on the LSH
band keys: MinHash signatures are pure projections (no aggregation), so
they compute identically on a stream, and the banded frames join on
(band, band_key) with an event-time bound + watermarks so the state store
retains only the dedup horizon, not all history.

Kappa parity: `lsh_candidates_batch` applies the IDENTICAL banding
expressions (imported from the batch operator — parity by construction,
same discipline as streaming/sketches) and the identical join condition
to frames at rest; the tests assert the stream over micro-batches equals
the batch pass row-for-row.

At 100 TB/day the state per side is ingest-rate × horizon banded rows —
independent of corpus history, which is what makes a streaming dedup
gate feasible where the batch self-join would rescan the archive. The
candidate pairs feed the same downstream verify tier (exact Jaccard /
keep-best) as the batch ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.operators.dedup import lsh_banded

HORIZON = "1 hour"
WATERMARK = "2 hours"


def _banded_stream(docs: DataFrame, time_col: str) -> DataFrame:
    """Band-keyed frame of a document stream: the batch operator's
    signature + banding expressions (projection-only, stream-safe), with
    the event time riding the projection (`keep=`) — no re-join."""
    return lsh_banded(docs, keep=(time_col,)).select(
        "doc_id", "band", "band_key", time_col
    )


def _horizon_join_cond(horizon: str):
    """The ONE place the horizon-bounded candidate-join condition lives
    (shared by the stream and its batch twin — parity by construction,
    same discipline as operators/dedup._pairs_from_banded). Expects the
    sides to expose (band, band_key, doc_a, t_a) / (band_b, band_key_b,
    doc_b, t_b)."""
    return (
        (F.col("band") == F.col("band_b"))
        & (F.col("band_key") == F.col("band_key_b"))
        & (F.col("doc_a") < F.col("doc_b"))
        & (F.col("t_b") >= F.col("t_a") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("t_b") <= F.col("t_a") + F.expr(f"INTERVAL {horizon}"))
    )


def _pair_sides(banded: DataFrame, time_col: str):
    a = banded.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key",
        F.col(time_col).alias("t_a"),
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"),
        F.col("band_key").alias("band_key_b"),
        F.col(time_col).alias("t_b"),
    )
    return a, b


def streaming_lsh_candidates(
    stream: DataFrame,
    time_col: str = "event_time",
    horizon: str = HORIZON,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Near-dup candidate pairs among documents arriving within `horizon`
    of each other: stream-stream self-join on (band, band_key), bounded
    by watermarks. Emits (doc_a, doc_b, t_a) with doc_a < doc_b; the
    cross-band dedup uses dropDuplicatesWithinWatermark so its state
    store is ALSO horizon-bounded (a plain dropDuplicates would retain
    every pair ever emitted — unbounded state on a production stream,
    the exact failure the module exists to avoid)."""
    banded_a, banded_b = (
        _banded_stream(stream, time_col),
        _banded_stream(stream, time_col),
    )
    a, _ = _pair_sides(banded_a, time_col)
    _, b = _pair_sides(banded_b, time_col)
    pairs = a.withWatermark("t_a", watermark).join(
        b.withWatermark("t_b", watermark), _horizon_join_cond(horizon)
    )
    return pairs.select("doc_a", "doc_b", "t_a").dropDuplicatesWithinWatermark(
        ["doc_a", "doc_b"]
    )


def lsh_candidates_batch(
    docs: DataFrame, time_col: str = "event_time", horizon: str = HORIZON
) -> DataFrame:
    """Batch twin over a frame at rest: identical banding expressions
    and join condition (shared helpers), for backfill and the parity
    tests. Pair-distinct here is global — frames at rest have no state
    bound to respect."""
    a, b = _pair_sides(_banded_stream(docs, time_col), time_col)
    pairs = a.join(b, _horizon_join_cond(horizon))
    return pairs.select("doc_a", "doc_b").distinct()


# ---------------------------------------------------------------------------
# r11: streaming PARAGRAPH-grain dedup gate (ROADMAP r11 candidate) —
# the streaming_lsh_candidates shape applied BELOW document grain, the
# live form of operators/dedup.paragraph_minhash_dedup (CCNet dedup at
# sub-document granularity): "does this arriving document contain a
# paragraph near-duplicating anything ingested within the horizon?".
# The unit split, MinHash signatures and banding are the BATCH
# operator's own projections (para_units / para_banded_from_units —
# parity by construction); the stream-stream self-join adds the
# horizon bound + the >= 6/8 signature-agreement verify the batch tier
# applies, so a band collision alone is not a match. State per side is
# ingest-rate x horizon BANDED UNIT rows — independent of corpus
# history, like the document-grain gate above.
# ---------------------------------------------------------------------------

from codex_africanus_spark.operators.dedup import (  # noqa: E402
    PARA_SIG_MIN,
    PARA_N_SIGS,
    para_banded_from_units,
    para_sig_agreement,
    para_units,
)


def _para_sides(banded: DataFrame, time_col: str):
    sig = [F.col(f"sig_{k}") for k in range(PARA_N_SIGS)]
    a = banded.select(
        F.col("uid").alias("uid_a"), F.col("doc_id").alias("doc_a"),
        "band", "band_key", F.col(time_col).alias("t_a"),
        *[s.alias(f"a_{k}") for k, s in enumerate(sig)],
    )
    b = banded.select(
        F.col("uid").alias("uid_b"), F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"), F.col("band_key").alias("band_key_b"),
        F.col(time_col).alias("t_b"),
        *[s.alias(f"b_{k}") for k, s in enumerate(sig)],
    )
    return a, b


def _para_match_cond(horizon: str):
    """Horizon join + cross-document + keep-first ordering + the batch
    tier's signature-agreement verify — shared stream/batch."""
    return (
        (F.col("band") == F.col("band_b"))
        & (F.col("band_key") == F.col("band_key_b"))
        & (F.col("uid_a") < F.col("uid_b"))
        & (F.col("doc_a") != F.col("doc_b"))
        & (F.col("t_b") >= F.col("t_a") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("t_b") <= F.col("t_a") + F.expr(f"INTERVAL {horizon}"))
    )


def streaming_paragraph_candidates(
    stream: DataFrame,
    time_col: str = "event_time",
    horizon: str = HORIZON,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Cross-document near-dup PARAGRAPH pairs arriving within
    `horizon` of each other: (uid_a, uid_b, doc_a, doc_b, t_a) with
    uid_a < uid_b, deduplicated across bands within the watermark (the
    same bounded-state argument as streaming_lsh_candidates)."""
    banded = para_banded_from_units(
        para_units(stream, keep=(time_col,)), keep=(time_col,)
    )
    a, _ = _para_sides(banded, time_col)
    _, b = _para_sides(banded, time_col)
    pairs = (
        a.withWatermark("t_a", watermark)
        .join(b.withWatermark("t_b", watermark), _para_match_cond(horizon))
        .filter(para_sig_agreement() >= PARA_SIG_MIN)
    )
    return pairs.select(
        "uid_a", "uid_b", "doc_a", "doc_b", "t_a"
    ).dropDuplicatesWithinWatermark(["uid_a", "uid_b"])


def paragraph_candidates_batch(
    docs: DataFrame, time_col: str = "event_time", horizon: str = HORIZON
) -> DataFrame:
    """Batch twin: identical unit/banding/join/verify expressions over a
    frame at rest; global pair-distinct (no state bound to respect)."""
    banded = para_banded_from_units(
        para_units(docs, keep=(time_col,)), keep=(time_col,)
    )
    a, _ = _para_sides(banded, time_col)
    _, b = _para_sides(banded, time_col)
    pairs = a.join(b, _para_match_cond(horizon)).filter(
        para_sig_agreement() >= PARA_SIG_MIN
    )
    return pairs.select("uid_a", "uid_b", "doc_a", "doc_b").distinct()
