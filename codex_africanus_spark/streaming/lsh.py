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


def streaming_lsh_candidates(
    stream: DataFrame,
    time_col: str = "event_time",
    horizon: str = HORIZON,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Near-dup candidate pairs among documents arriving within `horizon`
    of each other: stream-stream self-join on (band, band_key), bounded
    by watermarks. Emits (doc_a, doc_b) with doc_a < doc_b, distinct
    across bands — the streaming twin of minhash_lsh_pairs' candidate
    set restricted to the horizon."""
    a = (
        _banded_stream(stream, time_col)
        .withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed(time_col, "t_a")
        .withWatermark("t_a", watermark)
    )
    b = (
        _banded_stream(stream, time_col)
        .select(
            F.col("doc_id").alias("doc_b"),
            F.col("band").alias("band_b"),
            F.col("band_key").alias("band_key_b"),
            F.col(time_col).alias("t_b"),
        )
        .withWatermark("t_b", watermark)
    )
    pairs = a.join(
        b,
        (F.col("band") == F.col("band_b"))
        & (F.col("band_key") == F.col("band_key_b"))
        & (F.col("doc_a") < F.col("doc_b"))
        & (F.col("t_b") >= F.col("t_a") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("t_b") <= F.col("t_a") + F.expr(f"INTERVAL {horizon}")),
    )
    return pairs.select("doc_a", "doc_b").dropDuplicates(["doc_a", "doc_b"])


def lsh_candidates_batch(
    docs: DataFrame, time_col: str = "event_time", horizon: str = HORIZON
) -> DataFrame:
    """Batch twin over a frame at rest: identical banding expressions
    and join condition, for backfill and the parity tests."""
    banded = _banded_stream(docs, time_col)
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
    pairs = a.join(
        b,
        (F.col("band") == F.col("band_b"))
        & (F.col("band_key") == F.col("band_key_b"))
        & (F.col("doc_a") < F.col("doc_b"))
        & (F.col("t_b") >= F.col("t_a") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("t_b") <= F.col("t_a") + F.expr(f"INTERVAL {horizon}")),
    )
    return pairs.select("doc_a", "doc_b").distinct()
