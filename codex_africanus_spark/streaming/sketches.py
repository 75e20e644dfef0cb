"""Streaming sketch maintenance — the continuous counterpart of the
batch sketch family (operators/sketches.py).

A continuous ingest pipeline keeps its frequency sketch CURRENT: each
arriving document's tokens update the Count-Min cell counters in the
state store (update-mode aggregate), and heavy-hitter queries probe the
sink table at read time exactly like the batch CMS probe tier. The cell
expressions are IMPORTED from the batch operator, so a batch backfill
and the stream produce cell-identical sketches (the same Kappa-parity
discipline as streaming/dedup and streaming/windowed).

Scale: state is the D×W cell grid — constant size regardless of stream
history (the whole point of sketching a 100 TB/day token feed); updates
are partial-agg-native conditional sums, so every micro-batch shuffles
only its own cell deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.operators.sketches import CMS_D, _cms_cell


def streaming_cms_cells(stream: DataFrame) -> DataFrame:
    """Running Count-Min cell counters over the token stream of arriving
    documents (update-mode aggregate; state = D×W cells, constant).

    Input: a streaming frame with a `text` column. Output: one row per
    live (row, cell) pair with its running count — the same cell layout
    `operators.sketches.cms_token_estimates` probes, unioned over the D
    hash rows with a row tag (streaming aggregates allow one groupBy, so
    the D rows ride a posexplode of the per-row cell ids instead of D
    separate aggregates)."""
    tok = stream.select(F.explode(F.split("text", " ")).alias("token"))
    cells = tok.select(
        F.posexplode(
            F.array(*[_cms_cell(F.col("token"), r) for r in range(CMS_D)])
        ).alias("row", "cell")
    )
    return cells.groupBy("row", "cell").agg(F.count(F.lit(1)).alias("n"))


# Batch twin over a frame at rest (parity tests, backfill path): the
# pipeline is expression-identical by CONSTRUCTION — it IS the same
# function, applied to a batch frame instead of a stream.
batch_cms_cells = streaming_cms_cells
