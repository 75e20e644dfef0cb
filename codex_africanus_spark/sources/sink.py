"""Write-back sinks — the MS `xds_to_table` analogue
(/root/reference/africanus/rime/examples/predict.py:576-586: assign
MODEL_DATA, write back).

Spark-first: computed columns write to partitioned parquet. At 100 TB the
partition layout IS the query-acceleration structure: partition by the
reference's dataset grouping keys (FIELD_ID, DATA_DESC_ID, SCAN_NUMBER —
SURVEY §1.4) so downstream scans prune, and sort within partitions by
(TIME, ANTENNA1, ANTENNA2) to re-establish the reference's ordering
contract for ordered consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_model_data(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
