"""Skew-safe aggregation: salting for hot keys.

At 100 TB a handful of hot keys (one baseline with 10⁹ rows, one user
with 10% of events) turn a groupBy into a single straggler task. AQE's
skew-join splitting covers joins; for *aggregations* the classic fix is
two-stage salted aggregation:

  stage 1: groupBy(key, salt = pmod(deterministic_spread, S)) — partial
           aggregates over S-way split hot keys
  stage 2: groupBy(key) — merge the S partials

Exact for any commutative-associative aggregate (sums, counts, min/max —
i.e. everything the deterministic fixed-point mode emits). The helper
keeps both stages as plain Catalyst hash aggregates — no UDF.

This generalizes the reference's per-chunk partial reduction strategy
(LinearReduction/parallel_reduction, dask_predict.py:64-369) with an
explicit fan-out factor where the data, not the chunking, is skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    counts: bool = True,
    n_salts: int = 16,
    spread_col: str | None = None,
) -> DataFrame:
    """Two-stage exact aggregation of BIGINT-valued expressions.

    `sums`: {output_name: integer-valued Column to sum}. The salt derives
    from `spread_col` (any high-cardinality column; defaults to
    monotonically varying input position via spark_partition_id) so hot
    keys split evenly.
    """
    spread = (
        F.col(spread_col)
        if spread_col
        else F.spark_partition_id().cast("long")
    )
    salt = F.pmod(F.hash(spread), F.lit(n_salts)).alias("__salt")
    stage1_aggs = [F.sum(c).alias(name) for name, c in sums.items()]
    if counts:
        stage1_aggs.append(F.count(F.lit(1)).alias("__n"))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_aggs)
    stage2_aggs = [F.sum(name).alias(name) for name in sums]
    if counts:
        stage2_aggs.append(F.sum("__n").alias("n_rows"))
    return stage1.groupBy(*keys).agg(*stage2_aggs)
