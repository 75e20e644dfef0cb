"""Runtime filtering levers at scale: dynamic partition pruning (DPP)
and runtime Bloom-filter join pruning.

Both are Catalyst features the engine gets for free BECAUSE plans stay
declarative — these tests pin that they actually engage on this engine's
data shapes (a regression here means a future plan change broke the
declarative path, e.g. an opaque UDF barrier before the join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def partitioned_lineitem(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li_part")
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .write.partitionBy("l_returnflag")
        .parquet(path)
    )
    return path


def test_dynamic_partition_pruning_engages(spark, sf_dir, partitioned_lineitem):
    """A join whose dimension side filters the partition column must plan
    a dynamicpruning subquery on the partitioned scan — at 100 TB this is
    the difference between scanning one partition and all of them."""
    li = spark.read.parquet(partitioned_lineitem)
    # DPP needs a file-backed dimension with a selective predicate (a
    # LocalRelation is "already pruned" and skips the subquery insertion)
    dim_path = partitioned_lineitem + "_dim"
    spark.createDataFrame(
        [("R", "returned"), ("A", "acked"), ("N", "none")],
        "l_returnflag string, label string",
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("label") == "returned")
    joined = li.join(dim, "l_returnflag").agg(F.sum("l_quantity"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the result is correct
    want = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .agg(F.sum("l_quantity"))
        .first()[0]
    )
    assert joined.first()[0] == want


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """With a selective build side, Spark injects a Bloom filter on the
    probe side (bloom_filter_might_contain / InSubquery DPP-style
    semi-join reduction) so most probe rows die before the shuffle."""
    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", None
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    # default application-side threshold is 10GB — far above sf0.001/sf0.01
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.count(F.lit(1))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString().lower()
        assert "bloomfilter" in plan or "might_contain" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        if old_thresh is None:
            spark.conf.unset(
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
            )
        else:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
                old_thresh,
            )
