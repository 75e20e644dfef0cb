"""Persisted-bucketed layout benchmark: pay the shuffle once, amortize it.

Writes bucketed twins of lineitem/orders (bucketBy join key), then times
the orders⋈lineitem aggregate both ways:

  plain    — parquet scan → Exchange both sides → SortMergeJoin
  bucketed — bucketed scan → SortMergeJoin (zero Exchange below the join)

At 100 TB the bucketed layout is the difference between re-shuffling the
fact tables on every join and never shuffling them again; this script
measures the local[*] proxy of that and prints one JSON line.

Usage: python tools/bucketed_bench.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _agg(li, orders):
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    warehouse = tempfile.mkdtemp(prefix="cas_bucketed_")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.warehouse.dir", warehouse)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderdate"
        )

        t0 = time.perf_counter()
        (
            li.write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("li_b")
        )
        (
            orders.write.bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("o_b")
        )
        layout_s = time.perf_counter() - t0

        def best_of(df_fn, n=3):
            best = None
            for _ in range(n):
                t = time.perf_counter()
                df_fn().collect()
                dt = time.perf_counter() - t
                best = dt if best is None else min(best, dt)
            return best

        plain = best_of(lambda: _agg(li, orders))
        bucketed = best_of(
            lambda: _agg(spark.table("li_b"), spark.table("o_b"))
        )
        plan = (
            _agg(spark.table("li_b"), spark.table("o_b"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        join_free = "Exchange" not in plan.split("SortMergeJoin")[-1]
        print(json.dumps({
            "metric": "bucketed_join_speedup",
            "plain_join_sec": round(plain, 3),
            "bucketed_join_sec": round(bucketed, 3),
            "layout_cost_sec": round(layout_s, 3),
            "joins_to_amortize": (
                round(layout_s / max(plain - bucketed, 1e-9), 1)
            ),
            "join_exchange_free": join_free,
            "n_buckets": n_buckets,
            "sf_dir": sf_dir,
        }))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
