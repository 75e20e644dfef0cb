"""SparkSession factory tuned for this engine.

Local mode mirrors the driver harness (local[32], single JVM). The configs
are chosen for 100 TB-scale habits even though tests run locally:

- AQE on: runtime coalescing, skew-join splitting, dynamic join strategy —
  replaces the reference's hand-tuned chunking (`--row-chunks`,
  /root/reference/africanus/rime/examples/predict.py:141).
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden (AQE coalescing makes the initial number less critical).
- Arrow enabled: every pandas-UDF escape hatch is Arrow-batched.
- nanosAsLong: the driver's parquet uses TIMESTAMP(NANOS), which Spark's
  vectorized reader does not support natively; we read exact integer
  nanoseconds instead (no precision loss, unlike micros truncation).
- session timezone pinned UTC so timestamp arithmetic is engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "codex_africanus_spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # guide §3.1/§9: let the planner pick shuffled-hash join when its
        # size conditions hold instead of always sort-merge — drops both
        # sort passes from fact⋈fact joins (measured at sf10: q5's
        # lineitem⋈orders). Scale-safe: SHJ is only chosen when the
        # build side fits the per-partition hash-map bound; SMJ remains
        # the fallback for genuinely large both-sides joins.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # AQE twin of the same choice for runtime-sized shuffles
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        # local-mode parallelism: the testdata tables are single small
        # parquet files; the 128 MB default yields ~3 input partitions on
        # 32 cores. On a real cluster with 100 TB of many files the
        # default is correct — this is a local-bench knob.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply this engine's runtime confs to an externally-created session
    (the driver harness constructs its own SparkSession)."""
    try:
        is_local = spark.conf.get("spark.master", "").startswith("local")
    except Exception:
        is_local = False
    confs = [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.join.preferSortMergeJoin", "false"),
        ("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"),
    ]
    if is_local:
        # Local-bench-only I/O knobs (r13 verdict item 2): the testdata
        # tables are single small parquet files, so an 8 MB split target
        # restores scan parallelism on 32 cores. On a real cluster an
        # 8 MB target would be ~12.5M tasks per 100 TB scan — keep the
        # 128 MB default there (guide §6 even recommends raising it).
        confs += [
            ("spark.sql.files.maxPartitionBytes", "8m"),
            ("spark.sql.files.openCostInBytes", "1m"),
            # the driver's session keeps the 200/400 default; at bench
            # scale the right pre-AQE width is the core count (AQE still
            # coalesces down, but over-wide shuffles pay task-launch
            # overhead in the iterative solvers' per-iteration joins).
            # Cluster deployments size this from data volume instead.
            ("spark.sql.shuffle.partitions", DEFAULT_CPUS),
        ]
    for k, v in confs:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable at runtime in some deployments; fine
    return spark
