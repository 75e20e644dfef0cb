"""Parquet scan helpers for the driver's testdata star schema.

At 100 TB these reads are the entry point for partition pruning and
column pruning — always `.select()` the needed columns immediately so
Catalyst pushes projection into the parquet scan (ReadSchema), and pass
filters early so they appear in PushedFilters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition a narrow frame up to cluster parallelism before an
    expensive expansion (cross join, explode).

    The driver's testdata parquet is written as a single row group, so the
    scan cannot be split — every downstream stage would run on ≤2 tasks.
    One round-robin exchange of the narrow rows (~tens of MB) buys full
    parallelism for the O(25×) expansion that follows. On a real cluster
    with many files/row groups the condition is false and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    # NOTE: df.rdd.getNumPartitions() would trigger an eager job under AQE;
    # inputFiles() reads only the file index. Single-file (= single-row-
    # group testdata) sources fan out; many-file sources are already split.
    try:
        files = list(df.inputFiles())
        n_files = len(files)
    except Exception:
        files, n_files = [], 0
    # r13 (sf10 bench finding): a single LARGE multi-row-group file is
    # natively splittable — the scan yields ~size/maxPartitionBytes
    # tasks, and chaining the derivation onto those beats a full
    # round-robin exchange of the raw fact rows even at reduced
    # parallelism (measured at 60M rows: time_and_channel_average
    # 6.5 -> 2.9 s, predict_vis 48 -> 29 s; the exchange writes+reads
    # ~2 GB of shuffle and breaks scan-chained codegen). Estimate the
    # split count from file sizes and skip the exchange when the scan
    # already splits >= 8 ways; the driver's small single-row-group
    # testdata (1 split) still fans out exactly as before.
    if n_files and n_files < max(2, target // 2):
        try:
            import os as _os

            raw = df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", str(128 << 20)
            ).strip().lower()
            units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
            num = raw.rstrip("bkmg")
            suffix = raw[len(num):].rstrip("b")
            mpb = int(num) * units.get(suffix, 1)
            local = [f[len("file:"):] if f.startswith("file:") else f
                     for f in files]
            if all(_os.path.exists(p) for p in local):
                total = sum(_os.path.getsize(p) for p in local)
                # cap by the real row-group count (a KB-scale footer
                # read): one giant row group is ONE split whatever the
                # byte math says — exactly the driver-testdata layout
                # this exchange exists for
                import pyarrow.parquet as _pq

                groups = sum(
                    _pq.ParquetFile(p).metadata.num_row_groups
                    for p in local
                )
                if min(-(-total // mpb), groups) >= 8:
                    return df
        except Exception:
            pass  # unknown scheme/size -> keep the conservative fan-out
    if n_files and n_files < max(2, target // 2):
        # idempotence: inputFiles() still reports the source file after a
        # repartition, so composed operators (vis_table → source_coherency
        # both call fan_out) were stacking a SECOND full round-robin
        # exchange of the fact rows. Walk the analyzed logical plan for a
        # Repartition node that already meets the parallelism goal — a
        # substring match would also trip on coalesce(1) (rendered as
        # Repartition) and suppress a needed fan-out (r7 advice). Node
        # walk, no plan render, no job; these are narrow near-source
        # plans (a handful of nodes).
        if _plan_has_repartition(df, target):
            return df
        return df.repartition(target)
    return df


def _plan_has_repartition(df: DataFrame, target: int) -> bool:
    """True iff the analyzed logical plan contains a round-robin/hash
    Repartition (or RepartitionByExpression) whose numPartitions already
    reaches `target` — i.e. re-fanning-out would be a redundant second
    exchange. Coalesce renders as Repartition with a SMALL partition
    count; the >= target guard keeps a deliberate coalesce(1) from
    suppressing a real fan-out."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            name = node.getClass().getSimpleName()
            if name in ("Repartition", "RepartitionByExpression"):
                try:
                    if int(node.numPartitions()) >= target:
                        return True
                except Exception:
                    # numPartitions optional on some node shapes: treat
                    # an explicit repartition of unknown width as enough
                    return True
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
    except Exception:
        pass
    return False


def scan_twin(df: DataFrame) -> DataFrame:
    """The pre-fan_out lineage of a fanned frame, for tiny aggregates.

    `fan_out` buys parallelism for expensive per-row derivations by
    round-robin exchanging the raw scan — but a consumer that only runs
    a small distinct/groupBy over one or two columns (e.g. the predict
    family's `(chan, frequency)` hoist) inherits that full-data exchange
    for nothing: partial aggregation already collapses the scan to
    O(#groups) rows per task, so the pre-aggregation exchange is pure
    shuffle cost (guide §2.4 — remove shuffles outright). Builders that
    fan out attach the unfanned projection as `_scan_twin`; it holds the
    IDENTICAL row multiset (same scan, same projection, no repartition),
    so any aggregate computed over the twin is value-identical. Falls
    back to `df` itself when no twin was attached (arbitrary caller
    frames, filtered lineages — behavior unchanged)."""
    return getattr(df, "_scan_twin", df)


def fast_row_count(df: DataFrame) -> int:
    """Exact row count without launching a Spark job when `df` is a bare
    (possibly projected) single-relation parquet scan: parquet footers
    carry exact per-file row counts, so the driver reads KB-scale
    metadata instead of scheduling a scan stage (guide §2.4 — the count
    feeds plan-build decisions like N-scaled cell/plane counts, where a
    whole job of stage latency is pure glue). Any other plan shape —
    filters, joins, non-file relations, remote schemes — falls back to
    df.count() unchanged."""
    try:
        node = df._jdf.queryExecution().optimizedPlan()
        while node.getClass().getSimpleName() == "Project":
            node = node.children().apply(0)
        if node.getClass().getSimpleName() != "LogicalRelation":
            return df.count()
        files = [f[len("file:"):] if f.startswith("file:") else f
                 for f in df.inputFiles()]
        if not files or not all(os.path.exists(p) for p in files):
            return df.count()
        import pyarrow.parquet as _pq

        return sum(_pq.ParquetFile(p).metadata.num_rows for p in files)
    except Exception:
        return df.count()


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    # TIMESTAMP(NANOS) columns require nanosAsLong on this Spark version.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
