"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``codex_africanus_spark`` (see SURVEY.md §2 for
the operator inventory each query demonstrates).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from codex_africanus_spark.queries import registry  # noqa: E402
from codex_africanus_spark.session import configure_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full-catalogue predict_vis
    (cross join source catalogue × visibility rows → per-(source,row,chan)
    phase/brightness/shape expressions → deterministic reduction over
    sources)."""
    configure_session(spark)
    return registry()["predict_vis_point_gauss"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable applies the engine's runtime confs (AQE, UTC, Arrow)
    to the caller's session first — the driver constructs its own
    SparkSession without them.
    """

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(qd.fn) for name, qd in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query (omitted for
    non-SQL-expressible operators → rows-only check)."""
    return {name: qd.oracle for name, qd in registry().items() if qd.oracle is not None}
