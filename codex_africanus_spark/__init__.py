"""codex_africanus_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ratt-ru/codex-africanus.

Design: every operator of the reference (see SURVEY.md §2) is re-expressed
as declarative DataFrame/Column plans so Catalyst + Tungsten own the
physical strategy (whole-stage codegen replaces numba fusion; partial+final
hash aggregation replaces the reference's hand-built linear/tree
reductions, cf. /root/reference/africanus/rime/dask_predict.py:64-369).
Pandas UDFs (Arrow-batched) are used only where semantics genuinely cannot
be expressed relationally (data-dependent sequential binning, gather-heavy
interpolation, iterative per-group fits).
"""

__version__ = "0.1.0"

from codex_africanus_spark.session import get_spark  # noqa: F401
