#!/usr/bin/env python
"""Dump .explain('formatted') for the bench query set to plans/<SPARK_GRAFT_PLANS_DIR default r14>/.

Usage:
    python tools/explain_bench.py <suffix> [name1,name2,...]
    # suffix: 'before' or 'after' (file becomes plans/<SPARK_GRAFT_PLANS_DIR default r14>/<query>_<suffix>.txt)
    # default names: bench.py HEADLINE + EXTENDED sets

The explain output is the *initial* AQE plan (isFinalPlan=false) — the
shape evidence the optimization round commits (Exchange count, join
strategy, PushedFilters/ReadSchema, codegen spans, Python eval nodes).
Queries whose builders materialize intermediates (localCheckpoint) show
those as LogicalRDD scans; the stage structure before the checkpoint is
documented in OPTIMIZATION_r13.md instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codex_africanus_spark.queries import registry  # noqa: E402
from codex_africanus_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    else:
        import bench

        names = list(bench.HEADLINE) + list(bench.EXTENDED)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("explain-bench")
    reg = registry()
    for name in names:
        if name not in reg:
            print(f"# {name}: NOT IN REGISTRY", file=sys.stderr)
            continue
        try:
            df = reg[name].fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"# {name}: {len(txt)}B exchanges~{n_ex} -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
