"""r12 (r11 verdict item 3): full bit-exact sf1.0 evidence for the two
FLOAT-accumulator BDA queries via the exact tie-resolving fast twins,
replacing tools/sf1_bda_partial.py's 85% partial-pass gate for these
two. Uses msops.bda_fast_twin_decomposed — the big-scale form whose
recursion touches only scalar temp tables (the inline twins drag the
per-baseline step array through the LATERAL; fine at test scales,
~0.1 s/round at sf1). Twin == oracle is locked at sf0.001/0.01 for
BOTH forms by tests/test_fast_bda_twin.py; this tool replays
twin-vs-SPARK at big scales.

Usage: python tools/sf1_bda_twin_check.py [SF_DIR]   (default /tmp/sf1)
"""
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from codex_africanus_spark.queries import msops, registry  # noqa: E402
from codex_africanus_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def compare(name: str, left: pd.DataFrame, right: pd.DataFrame) -> None:
    if len(left) != len(right):  # -O-proof
        raise ValueError(f"{name}: rows {len(left)} vs {len(right)}")
    cols = sorted(left.columns)
    if cols != sorted(right.columns):
        raise ValueError(f"{name}: columns {cols} vs {sorted(right.columns)}")
    left = left[cols].sort_values(cols).reset_index(drop=True)
    right = right[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=0, atol=0)
    for c in cols:
        lf, rf = left[c], right[c]
        if lf.dtype.kind == "f" and rf.dtype.kind == "f":
            bad = int((lf.to_numpy().view(np.int64)
                       != rf.to_numpy().view(np.int64)).sum())
            if bad != 0:  # -O-proof
                raise ValueError(f"{name} {c}: {bad} bit-level float mismatches")


def main() -> None:
    spark = get_spark("bda-twin-check")
    reg = registry()
    con = duckdb.connect()
    con.execute("SET threads TO 24")
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    for qname, ragged in (
        ("bda_baseline_dependent_average", False),
        ("bda_ragged_channel_factor", True),
    ):
        t0 = time.time()
        left = reg[qname].fn(spark, SF_DIR).toPandas()
        t_spark = time.time() - t0
        t0 = time.time()
        setups, twin = msops.bda_fast_twin_decomposed(ragged)
        for st in setups:
            con.execute(st)
        right = con.execute(twin).df()
        t_twin = time.time() - t0
        compare(qname, left, right)
        print(
            f"{qname}: BIT-EXACT rows={len(left)} "
            f"spark={t_spark:.1f}s twin={t_twin:.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
