"""r12 (r11 verdict item 3): full bit-exact sf1.0 evidence for the two
FLOAT-accumulator BDA queries via the exact tie-resolving fast twins
(queries/msops.py::_BDA_PLAIN_FAST_TWIN / _BDA_RAGGED_FAST_TWIN),
replacing tools/sf1_bda_partial.py's 85% partial-pass gate for these
two. The twin is decision-identical to the registered recursive oracle
by the deci-grid argument (msops.py section comment) and bit-equality
is additionally LOCKED against the oracle itself at sf0.001/0.01/0.1;
this tool replays twin-vs-SPARK at big scales.

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
    for qname, twin in (
        ("bda_baseline_dependent_average", msops._BDA_PLAIN_FAST_TWIN),
        ("bda_ragged_channel_factor", msops._BDA_RAGGED_FAST_TWIN),
    ):
        t0 = time.time()
        left = reg[qname].fn(spark, SF_DIR).toPandas()
        t_spark = time.time() - t0
        t0 = time.time()
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
