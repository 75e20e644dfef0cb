"""sf1.0 evidence for the five tier-3 BDA queries excluded from the
one-run full-registry sweep (their registered per-row recursive-CTE
oracles advance one row per baseline per iteration, so a full-depth
DuckDB replay at sf1.0 costs ~20-40 min EACH — replay cost, not engine
cost). This tool closes the gap with two evidence classes, recorded in
BASELINE.md round-11:

1. FAST-TWIN EQUALITY at full slice (%17), full sf1.0 depth, for the
   three queries whose closure rule is anchor-relative (no running
   accumulator), where the anchor-chain reformulation is
   decision-identical by construction and test-locked at small scales
   (tests/test_fast_bda_twin.py):
     - time_bin_sequential_exact   vs msops._SEQ_BIN_FAST_TWIN
     - bda_sinc_decorrelation      vs msops._BDA_SINC_FAST_TWIN
     - bda_salted_average          vs msops._SBDA_FAST_TWIN (r10 twin)

2. [RETIRED r12 for the two float-accumulator queries — they now carry
   FULL bit-exact sf1.0 twins via the deci-grid tie-resolving chain
   (tools/sf1_bda_twin_check.py, BASELINE.md round-12); this
   partial-pass class remains only as historical method documentation]
   PARTIAL-PASS equality for the two float-accumulator oracles that
   were NOT anchor-chainable bit-exactly (sequential float fold): the
   IDENTICAL Spark plan on a deeper row slice (default %85 = 5x17,
   ~2.5k rows/baseline at sf1 — deeper than the sf0.1 registered gate)
   vs the registered oracle with only the slice literal rewritten
   (msops.bda_partial_oracle):
     - bda_baseline_dependent_average @ %85
     - bda_ragged_channel_factor     @ %85
   Scale note: the acc accumulator resets at 500.0 closure, so its
   magnitude is bounded by 500 + one step (<= ~420) at ANY scale — the
   overflow-fork class the sf1.0 sweeps hunt cannot arise in it; the
   sf1-scale values (copy-shifted keys, perturbed cents) DO flow
   through this gate.

Usage: cd /tmp && python /root/repo/tools/sf1_bda_partial.py [SF_DIR] [MOD]
"""
import importlib.util
import sys
import time

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
MOD = int(sys.argv[2]) if len(sys.argv) > 2 else 85

sys.path.insert(0, "/root/repo")
from codex_africanus_spark.queries import msops  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
Q = mod.queries()

con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'")


def compare(name, sdf, sql):
    t0 = time.time()
    left = sdf.toPandas()
    t_spark = time.time() - t0
    t0 = time.time()
    right = con.execute(sql).df()
    t_duck = time.time() - t0
    if len(left) != len(right):  # -O-proof (r11 ADVICE)
        raise ValueError(f"{name}: rows {len(left)} vs {len(right)}")
    left = left.reindex(sorted(left.columns), axis=1)
    right = right.reindex(sorted(right.columns), axis=1)
    for df in (left, right):
        for c in df.columns:
            if df[c].dtype == bool:
                df[c] = df[c].astype("int64")
    left = left.sort_values(list(left.columns)).reset_index(drop=True)
    right = right.sort_values(list(right.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=0, atol=0)
    for c in left.columns:
        if left[c].dtype.kind == "f" and right[c].dtype.kind == "f":
            bad = int(
                (
                    left[c].to_numpy().view(np.int64)
                    != right[c].to_numpy().view(np.int64)
                ).sum()
            )
            if bad != 0:  # -O-proof (r11 ADVICE)
                raise ValueError(
                    f"{name} {c}: {bad} bit-level float mismatches"
                )
    print(
        f"{name}: OK rows={len(left)} spark={t_spark:.1f}s twin={t_duck:.1f}s",
        flush=True,
    )


fails = []
CASES = [
    # (label, spark frame, oracle sql) — fast twins at full %17 depth
    (
        "time_bin_sequential_exact[fast-twin]",
        lambda: Q["time_bin_sequential_exact"](spark, SF_DIR),
        msops._SEQ_BIN_FAST_TWIN,
    ),
    (
        "bda_sinc_decorrelation[fast-twin]",
        lambda: Q["bda_sinc_decorrelation"](spark, SF_DIR),
        msops._BDA_SINC_FAST_TWIN,
    ),
    (
        "bda_salted_average[fast-twin]",
        lambda: Q["bda_salted_average"](spark, SF_DIR),
        msops._SBDA_FAST_TWIN,
    ),
    # partial-pass at %MOD for the float-accumulator pair
    (
        f"bda_baseline_dependent_average[%{MOD}]",
        lambda: msops._bda_average_build(spark, SF_DIR, MOD),
        msops.bda_partial_oracle(msops._BDA_ORACLE, MOD),
    ),
    (
        f"bda_ragged_channel_factor[%{MOD}]",
        lambda: msops._bda_ragged_build(spark, SF_DIR, MOD),
        msops.bda_partial_oracle(msops._BDA_RAGGED_ORACLE, MOD),
    ),
]
t_all = time.time()
for label, frame, sql in CASES:
    try:
        compare(label, frame(), sql)
    except Exception as e:  # noqa: BLE001 — report-all sweep tool
        fails.append((label, str(e)[:300]))
        print(f"{label}: FAIL {str(e)[:300]}", flush=True)

print(f"total {time.time()-t_all:.0f}s; {len(CASES)-len(fails)}/{len(CASES)} ok")
for n, e in fails:
    print("FAIL", n, e)
sys.exit(1 if fails else 0)
