"""Driver-style rehearsal: plain SparkSession, import __spark_entry__ via
importlib (run from OUTSIDE the repo, e.g. /tmp, to catch sys.path and
cloudpickle assumptions), execute each query AND its DuckDB oracle,
compare values order-insensitively and bit-exactly (mirrors the driver's
CORRECTNESS hash).

Usage:
    cd /tmp && python /root/repo/tools/rehearse.py [SF_DIR] [name1,name2,...]
    # default SF_DIR /root/testdata/sf0.01 (the driver's correctness scale);
    # no names = full registry.
"""
import importlib.util
import sys
import time

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

q, o = mod.queries(), mod.oracle_sql()
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def dtype_class(dt):
    kind = getattr(dt, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "M": "datetime"}.get(kind, "object")


names = ONLY if ONLY else list(q)
fails = []
t_all = time.time()
for i, name in enumerate(names):
    t0 = time.time()
    try:
        sdf = q[name](spark, SF_DIR).toPandas()
        if name not in o:
            print(f"[{i+1}/{len(names)}] {name}: rows={len(sdf)} (rows-only) {time.time()-t0:.1f}s")
            continue
        odf = con.execute(o[name]).df()
        assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
        assert sorted(sdf.columns) == sorted(odf.columns), f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"
        left, right = normalize(sdf), normalize(odf)
        kl = {c: dtype_class(left[c].dtype) for c in left.columns}
        kr = {c: dtype_class(right[c].dtype) for c in right.columns}
        assert kl == kr, f"dtype class {[(c, kl[c], kr[c]) for c in kl if kl[c] != kr[c]]}"
        pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=0, atol=0)
        for c in left.columns:
            if left[c].dtype.kind == "f" and right[c].dtype.kind == "f":
                bad = int((left[c].to_numpy().view(np.int64) != right[c].to_numpy().view(np.int64)).sum())
                assert bad == 0, f"{c}: {bad} bit-level float mismatches"
        print(f"[{i+1}/{len(names)}] {name}: OK rows={len(sdf)} {time.time()-t0:.1f}s")
    except Exception as e:
        fails.append((name, str(e)[:300]))
        print(f"[{i+1}/{len(names)}] {name}: FAIL {str(e)[:300]}")

print(f"\ntotal {time.time()-t_all:.0f}s; {len(names)-len(fails)}/{len(names)} ok")
for n, e in fails:
    print("FAIL", n, e)
sys.exit(1 if fails else 0)
