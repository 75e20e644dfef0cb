"""Regenerate the PLANS.md physical-plan audit table over the FULL
registry at sf0.1 (r13 rewrite of the round-4 hand-listed version).
Usage: python tools/plan_audit.py > PLANS.md"""
import re
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from codex_africanus_spark.queries import registry

# r13 (r12 verdict item 5): audit the ENTIRE registry instead of a
# hand-maintained list — PLANS.md membership can no longer go stale.
QUERIES = None  # resolved to sorted(registry()) below

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
reg = registry()
QUERIES = sorted(reg)
import subprocess
rev = subprocess.run(["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"], capture_output=True, text=True).stdout.strip()
print(f"# PLANS.md — executed-plan audit of the FULL registry ({len(QUERIES)} queries) at sf0.1, HEAD {rev}")
print()
print("| query | Exch | BcastExch | BHJ/BNLJ | SMJ | scans | global Sort |")
print("|---|---|---|---|---|---|---|")
for name in QUERIES:
    df = reg[name].fn(spark, "/root/testdata/sf0.1")
    p = df._jdf.queryExecution().executedPlan().toString()
    exch = len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition", p))
    bcast = p.count("BroadcastExchange")
    bj = p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin")
    smj = p.count("SortMergeJoin")
    scans = p.count("Scan parquet")
    gsort = len(re.findall(r"Sort \[[^\]]*\], true", p))
    print(f"| {name} | {exch} | {bcast} | {bj} | {smj} | {scans} | {gsort} |")
spark.stop()
