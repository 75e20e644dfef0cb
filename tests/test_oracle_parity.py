"""Mini-driver: run every registered query on Spark AND its DuckDB oracle
at sf0.001, compare row counts, column names, and values (order-insensitive,
exact) — a local rehearsal of the driver's CORRECTNESS gate."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from codex_africanus_spark.queries import registry

QUERIES = sorted(registry().items())

# One cheap representative per operator family stays in the default
# (driver-budget) selection as an oracle smoke; the full 390-query
# rehearsal carries the `slow` marker (run with `pytest -m slow` — the
# external driver re-checks ~50 queries against DuckDB independently).
SMOKE = {
    "q1_pricing_summary", "q5_region_revenue", "q9_product_profit",
    "topk_parts_by_revenue", "events_tumbling_window",
    "events_sessionize_relational", "time_index_dense_rank",
    "time_and_channel_average", "uv_grid_histogram",
    "gp_phase_screen_corrupt", "corrupt_vis_apply_gains",
    "compute_and_corrupt_vis_dde", "rime_shapelet_predict",
    "hll_sketch_distinct_parts", "kmv_theta_distinct_customers",
    "approx_percentile_price", "minhash_lsh_near_dup_pairs",
    "exact_dedup_documents", "snapshot_sink_time_travel",
}
PARAMS = [
    pytest.param(n, qd, id=n)
    if n in SMOKE
    else pytest.param(n, qd, id=n, marks=pytest.mark.slow)
    for n, qd in QUERIES
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # bool → int is the ONLY sanctioned dtype normalization
    for c in df.columns:
        if df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def dtype_class(dt) -> str:
    """Collapse a dtype to the class the driver's value hash is sensitive
    to: int-vs-float divergence (e.g. a DuckDB HUGEINT oracle column
    fetched as float64 vs Spark's int64) breaks the hash even when every
    value is numerically identical."""
    kind = getattr(dt, "kind", "O")
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "M":
        return "datetime"
    return "object"


@pytest.mark.parametrize("name,qd", PARAMS)
def test_query_matches_oracle(spark, sf_dir, name, qd):
    spark_df = qd.fn(spark, sf_dir).toPandas()
    assert len(spark_df) >= 0
    if qd.oracle is None:
        pytest.skip("rows-only query (no SQL oracle)")
    oracle_df = duck_con(sf_dir).execute(qd.oracle).df()
    assert len(spark_df) == len(oracle_df), f"{name}: row count mismatch"
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), f"{name}: schema mismatch"
    left, right = normalize(spark_df), normalize(oracle_df)
    kinds_l = {c: dtype_class(left[c].dtype) for c in left.columns}
    kinds_r = {c: dtype_class(right[c].dtype) for c in right.columns}
    assert kinds_l == kinds_r, (
        f"{name}: dtype class mismatch (driver hash would fail): "
        f"{ {c: (kinds_l[c], kinds_r[c]) for c in kinds_l if kinds_l[c] != kinds_r[c]} }"
    )
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=0, atol=0)
    # Bit-exact float check: the driver's value hash is bit-sensitive, so
    # -0.0 vs 0.0 (e.g. Spark round(-0.0) → 0.0, DuckDB → -0.0) fails there
    # even though == comparison passes. Mirror that strictness here.
    for c in left.columns:
        if left[c].dtype.kind == "f" and right[c].dtype.kind == "f":
            lb = left[c].to_numpy().view(np.int64)
            rb = right[c].to_numpy().view(np.int64)
            bad = int((lb != rb).sum())
            assert bad == 0, (
                f"{name}.{c}: {bad} bit-level float mismatches "
                "(likely -0.0 vs 0.0 — normalize with + 0.0 on both sides)"
            )
