"""Mini-driver: run every registered query on Spark AND its DuckDB oracle
at sf0.001, compare row counts, column names, and values (order-insensitive,
exact) — a local rehearsal of the driver's CORRECTNESS gate."""

import duckdb
import pandas as pd
import pytest

from codex_africanus_spark.queries import registry

QUERIES = sorted(registry().items())


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # bool → int so engine dtype choices don't matter
    for c in df.columns:
        if df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name,qd", QUERIES, ids=[n for n, _ in QUERIES])
def test_query_matches_oracle(spark, sf_dir, name, qd):
    spark_df = qd.fn(spark, sf_dir).toPandas()
    assert len(spark_df) >= 0
    if qd.oracle is None:
        pytest.skip("rows-only query (no SQL oracle)")
    oracle_df = duck_con(sf_dir).execute(qd.oracle).df()
    assert len(spark_df) == len(oracle_df), f"{name}: row count mismatch"
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), f"{name}: schema mismatch"
    left, right = normalize(spark_df), normalize(oracle_df)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=0, atol=0)
