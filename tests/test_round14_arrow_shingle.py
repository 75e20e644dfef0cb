"""Round-14 Arrow shingler locks: the mapInPandas md5-shingle kernels
(operators/dedup._shingle_frame / minhash_signatures) must stay
bit-identical to the JVM codegen chain at every driver-verified scale —
same UTF-8 bytes into the same md5, same first-15-hex integer, same
% 2^31-1, same exact int64 permutation arithmetic, same >=3-token
row-skipping."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from codex_africanus_spark.operators import dedup as dedup_op
from codex_africanus_spark.sources.tables import load


def _docs(spark, sf):
    return load(spark, "documents", sf)


def _both(monkeypatch, build):
    # "1" forces the Arrow tier regardless of the size-adaptive gate
    # (test corpora sit below the 32 MB crossover by design)
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SHINGLE", "1")
    arrow = build()
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SHINGLE", "0")
    jvm = build()
    monkeypatch.delenv("SPARK_GRAFT_ARROW_SHINGLE", raising=False)
    return arrow, jvm


def _bitcompare(a_df, b_df, key):
    assert [f.dataType for f in a_df.schema] == [f.dataType for f in b_df.schema]
    a = a_df.toPandas().sort_values(key).reset_index(drop=True)
    b = b_df.toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert (av.view(np.int64) == bv.view(np.int64)).all(), c
        else:
            assert (av == bv).all(), c


def test_shingle_frame_matches_jvm(spark, sf_dir, monkeypatch):
    arrow, jvm = _both(
        monkeypatch, lambda: dedup_op._shingle_frame(_docs(spark, sf_dir))
    )
    assert "MapInPandas" in arrow._jdf.queryExecution().toString()
    _bitcompare(arrow, jvm, ["doc_id", "h"])


def test_minhash_signatures_match_jvm(spark, sf_dir, monkeypatch):
    arrow, jvm = _both(
        monkeypatch,
        lambda: dedup_op.minhash_signatures(_docs(spark, sf_dir), keep=("lang",)),
    )
    assert "MapInPandas" in arrow._jdf.queryExecution().toString()
    _bitcompare(arrow, jvm, ["doc_id"])


def test_lsh_pairs_end_to_end_match(spark, sf_dir, monkeypatch):
    from codex_africanus_spark.queries import registry

    reg = registry()
    arrow, jvm = _both(
        monkeypatch, lambda: reg["minhash_lsh_near_dup_pairs"].fn(spark, sf_dir)
    )
    _bitcompare(arrow, jvm, ["doc_a", "doc_b"])


def test_shingle_gates(spark, sf_dir, monkeypatch):
    docs = _docs(spark, sf_dir)
    # kill-switch restores the pure-JVM plan
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SHINGLE", "0")
    plan = dedup_op._shingle_frame(docs)._jdf.queryExecution().toString()
    assert "MapInPandas" not in plan
    # non-contract frame (doc_id not bigint) falls back even when forced
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SHINGLE", "1")
    other = docs.withColumn("doc_id", F.col("doc_id").cast("int"))
    plan = dedup_op._shingle_frame(other)._jdf.queryExecution().toString()
    assert "MapInPandas" not in plan
    monkeypatch.delenv("SPARK_GRAFT_ARROW_SHINGLE", raising=False)
    # size-adaptive default: the tiny test corpus stays JVM, a low
    # crossover flips it to the Arrow tier (the sf10 regime)
    plan = dedup_op._shingle_frame(docs)._jdf.queryExecution().toString()
    assert "MapInPandas" not in plan
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SHINGLE_MIN_MB", "0")
    plan = dedup_op._shingle_frame(docs)._jdf.queryExecution().toString()
    assert "MapInPandas" in plan


def test_short_and_null_docs_skip_like_jvm(spark, monkeypatch):
    pdf_rows = [
        (1, "only two"),
        (2, "a b c d"),
        (3, None),
        (4, ""),
        (5, "x y z"),
    ]
    docs = spark.createDataFrame(pdf_rows, "doc_id long, text string")
    arrow, jvm = _both(monkeypatch, lambda: dedup_op._shingle_frame(docs))
    _bitcompare(arrow, jvm, ["doc_id", "h"])
    assert sorted(
        arrow.select("doc_id").distinct().toPandas()["doc_id"].tolist()
    ) == [2, 5]


@pytest.mark.slow
@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_shingle_matches_jvm_driver_scales(spark, monkeypatch, sf):
    arrow, jvm = _both(
        monkeypatch, lambda: dedup_op._shingle_frame(_docs(spark, sf))
    )
    _bitcompare(arrow, jvm, ["doc_id", "h"])
    arrow, jvm = _both(
        monkeypatch, lambda: dedup_op.minhash_signatures(_docs(spark, sf))
    )
    _bitcompare(arrow, jvm, ["doc_id"])
