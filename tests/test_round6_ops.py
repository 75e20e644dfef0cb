"""Round-6 operators: 2D fringe fit, gain interp, weighted SPI,
ANN evaluation tier, contamination spans, stratified sampling, DSIR."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from codex_africanus_spark.operators import calibration as cal_op
from codex_africanus_spark.operators import corpus_stats as cstat_op
from codex_africanus_spark.operators import curation as cur_op
from codex_africanus_spark.operators import similarity as sim
from codex_africanus_spark.operators import spi as spi_op
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.sources.tables import load


def test_fringe_fit_recovers_planted_delay_rate(spark):
    """A noiseless phase plane φ = a + b·chan + c·tbin must be recovered
    to quantization precision by the 2D Cramer fit."""
    import math

    bin_secs = 2_592_000.0
    a0, b0, c0 = 0.3, 0.004, -0.002
    rows = []
    for tb in range(40):
        for ch in range(8):
            phi = a0 + b0 * ch + c0 * tb
            rows.append(
                ((tb + 0.25) * bin_secs, 1, 2, ch, math.cos(phi), math.sin(phi))
            )
    vis = spark.createDataFrame(
        rows, "time double, antenna1 int, antenna2 int, chan int, "
        "vis_re double, vis_im double"
    )
    out = cal_op.fringe_fit_delay_rate(vis).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r.delay_prad_per_chan / 1e12 - b0) < 1e-8
    assert abs(r.rate_prad_per_bin / 1e12 - c0) < 1e-8
    assert abs(r.phase0_prad / 1e12 - a0) < 1e-7
    assert r.n_samp == 320


def test_fringe_fit_partition_invariant(spark, sf_dir):
    vis = tpch_ms.vis_table(spark, sf_dir)
    a = sorted(map(tuple, cal_op.fringe_fit_delay_rate(vis).collect()))
    b = sorted(
        map(tuple, cal_op.fringe_fit_delay_rate(vis.repartition(13)).collect())
    )
    assert a == b and len(a) > 0


def test_gains_interp_exact_at_bin_centres_and_clamped(spark, sf_dir):
    """At a bin-centre time the interpolation must return that bin's
    solution exactly (frac = 0), and every frac must lie in [0, 1]."""
    import math

    bin_secs = 2_592_000.0
    vis = tpch_ms.vis_table(spark, sf_dir)
    lo = vis.agg(
        F.min(F.floor(F.col("time") / F.lit(bin_secs)).cast("long"))
    ).collect()[0][0]
    k = lo + 2  # interior bin: no clamping in play
    probe = spark.createDataFrame(
        [((k + 0.5) * bin_secs, 0, 3, 4, 17)],
        "time double, chan int, antenna1 int, antenna2 int, row_id long",
    )
    # union one probe row into the real table so [lo, hi] is unchanged
    cols = ["row_id", "time", "antenna1", "antenna2", "chan"]
    vv = vis.select(*cols).unionByName(probe.select(*cols))
    got = {
        r.row_id: r for r in cal_op.gains_time_interp(vv).collect()
    }[17]
    amp = 1.0 + 3 / 50.0 + (k % 5) / 100.0
    want_re = amp * math.cos(k * 0.05 + 3 * 0.3)
    assert abs(got.g1_re_q / 1e9 - want_re) < 2e-9


def test_spi_weighted_fit_recovers_catalogue_alpha(spark, sf_dir):
    """On noiseless power-law samples the weighted binned fit must land
    near the catalogue spectral index (binning a power law in linear
    space biases alpha slightly — tolerance covers it)."""
    src = tpch_ms.source_table(spark, sf_dir).select(
        "source_id", "spi"
    ).toPandas().set_index("source_id")
    from codex_africanus_spark.queries import REGISTRY

    out = REGISTRY["spi_weighted_binned_fit"].fn(spark, sf_dir).toPandas()
    assert len(out) == len(src)
    for _, r in out.iterrows():
        truth = src.loc[r.source_id, "spi"]
        assert abs(r.alpha_fit_nano / 1e9 - truth) < 0.01, (r.source_id, truth)


@pytest.mark.slow
def test_recall_monotone_in_probes(spark, sf_dir, tmp_path):
    emb = load(spark, "embeddings", sf_dir)
    out = (
        sim.ivf_recall_vs_probes(spark, emb, str(tmp_path / "ivf"))
        .orderBy("n_probes")
        .collect()
    )
    assert len(out) == 3
    recalls = [r.mean_recall for r in out]
    assert recalls == sorted(recalls), recalls
    assert all(r.n_queries > 0 for r in out)


def test_cell_balance_shares_sum_to_one(spark, sf_dir, tmp_path):
    emb = load(spark, "embeddings", sf_dir)
    out = sim.ivf_cell_balance(spark, emb, str(tmp_path / "ivf")).toPandas()
    assert out.n_vecs.sum() == emb.count()
    assert abs(out.share.sum() - 1.0) < 1e-4
    # balanced-mean sanity: skews bracket 1000
    assert out.skew_x1000.min() <= 1000 <= out.skew_x1000.max() + 1


def test_pq_distortion_positive_all_subspaces(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    out = sim.pq_distortion_report(emb).toPandas()
    assert list(out.m) == list(range(sim.PQ_M))
    assert (out.mean_d2 > 0).all()
    assert (out.n_vecs == emb.count()).all()


def test_contamination_finds_planted_span_ignores_boilerplate(spark):
    """A 9-word verbatim quote (7 consecutive trigrams) must be reported
    with exactly that run; a boilerplate trigram present in EVERY doc
    must not create pairs on its own (df-cap)."""
    quote = "alpha beta gamma delta epsilon zeta eta theta iota"
    boiler = "subscribe to newsletter"
    rows = [(50, f"{quote} filler one", "s")]  # eval doc (50 % 50 == 0)
    rows += [(1, f"intro words {quote} outro", "s")]  # corpus doc quoting it
    # many corpus docs sharing ONLY the boilerplate trigram
    rows += [
        (2 + i, f"{boiler} unique{i} distinct{i} words{i}", "s")
        for i in range(cur_op.CONTAM_DF_MAX + 10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = cur_op.contamination_span_report(docs).collect()
    got = {(r.doc_id, r.eval_doc_id): r for r in out}
    assert (1, 50) in got
    assert got[(1, 50)].max_run == 7  # 9 words -> 7 trigrams
    assert got[(1, 50)].span_words == 9
    # boilerplate-only docs never pair with the eval doc
    assert all(d == 1 for (d, _e) in got)


def test_stratified_split_exact_proportions_and_determinism(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    out = cstat_op.stratified_eval_split(docs).toPandas()
    per = docs.groupBy("source").count().toPandas().set_index("source")
    for srcname, grp in out.groupby("source"):
        n = int(per.loc[srcname, "count"])
        assert len(grp) == n * cstat_op.EVAL_PCT // 100, srcname
    again = cstat_op.stratified_eval_split(docs.repartition(7)).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)


def test_stratified_sample_matches_single_window_form(spark, sf_dir):
    """The two-phase (bucketed) top-k must equal the direct per-source
    top-k — the property that makes the simple oracle valid."""
    from codex_africanus_spark.functions.text import hash60
    from pyspark.sql import Window as W

    docs = load(spark, "documents", sf_dir)
    got = cstat_op.stratified_sample_per_source(docs).toPandas()
    u = (hash60(F.col("text")) + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.size(F.split("text", " ")).cast("double")
    qkey = F.round(F.log(u) / w * F.lit(1e12)).cast("long")
    direct = (
        docs.select("doc_id", "source", qkey.alias("qkey"))
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.col("qkey").desc(), "doc_id")
            ),
        )
        .filter(F.col("rank") <= cstat_op.STRAT_K)
        .toPandas()
    )
    a = set(zip(got.source, got["rank"], got.doc_id))
    b = set(zip(direct.source, direct["rank"], direct.doc_id))
    assert a == b and len(a) > 0


def test_dsir_weights_separate_target_like_docs(spark):
    """A corpus doc made of eval-set bigrams must outscore one made of
    bigrams the eval set never contains."""
    eval_text = "the quick brown fox jumps over the lazy dog"
    rows = [(50, eval_text, "s"), (100, eval_text, "s")]  # eval stratum
    rows += [(1, "the quick brown fox jumps", "s")]  # target-like corpus doc
    rows += [(2, "zebra xylophone quartz vortex plasma", "s")]  # raw-only
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r.log_weight for r in
           cstat_op.dsir_importance_weights(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1] > out[2]


def test_embedding_dim_stats_values(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    out = cstat_op.embedding_dim_stats(emb).toPandas()
    mat = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    qm = np.round(mat * 1e6)  # the operator's fixed-point grid
    want_mean = qm.mean(axis=0) / 1e6
    want_var = (qm * qm).mean(axis=0) / 1e12 - (qm.mean(axis=0) / 1e6) ** 2
    assert np.allclose(out.dim_mean.to_numpy(), want_mean, atol=2e-9)
    assert np.allclose(out.dim_var.to_numpy(), want_var, atol=2e-9)
    assert (out.n_vecs == len(mat)).all()
