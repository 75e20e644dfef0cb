"""Verdict r14 item 3: measure the 1e-6-quantization flip rate of an
Arrow/numpy sincos tier for the predict family, per scale.

For every (source,row,chan) pair the JVM path computes
  addend = flux(src,chan) * env(u,v,...) * cos/sin(theta)
with Math.cos/sin/exp via codegen. The proposed Arrow tier would compute
env and the trig in numpy. Multiplications/additions are IEEE-identical
across both, so the only divergence sources are cos, sin, exp (and the
per-source angle trig inside env). This script computes both addends on
the SAME pairs and counts:
  - ULP-level differences in the raw doubles,
  - flips of quantize(x, 1e6) = cast(x*1e6 ± 0.5 as long)  [what qsum sums]
A single flip anywhere changes the group sum by 1e-6 and breaks the
driver's value hash vs the DuckDB oracle.

Measured results (this box, 2026-08-17, deterministic testdata):
  sf0.001: n=150000      ulp_cos=340     ulp_sin=309     ulp_env=26992     flip_re=0 flip_im=0 maxd=1.33e-15
  sf0.01 : n=1500000     ulp_cos=3044    ulp_sin=2983    ulp_env=270723    flip_re=0 flip_im=0 maxd=1.78e-15
  sf0.1  : n=15000000    ulp_cos=29733   ulp_sin=29731   ulp_env=2707122   flip_re=0 flip_im=0 maxd=1.78e-15
  sf10   : n=1500000000  ulp_cos=2988284 ulp_sin=2990382 ulp_env=270749025 flip_re=0 flip_im=0 maxd=1.78e-15
ULP-level trig/exp differences are real (~0.2% of trig, ~18% of exp
values) but no addend ever lands within ~2e-15 of a 0.5e-6 quantize
boundary on this corpus: the numpy tier is bit-identical after qsum on
every scale the driver benches or verifies.
"""
import sys
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from codex_africanus_spark.session import get_spark
from codex_africanus_spark.sources import tpch_ms
from codex_africanus_spark.sources.tables import fan_out, scan_twin
from codex_africanus_spark.functions.spectral import spectral_model
from codex_africanus_spark.functions.shapes import gaussian, GAUSS_SCALE
from codex_africanus_spark.functions.phase import phase_delay_angle, phase_path
from codex_africanus_spark.constants import MINUS_TWO_PI_OVER_C

spark = get_spark("sincos-fliprate")
spark.sparkContext.setLogLevel("ERROR")

OUT_SCHEMA = ("n long, ulp_cos long, ulp_sin long, ulp_env long, "
              "flip_re long, flip_im long, maxd_re double, maxd_im double")


def quant(x):
    v = x * 1e6
    return np.where(v >= 0, v + 0.5, v - 0.5).astype(np.int64)


def count_batches(it):
    for pdf in it:
        u = pdf["u"].to_numpy(); v = pdf["v"].to_numpy(); w = pdf["w"].to_numpy()
        l = pdf["l"].to_numpy(); m = pdf["m"].to_numpy(); n = pdf["n"].to_numpy()
        fq = pdf["frequency"].to_numpy(); flux = pdf["flux"].to_numpy()
        emaj = pdf["emaj"].to_numpy(); emin = pdf["emin"].to_numpy()
        ang = pdf["position_angle"].to_numpy()
        isg = (pdf["source_type"] == "GAUSSIAN").to_numpy()
        theta = (np.float64(MINUS_TWO_PI_OVER_C) * (u * l + v * m + w * (n - 1.0))) * fq
        ct, st = np.cos(theta), np.sin(theta)
        # gaussian env, numpy flavor
        fr = emin / emaj
        sf = fq * np.float64(GAUSS_SCALE)
        ca, sa = np.cos(ang), np.sin(ang)
        u1 = (u * ca + v * sa) * fr * (sf * emaj)
        v1 = (-u * sa + v * ca) * (sf * emaj)
        env = np.where(isg, np.exp(-(u1 * u1 + v1 * v1)), 1.0)
        re_np = (flux * env) * ct
        im_np = (flux * env) * st
        re_j = pdf["coh_re"].to_numpy(); im_j = pdf["coh_im"].to_numpy()
        cj, sj, ej = pdf["ct_j"].to_numpy(), pdf["st_j"].to_numpy(), pdf["env_j"].to_numpy()
        yield pd.DataFrame([{
            "n": len(pdf),
            "ulp_cos": int((cj.view(np.int64) != ct.view(np.int64)).sum()),
            "ulp_sin": int((sj.view(np.int64) != st.view(np.int64)).sum()),
            "ulp_env": int((ej.view(np.int64) != env.view(np.int64)).sum()),
            "flip_re": int((quant(re_j) != quant(re_np)).sum()),
            "flip_im": int((quant(im_j) != quant(im_np)).sum()),
            "maxd_re": float(np.abs(re_j - re_np).max(initial=0.0)),
            "maxd_im": float(np.abs(im_j - im_np).max(initial=0.0)),
        }])


for sf_dir in sys.argv[1:]:
    vis = tpch_ms.vis_table(spark, sf_dir)
    sources = tpch_ms.source_table(spark, sf_dir)
    chan_freq = scan_twin(vis).select("chan", "frequency").distinct()
    src_chan = (
        sources.crossJoin(chan_freq)
        .withColumn("flux", spectral_model(
            F.col("flux_i"), F.col("spi"), F.col("ref_freq"), F.col("frequency")))
        .drop("frequency")
    )
    j = fan_out(vis).join(F.broadcast(src_chan), "chan")
    theta = phase_delay_angle(
        phase_path(F.col("u"), F.col("v"), F.col("w"), F.col("l"), F.col("m"), F.col("n")),
        F.col("frequency"), "fourier")
    env_j = F.when(
        F.col("source_type") == "GAUSSIAN",
        gaussian(F.col("u"), F.col("v"), F.col("frequency"),
                 F.col("emaj"), F.col("emin"), F.col("position_angle")),
    ).otherwise(F.lit(1.0))
    flux_env = F.col("flux") * env_j
    pairs = j.select(
        "u", "v", "w", "l", "m", "n", "frequency", "flux",
        "emaj", "emin", "position_angle", "source_type",
        F.cos(theta).alias("ct_j"), F.sin(theta).alias("st_j"),
        env_j.alias("env_j"),
        (flux_env * F.cos(theta)).alias("coh_re"),
        (flux_env * F.sin(theta)).alias("coh_im"),
    )
    agg = pairs.mapInPandas(count_batches, OUT_SCHEMA).toPandas()
    tot = agg.sum(numeric_only=True)
    print(f"## {sf_dir}: n={int(tot['n'])} "
          f"ulp_cos={int(tot['ulp_cos'])} ulp_sin={int(tot['ulp_sin'])} "
          f"ulp_env={int(tot['ulp_env'])} flip_re={int(tot['flip_re'])} "
          f"flip_im={int(tot['flip_im'])} maxd_re={agg['maxd_re'].max():.3e} "
          f"maxd_im={agg['maxd_im'].max():.3e}", flush=True)
print("DONE")
