"""Tigger LSM (`.lsm.html`) sky-model reader.

Capability parity with the reference's primary CLI ingest path,
``parse_sky_model`` (/root/reference/africanus/rime/examples/predict.py:248-347),
which loads a Tigger sky model and splits it into point / gaussian source
frames with per-source (ra, dec), (I, Q, U, V), spectral index, reference
frequency, and (emaj, emin, pa) shape. Semantics mirrored here:

- ``typecode`` routes sources: ``pnt`` → point, ``gau`` → gaussian
  (predict.py:283,306-323); any other typecode is an error.
- Spectrum: per-source ``spi``/``freq0``; a source without a spectrum
  falls back to the model-level ``freq0`` and a zero spectral index
  (predict.py:290-304 — the except-branch appends ``[0,0,0,0]``).
- Gaussian shape attributes ``ex``/``ey``/``pa`` are radians, as stored
  by Tigger (predict.py:307-309 uses them directly).

File format: the public Tigger-LSM HTML serialization writes one source
per line as nested anchor tags carrying ``mdltype`` class attributes::

    <A mdltype=Source name="s3" typecode=gau> ...
      <A mdltype=Position ra=0.33 dec=-0.185> ...
      <A mdltype=Flux I=4.0 Q=0.0 U=0.15 V=0.0> ...
      <A mdltype=Spectrum spi=-0.67 freq0=1400000000.0> ...
      <A mdltype=Gaussian ex=0.004 ey=0.002 pa=0.3> ...

plus a model-level ``<A mdltype=SkyModel freq0=...>`` header. Attribute
values may be quoted or bare, any case.

Spark-first: ``spark.read.text`` (line-oriented — a directory of models
scales out), the one-line model header is parsed on the driver, and all
per-source extraction is regexp Column expressions — no Python UDFs, so
catalogue ingest stays JVM-side at any size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tag(cls: str):
    """Column: the full `<A ... mdltype=cls ...>` tag text on this line."""
    return F.regexp_extract(
        F.col("value"), rf"(?i)(<A[^>]*\bmdltype={cls}\b[^>]*>)", 1
    )


def _attr(tag_col, name: str):
    """Column: attribute value (quoted or bare) inside an extracted tag."""
    quoted = F.regexp_extract(tag_col, rf"(?i)\b{name}\s*=\s*\"([^\"]*)\"", 1)
    bare = F.regexp_extract(tag_col, rf"(?i)\b{name}\s*=\s*([^\s>\"']+)", 1)
    return F.when(F.length(quoted) > 0, quoted).otherwise(bare)


def _num(tag_col, name: str):
    v = _attr(tag_col, name)
    return F.when(F.length(v) > 0, v.cast("double"))


def read_tigger_model(spark: SparkSession, path: str) -> DataFrame:
    """Read a Tigger `.lsm.html` sky model into a typed source DataFrame.

    Output schema: name, source_type ('pnt'|'gau'), ra, dec (radians),
    flux_i/q/u/v, spi, ref_freq, emaj, emin, position_angle (radians;
    null for point sources). Spectrum-less sources get spi=0.0 and the
    model-level freq0, matching parse_sky_model's fallback.
    """
    lines = spark.read.text(path)

    # Model-level defaults: one header line, parsed on the driver
    # (mirrors sky_model.freq0, predict.py:296).
    header_rows = (
        lines.filter(F.col("value").rlike(r"(?i)\bmdltype=SkyModel\b")).limit(1).collect()
    )
    model_freq0 = None
    if header_rows:
        m = re.search(
            r"(?i)\bfreq0\s*=\s*\"?([-+0-9.eE]+)", header_rows[0].value
        )
        if m:
            model_freq0 = float(m.group(1))

    src = lines.filter(F.col("value").rlike(r"(?i)\bmdltype=Source\b"))
    source_tag = _tag("Source")
    pos_tag = _tag("Position")
    flux_tag = _tag("Flux")
    spec_tag = _tag("Spectrum")
    shape_tag = _tag("Gaussian")

    typecode = F.lower(_attr(source_tag, "typecode"))
    has_spectrum = F.length(spec_tag) > 0

    out = src.select(
        _attr(source_tag, "name").alias("name"),
        typecode.alias("source_type"),
        _num(pos_tag, "ra").alias("ra"),
        _num(pos_tag, "dec").alias("dec"),
        F.coalesce(_num(flux_tag, "I"), F.lit(0.0)).alias("flux_i"),
        F.coalesce(_num(flux_tag, "Q"), F.lit(0.0)).alias("flux_q"),
        F.coalesce(_num(flux_tag, "U"), F.lit(0.0)).alias("flux_u"),
        F.coalesce(_num(flux_tag, "V"), F.lit(0.0)).alias("flux_v"),
        # no spectrum → zero SPI (predict.py:302-304)
        F.when(has_spectrum, F.coalesce(_num(spec_tag, "spi"), F.lit(0.0)))
        .otherwise(F.lit(0.0))
        .alias("spi"),
        # spectrum freq0, else model freq0 (predict.py:292-296)
        F.coalesce(
            _num(spec_tag, "freq0"),
            F.lit(model_freq0).cast("double"),
        ).alias("ref_freq"),
        _num(shape_tag, "ex").alias("emaj"),
        _num(shape_tag, "ey").alias("emin"),
        _num(shape_tag, "pa").alias("position_angle"),
    )

    # Unknown morphologies are an error in the reference (predict.py:322-323).
    bad = out.filter(~F.col("source_type").isin("pnt", "gau")).limit(1).collect()
    if bad:
        raise ValueError(f"Unknown source morphology {bad[0].source_type!r}")
    return out
