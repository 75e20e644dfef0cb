"""Tigger `.lsm.html` reader: format corners of the reference's
parse_sky_model (/root/reference/africanus/rime/examples/predict.py:248-347)."""

import math

import pytest

from codex_africanus_spark.sources.tigger import read_tigger_model


def write_model(tmp_path, body_lines, freq0="856e6"):
    p = tmp_path / "model.lsm.html"
    header = f"<HTML><BODY mdltype=SkyModel freq0={freq0}>"
    p.write_text("\n".join([header, *body_lines, "</BODY></HTML>"]) + "\n")
    return str(p)


def test_point_and_gauss_routing(spark, tmp_path):
    path = write_model(
        tmp_path,
        [
            '<A mdltype=Source name="pt1" typecode=pnt> '
            "<A mdltype=Position ra=0.25 dec=-0.125> "
            "<A mdltype=Flux I=2.0 Q=0.5 U=0.0 V=0.0> "
            "<A mdltype=Spectrum spi=-0.7 freq0=1.4e9>",
            '<A mdltype=Source name="g1" typecode=gau> '
            "<A mdltype=Position ra=0.5 dec=0.25> "
            "<A mdltype=Flux I=3.0 Q=0.0 U=0.0 V=0.0> "
            "<A mdltype=Gaussian ex=0.004 ey=0.002 pa=0.3>",
        ],
    )
    rows = {r.name: r for r in read_tigger_model(spark, path).collect()}
    assert set(rows) == {"pt1", "g1"}
    pt, g = rows["pt1"], rows["g1"]
    assert pt.source_type == "pnt" and g.source_type == "gau"
    assert pt.ra == 0.25 and pt.dec == -0.125
    assert pt.flux_i == 2.0 and pt.flux_q == 0.5
    # per-source spectrum wins (predict.py:292-295)
    assert pt.spi == -0.7 and pt.ref_freq == 1.4e9
    assert pt.emaj is None and pt.emin is None
    # spectrum-less source: zero SPI, model-level freq0 (predict.py:296,302-304)
    assert g.spi == 0.0 and g.ref_freq == 856e6
    assert (g.emaj, g.emin, g.position_angle) == (0.004, 0.002, 0.3)


def test_quoted_and_case_insensitive_attrs(spark, tmp_path):
    path = write_model(
        tmp_path,
        [
            '<A MDLTYPE=Source NAME="s with space" TYPECODE=PNT> '
            '<A MDLTYPE=Position RA="0.125" DEC="-0.5"> '
            "<A MDLTYPE=Flux I=1.5>",
        ],
    )
    (row,) = read_tigger_model(spark, path).collect()
    assert row.name == "s with space"
    assert row.source_type == "pnt"
    assert row.ra == 0.125 and row.dec == -0.5
    # missing Q/U/V default to zero flux
    assert (row.flux_q, row.flux_u, row.flux_v) == (0.0, 0.0, 0.0)


def test_unknown_morphology_raises(spark, tmp_path):
    path = write_model(
        tmp_path,
        [
            '<A mdltype=Source name="bad" typecode=disk> '
            "<A mdltype=Position ra=0.1 dec=0.1> <A mdltype=Flux I=1.0>",
        ],
    )
    # predict.py:322-323 raises on unknown typecodes
    with pytest.raises(ValueError, match="morphology"):
        read_tigger_model(spark, path)


def test_no_model_freq0_yields_null_ref_freq(spark, tmp_path):
    p = tmp_path / "model.lsm.html"
    p.write_text(
        "<HTML><BODY mdltype=SkyModel>\n"
        '<A mdltype=Source name="s0" typecode=pnt> '
        "<A mdltype=Position ra=0.1 dec=0.2> <A mdltype=Flux I=1.0>\n"
        "</BODY></HTML>\n"
    )
    (row,) = read_tigger_model(spark, str(p)).collect()
    assert row.ref_freq is None and row.spi == 0.0
    assert math.isclose(row.ra, 0.1)
