"""Facet baseline (uvw) transform policies — Column-expression bundles.

Capability parity with /root/reference/africanus/gridding/perleypolyhedron/
policies/baseline_transform_policies.py:
- uvw_rotate (:10-49): rotate uvw so the facet image is tangent to the
  celestial sphere at the new delay centre — the 3×3 matrix
  T(ra,dec)·T(ra0,dec0)ᵀ of the docstring (Thompson/Moran/Swenson ch. 4,
  left-handed). NOTE: we implement the documented matrix applied to the
  ORIGINAL (u, v, w) vector; the reference kernel updates in place (its
  second row reads the already-overwritten first component and indexes
  uvw[3]) — the docstring's stated transformation is the behavior
  reproduced here.
- uvw_planarwapprox (:52-78): Kogan & Greisen AIPS Memo 113 planar
  approximation — subtract the w-projection of the facet-centre direction
  cosines, keeping facets parallel to the original plane.

Everything is per-row trig arithmetic ⇒ pure Catalyst expressions inside
whole-stage codegen; the facet centre is a pair of scalar literals, so
the trig of the centres constant-folds at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uvw_rotate(
    u: Column, v: Column, w: Column,
    ra0: Column, dec0: Column, ra: Column, dec: Column,
) -> tuple[Column, Column, Column]:
    """Rotate (u, v, w) from phase centre (ra0, dec0) to facet centre
    (ra, dec): uvw' = T(ra,dec) · T(ra0,dec0)ᵀ · uvw."""
    d_ra = ra - ra0
    cdr, sdr = F.cos(d_ra), F.sin(d_ra)
    cnd, snd = F.cos(dec), F.sin(dec)
    cod, sod = F.cos(dec0), F.sin(dec0)
    m11, m12, m13 = cdr, sod * sdr, -cod * sdr
    m21 = -snd * sdr
    m22 = snd * sod * cdr + cnd * cod
    m23 = -cod * snd * cdr + cnd * sod
    m31 = cnd * sdr
    m32 = -cnd * sod * cdr + snd * cod
    m33 = cnd * cod * cdr + snd * sod
    return (
        m11 * u + m12 * v + m13 * w,
        m21 * u + m22 * v + m23 * w,
        m31 * u + m32 * v + m33 * w,
    )


def uvw_planar_w_approx(
    u: Column, v: Column, w: Column,
    ra0: Column, dec0: Column, ra: Column, dec: Column,
) -> tuple[Column, Column]:
    """Planar w-approximation: (u − w·l₀/n₀, v − w·m₀/n₀); w unchanged.
    (l₀, m₀, n₀) are the facet centre's direction cosines w.r.t. the
    phase centre."""
    d_ra = ra - ra0
    cdr, sdr = F.cos(d_ra), F.sin(d_ra)
    cnd, snd = F.cos(dec), F.sin(dec)
    cod, sod = F.cos(dec0), F.sin(dec0)
    l0 = cnd * sdr
    m0 = snd * cod - cnd * sod * cdr
    n0 = snd * sod + cnd * cod * cdr
    return (u - w * l0 / n0, v - w * m0 / n0)


# SQL mirrors ---------------------------------------------------------------

def uvw_rotate_sql(
    u: str, v: str, w: str, ra0: str, dec0: str, ra: str, dec: str
) -> tuple[str, str, str]:
    dr = f"(({ra}) - ({ra0}))"
    cdr, sdr = f"cos{dr}", f"sin{dr}"
    cnd, snd = f"cos({dec})", f"sin({dec})"
    cod, sod = f"cos({dec0})", f"sin({dec0})"
    up = (
        f"({cdr} * ({u}) + ({sod} * {sdr}) * ({v})"
        f" + (-{cod} * {sdr}) * ({w}))"
    )
    vp = (
        f"((-{snd} * {sdr}) * ({u})"
        f" + ({snd} * {sod} * {cdr} + {cnd} * {cod}) * ({v})"
        f" + (-{cod} * {snd} * {cdr} + {cnd} * {sod}) * ({w}))"
    )
    wp = (
        f"(({cnd} * {sdr}) * ({u})"
        f" + (-{cnd} * {sod} * {cdr} + {snd} * {cod}) * ({v})"
        f" + ({cnd} * {cod} * {cdr} + {snd} * {sod}) * ({w}))"
    )
    return up, vp, wp


def uvw_planar_w_approx_sql(
    u: str, v: str, w: str, ra0: str, dec0: str, ra: str, dec: str
) -> tuple[str, str]:
    dr = f"(({ra}) - ({ra0}))"
    cdr, sdr = f"cos{dr}", f"sin{dr}"
    cnd, snd = f"cos({dec})", f"sin({dec})"
    cod, sod = f"cos({dec0})", f"sin({dec0})"
    l0 = f"({cnd} * {sdr})"
    m0 = f"({snd} * {cod} - {cnd} * {sod} * {cdr})"
    n0 = f"({snd} * {sod} + {cnd} * {cod} * {cdr})"
    return (
        f"(({u}) - ({w}) * {l0} / {n0})",
        f"(({v}) - ({w}) * {m0} / {n0})",
    )
