"""Arbitrary-order 2-D complex shapelet envelopes — the UDF tier of the
shapelet family (orders 0..3 stay pure Column expressions in
functions/shapes.shapelet_1d; this module lifts the order restriction).

Capability parity with /root/reference/africanus/model/shape/shapelets.py:
- complex_basis_function (:36-44): i^n-weighted Hermite basis in Fourier
  space, scale = 1/beta, an extra sqrt(2*pi)/delta_x pixel factor;
- shapelet (:57-99): per (row, chan, source) double sum
  sum_{n1,n2} c[n1,n2] * B(n1, fu) * B(n2, fv), with beta == 0 short-
  circuiting to 1;
- shapelet_with_w_term (:102-149): the same envelope times the
  phase-steer/w-correction factor (:47-53). Spark-first, that phase IS
  expressible as Columns (functions/phase.py), so here the UDF computes
  ONLY what SQL cannot — the arbitrary-order Hermite recursion — and the
  caller composes the w-term phase expression-side, keeping it inside
  whole-stage codegen.

Vectorization: Arrow-batched pandas UDF; the Hermite recursion runs once
per order over the whole batch (NumPy arrays), so cost is
O(orders * batch) with no per-row Python. The fixed-coefficient path
accumulates terms in a deterministic order with arithmetic structured to
be mirrored exactly by a generated DuckDB SQL oracle
(functions/shapes.shapelet_2d_sql_columns).

UDF bodies are self-contained closures over plain scalars/lists only —
executors cannot import this package (driver harness contract).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

TWO_PI = 6.283185307179586
LIGHTSPEED = 299792458.0


def basis_konstants(kmax: int) -> list[float]:
    """Per-order scalar 2^n * sqrt(pi) * n! — computed once here so the
    UDF and the SQL mirror bake the SAME double literal."""
    out, fact = [], 1.0
    for n in range(kmax):
        if n > 0:
            fact *= n
        out.append(2.0**n * math.sqrt(math.pi) * fact)
    return out


_SH_SCHEMA = StructType(
    [StructField("re", DoubleType()), StructField("im", DoubleType())]
)


def shapelet_2d(
    df: DataFrame,
    coeffs,
    u_col: str = "u_coord",
    v_col: str = "v_coord",
    freq_col: str = "frequency",
    beta_u_col: str = "beta_u",
    beta_v_col: str = "beta_v",
    delta_l: float = 0.01,
    delta_m: float = 0.01,
    out_prefix: str = "sh",
) -> DataFrame:
    """Attach `{out_prefix}_re/_im` complex shapelet envelope columns.

    `coeffs` is either a rectangular Python matrix (one coefficient set
    for every source — the exact-oracle-able fast path) or a column name
    holding per-source array<array<double>> matrices (the reference's
    (nsrc, nmax1, nmax2) signature, shapelets.py:63-64)."""
    twopi, light = TWO_PI, LIGHTSPEED
    f1 = math.sqrt(TWO_PI) / delta_l
    f2 = math.sqrt(TWO_PI) / delta_m

    if not isinstance(coeffs, str):
        C = [[float(c) for c in row] for row in coeffs]
        K1, K2 = len(C), len(C[0])
        konst1, konst2 = basis_konstants(K1), basis_konstants(K2)

        @F.pandas_udf(_SH_SCHEMA)
        def sample(u, v, f, bu, bv):
            import numpy as np
            import pandas as pd

            def real_factors(coord, freq, beta, konsts, flit):
                # real magnitude of complex_basis_function (:36-44);
                # the i^n axis factor is applied in the term loop
                fx = coord * twopi * freq / light
                x = twopi * fx
                scale = 1.0 / beta
                xs = x / scale
                env = np.exp(-(x * x) / (2.0 * scale * scale))
                H = [np.ones_like(xs)]
                if len(konsts) > 1:
                    H.append(2.0 * xs)
                for n in range(2, len(konsts)):
                    H.append(2.0 * xs * H[n - 1] - (2.0 * (n - 1)) * H[n - 2])
                return [
                    (1.0 / np.sqrt(k * scale)) * H[n] * env * flit
                    for n, k in enumerate(konsts)
                ]

            U, V = u.to_numpy(np.float64), v.to_numpy(np.float64)
            Fq = f.to_numpy(np.float64)
            BU, BV = bu.to_numpy(np.float64), bv.to_numpy(np.float64)
            safe_u = np.where(BU == 0.0, 1.0, BU)
            safe_v = np.where(BV == 0.0, 1.0, BV)
            R1 = real_factors(U, Fq, safe_u, konst1, f1)
            R2 = real_factors(V, Fq, safe_v, konst2, f2)
            acc_re = np.zeros(len(U))
            acc_im = np.zeros(len(U))
            # deterministic (n1, n2) order, zero coeffs skipped — both
            # mirrored term-for-term by the SQL oracle generator
            for n1 in range(K1):
                for n2 in range(K2):
                    c = C[n1][n2]
                    if c == 0.0:
                        continue
                    t = c * R1[n1] * R2[n2]
                    k = (n1 + n2) % 4
                    if k == 0:
                        acc_re = acc_re + t
                    elif k == 1:
                        acc_im = acc_im + t
                    elif k == 2:
                        acc_re = acc_re - t
                    else:
                        acc_im = acc_im - t
            mask = (BU == 0.0) | (BV == 0.0)
            acc_re[mask], acc_im[mask] = 1.0, 0.0
            return pd.DataFrame({"re": acc_re, "im": acc_im})

        struct = sample(F.col(u_col), F.col(v_col), F.col(freq_col),
                        F.col(beta_u_col), F.col(beta_v_col))
    else:
        coeffs_col = coeffs
        math_sqrt_pi = math.sqrt(math.pi)

        @F.pandas_udf(_SH_SCHEMA)
        def sample_per_source(u, v, f, bu, bv, cc):
            import numpy as np
            import pandas as pd

            def kons(kmax):
                out, fact = [], 1.0
                for n in range(kmax):
                    if n > 0:
                        fact *= n
                    out.append(2.0**n * math_sqrt_pi * fact)
                return out

            def real_factors(coord, freq, beta, konsts, flit):
                fx = coord * twopi * freq / light
                x = twopi * fx
                scale = 1.0 / beta
                xs = x / scale
                env = np.exp(-(x * x) / (2.0 * scale * scale))
                H = [np.ones_like(xs)]
                if len(konsts) > 1:
                    H.append(2.0 * xs)
                for n in range(2, len(konsts)):
                    H.append(2.0 * xs * H[n - 1] - (2.0 * (n - 1)) * H[n - 2])
                return [
                    (1.0 / np.sqrt(k * scale)) * H[n] * env * flit
                    for n, k in enumerate(konsts)
                ]

            U, V = u.to_numpy(np.float64), v.to_numpy(np.float64)
            Fq = f.to_numpy(np.float64)
            BU, BV = bu.to_numpy(np.float64), bv.to_numpy(np.float64)
            n_rows = len(U)
            k1 = max((len(m) for m in cc), default=1)
            k2 = max((len(r) for m in cc for r in m), default=1)
            Cm = np.zeros((n_rows, k1, k2))
            for i, m in enumerate(cc):
                for j, row in enumerate(m):
                    Cm[i, j, : len(row)] = row
            safe_u = np.where(BU == 0.0, 1.0, BU)
            safe_v = np.where(BV == 0.0, 1.0, BV)
            R1 = np.stack(real_factors(U, Fq, safe_u, kons(k1), f1))
            R2 = np.stack(real_factors(V, Fq, safe_v, kons(k2), f2))
            # i^(n1+n2) routes each term onto the (re, im) axes
            rot = 1j ** (np.arange(k1)[:, None] + np.arange(k2)[None, :])
            res = np.einsum("ijk,jk,ji,ki->i", Cm, rot, R1, R2)
            mask = (BU == 0.0) | (BV == 0.0)
            res[mask] = 1.0
            return pd.DataFrame({"re": res.real, "im": res.imag})

        struct = sample_per_source(
            F.col(u_col), F.col(v_col), F.col(freq_col),
            F.col(beta_u_col), F.col(beta_v_col), F.col(coeffs_col),
        )

    return (
        df.withColumn("__sh2d", struct)
        .withColumn(f"{out_prefix}_re", F.col("__sh2d.re"))
        .withColumn(f"{out_prefix}_im", F.col("__sh2d.im"))
        .drop("__sh2d")
    )
