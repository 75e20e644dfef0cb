"""Convolution-kernel tap library for the footprint gridder — the
anti-aliasing window functions of the reference's
gridding/perleypolyhedron/kernels.py (uspace :16-33, sinc :36-42,
kbsinc :52-66, hanningsinc :74-83, pack/unpack :86-115, detaper
:118-164), NumPy-only (the Bessel J_n falls back to quadrature since
scipy is absent here).

Driver-side by design: a kernel is O(oversample·(W+2)) floats — it never
ships as data, only as generated Column literals (operators/gridding
grid_convolved explodes the footprint as literal structs) or a broadcast
array for pandas-UDF degridders. The taps therefore cost nothing at
100 TB; the row expansion factor W² is the scale knob.
"""

from __future__ import annotations

import numpy as np


def uspace(W: int, oversample: int = 5) -> np.ndarray:
    """Oversampled tap coordinates: W odd taps centred on 0, padded by one
    unit each side, `oversample` samples per unit."""
    if W % 2 != 1:
        raise ValueError("kernel full support W must be odd")
    return np.arange(oversample * (W + 2)) / float(oversample) - (W + 2) // 2


def sinc_kernel(W: int, oversample: int = 5, a: float = 1.0) -> np.ndarray:
    """Oversampled sinc window, normalized to unit sum."""
    res = np.sinc(uspace(W, oversample) * a)
    return res / np.sum(res)


def hanning_sinc_kernel(W: int, a: float = 0.5, oversample: int = 5) -> np.ndarray:
    """Hanning-windowed sinc (a=0.5 is the plain Hann window; the
    reference auto-fits `a` per support width — pass it explicitly)."""
    u = uspace(W, oversample)
    wnd = a + (1 - a) * np.cos(2.0 * np.pi / ((W + 2) + 1) * u)
    res = sinc_kernel(W, oversample=oversample) * wnd
    return res / np.sum(res)


def bessel_jn(order: int, x: np.ndarray, n_quad: int = 4096) -> np.ndarray:
    """Bessel function of the first kind J_n via the integral
    representation J_n(x) = (1/π)∫₀^π cos(nθ − x·sinθ) dθ (trapezoid
    quadrature) — the scipy.special.jn stand-in."""
    theta = np.linspace(0.0, np.pi, n_quad)
    x = np.asarray(x, dtype=np.float64)
    integrand = np.cos(order * theta[None, :] - x[..., None] * np.sin(theta[None, :]))
    trapz = getattr(np, "trapezoid", None) or np.trapz
    return trapz(integrand, theta, axis=-1) / np.pi


def kaiser_bessel_sinc_kernel(
    W: int, b: float, oversample: int = 5, order: int = 15
) -> np.ndarray:
    """Modified Kaiser-Bessel windowed sinc (Jackson et al. 1991, with
    the reference's higher-order-Bessel modification). `b` is the shape
    parameter (the reference auto-fits it per support — pass explicitly)."""
    u = uspace(W, oversample)
    arg = 1.0 - (2.0 * u / ((W + 2) + 1)) ** 2
    wnd = bessel_jn(order, b * np.sqrt(np.maximum(arg, 0.0))) / ((W + 2) + 1)
    res = sinc_kernel(W, oversample=oversample) * wnd * np.sum(wnd)
    return res / np.sum(res)


def pack_kernel(K: np.ndarray, W: int, oversample: int = 5) -> np.ndarray:
    """Group taps by oversampling phase (cache-coherent layout for a
    gather inner loop)."""
    out = np.empty_like(K)
    for t in range(oversample):
        out[t * (W + 2) : (t + 1) * (W + 2)] = K[t::oversample]
    return out


def unpack_kernel(K: np.ndarray, W: int, oversample: int = 5) -> np.ndarray:
    out = np.empty_like(K)
    for t in range(oversample):
        out[t::oversample] = K[t * (W + 2) : (t + 1) * (W + 2)]
    return out


def detaper_fft(npix: int, K2d: np.ndarray, W: int, oversample: int = 5) -> np.ndarray:
    """Image-plane detaper of a 2-D kernel by the similarity theorem:
    embed the kernel at the centre of an (npix·oversample)² grid, FFT,
    crop the central npix² — |F(kernel)| sampled on the image grid."""
    n = npix * oversample
    pk = np.zeros((n, n))
    r0 = n // 2 - K2d.shape[0] // 2
    c0 = n // 2 - K2d.shape[1] // 2
    pk[r0 : r0 + K2d.shape[0], c0 : c0 + K2d.shape[1]] = K2d
    fpk = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(pk)))
    lo = n // 2 - npix // 2
    return np.abs(fpk[lo : lo + npix, lo : lo + npix])


def detaper_dft(npix: int, K2d: np.ndarray, W: int, oversample: int = 5) -> np.ndarray:
    """Direct-DFT detaper on the image grid (the memory-lean twin; used
    as the oracle for detaper_fft in tests)."""
    ks = uspace(W, oversample)
    yy, xx = np.meshgrid(ks, ks, indexing="ij")
    out = np.zeros((npix, npix), dtype=np.complex128)
    for mm in range(npix):
        mN = (mm - npix // 2) / float(npix)
        for ll in range(npix):
            lN = (ll - npix // 2) / float(npix)
            out[mm, ll] = np.sum(K2d * np.exp(-2.0j * np.pi * (lN * xx + mN * yy)))
    return np.abs(out)


def taps_to_pairs(kernel: np.ndarray, W: int) -> list[tuple[int, float]]:
    """Integer-sampled (oversample=1) kernel → [(cell offset, weight)]
    pairs for the footprint gridder's literal-struct explode
    (operators/gridding.grid_convolved). Drops the zero padding taps."""
    if len(kernel) != W + 2:
        raise ValueError(f"expected {W + 2} taps at oversample=1, got {len(kernel)}")
    half = (W + 2) // 2
    return [
        (i - half, float(w))
        for i, w in enumerate(kernel)
        if abs(w) > 0.0 and abs(i - half) <= W // 2
    ]
