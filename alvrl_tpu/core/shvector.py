"""Real spherical harmonics expansions — the shvector.cpp counterpart.

The reference's SHVector (include/mitsuba/core/shvector.h,
src/libcore/shvector.cpp) stores band-limited real-SH expansions of
spherical functions with evaluation, projection (numerical
quadrature), Funk-Hecke convolution against zonal kernels, and
rotation. This port covers the same surface in vectorized jnp:

  * eval_basis(bands, d): all real SH basis values Y_lm at unit
    directions (the reference's eval(theta, phi), shvector.h:150-200),
    using the physics normalization and the real-basis sign
    convention of the reference (sqrt2 * cos/sin(m phi) * K_lm * P_lm);
  * project(fn, bands, res): coefficients by the same latitude-
    longitude product quadrature the reference uses
    (shvector.h:298-345);
  * eval(coeffs, d): expansion evaluation;
  * convolve(coeffs, kernel): Funk-Hecke zonal convolution
    (shvector.h:292-296 / shvector.cpp convolve);
  * rotate_zyz / rotation about axes via the band-recursive method is
    NOT ported (the reference uses it only through its GUI
    precomputation paths); projecting the rotated function directly is
    the supported route and is exact for band-limited inputs.

Associated Legendre polynomials run the standard stable recurrence
(the reference's legendreP, quad.cpp)."""

from __future__ import annotations

from functools import lru_cache
import math

import jax.numpy as jnp
import numpy as np


def n_coeffs(bands: int) -> int:
    return bands * bands


def _index(l: int, m: int) -> int:
    return l * (l + 1) + m


@lru_cache(maxsize=None)
def _norm_k(l: int, m: int) -> float:
    """K_lm = sqrt((2l+1)/(4pi) * (l-m)!/(l+m)!) (shvector.h:385)."""
    am = abs(m)
    return math.sqrt(
        (2 * l + 1) / (4.0 * math.pi)
        * math.factorial(l - am) / math.factorial(l + am))


def _legendre_all(bands: int, x):
    """Associated Legendre P_l^m(x) for all 0<=m<=l<bands; returns a
    dict {(l, m): array} via the standard recurrences."""
    out = {}
    pmm = jnp.ones_like(x)
    somx2 = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    for m in range(bands):
        if m > 0:
            pmm = pmm * (-(2 * m - 1)) * somx2
        out[(m, m)] = pmm
        if m + 1 < bands:
            pmmp1 = x * (2 * m + 1) * pmm
            out[(m + 1, m)] = pmmp1
            pll_prev, pll = pmm, pmmp1
            for l in range(m + 2, bands):
                cur = ((2 * l - 1) * x * pll
                       - (l + m - 1) * pll_prev) / (l - m)
                out[(l, m)] = cur
                pll_prev, pll = pll, cur
    return out


def eval_basis(bands: int, d):
    """All real SH basis values at unit directions d (..., 3) ->
    (..., bands^2), ordered l*(l+1)+m (the reference's storage)."""
    d = jnp.asarray(d, jnp.float32)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    phi = jnp.arctan2(y, x)
    P = _legendre_all(bands, z)
    cols = [None] * n_coeffs(bands)
    sqrt2 = math.sqrt(2.0)
    for l in range(bands):
        cols[_index(l, 0)] = _norm_k(l, 0) * P[(l, 0)]
        for m in range(1, l + 1):
            base = sqrt2 * _norm_k(l, m) * P[(l, m)]
            cols[_index(l, m)] = base * jnp.cos(m * phi)
            cols[_index(l, -m)] = base * jnp.sin(m * phi)
    return jnp.stack(cols, axis=-1)


def eval(coeffs, d):
    """Evaluate an expansion at unit directions (shvector.h eval)."""
    coeffs = jnp.asarray(coeffs)
    bands = int(round(math.sqrt(coeffs.shape[-1])))
    return jnp.sum(eval_basis(bands, d) * coeffs, axis=-1)


def project(fn, bands: int, res: int = 32):
    """Numerical projection of fn(d (...,3)) -> (bands^2,) coeffs by
    the reference's theta x 2*res phi product rule with sin(theta)
    weights (shvector.h:298-345)."""
    theta = (np.arange(res) + 0.5) / res * np.pi
    phi = (np.arange(2 * res) + 0.5) / (2 * res) * 2.0 * np.pi
    T, Ph = np.meshgrid(theta, phi, indexing="ij")
    st, ct = np.sin(T), np.cos(T)
    d = jnp.asarray(np.stack(
        [st * np.cos(Ph), st * np.sin(Ph), ct], axis=-1), jnp.float32)
    w = jnp.asarray(st * (np.pi / res) * (np.pi / res), jnp.float32)
    vals = jnp.asarray(fn(d))
    basis = eval_basis(bands, d)
    return jnp.sum(basis * (vals * w)[..., None], axis=(0, 1))


def convolve(coeffs, kernel_coeffs):
    """Funk-Hecke convolution with a rotationally symmetric (zonal)
    kernel: out_lm = sqrt(4pi/(2l+1)) * kernel_l0 * in_lm
    (shvector.cpp convolve)."""
    coeffs = jnp.asarray(coeffs)
    bands = int(round(math.sqrt(coeffs.shape[-1])))
    scale = np.zeros(n_coeffs(bands), np.float32)
    kc = np.asarray(kernel_coeffs)
    for l in range(bands):
        alpha = math.sqrt(4.0 * math.pi / (2 * l + 1))
        for m in range(-l, l + 1):
            scale[_index(l, m)] = alpha * kc[_index(l, 0)]
    return coeffs * jnp.asarray(scale)
