"""Spherical harmonics (core/shvector.py — shvector.cpp counterpart)."""

import numpy as np
import jax.numpy as jnp

from alvrl_tpu.core import shvector as sh


def _sphere_samples(n=20000, seed=0):
    rs = np.random.default_rng(seed)
    v = rs.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_basis_orthonormal():
    """Monte-Carlo check of <Y_i, Y_j> = delta_ij over the sphere."""
    d = jnp.asarray(_sphere_samples(), jnp.float32)
    B = np.asarray(sh.eval_basis(3, d))      # (N, 9)
    gram = B.T @ B / B.shape[0] * 4.0 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.06)


def test_known_values():
    """Y00 = 1/(2 sqrt(pi)); Y10 proportional to z with the physics
    normalization sqrt(3/4pi)."""
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    B = np.asarray(sh.eval_basis(2, d))
    np.testing.assert_allclose(B[:, sh._index(0, 0)],
                               1.0 / (2.0 * np.sqrt(np.pi)), rtol=1e-5)
    np.testing.assert_allclose(B[0, sh._index(1, 0)],
                               np.sqrt(3.0 / (4.0 * np.pi)), rtol=1e-5)
    assert abs(B[1, sh._index(1, 0)]) < 1e-6


def test_project_eval_roundtrip():
    """A band-limited function (an order-2 expansion) must project and
    re-evaluate exactly (to quadrature accuracy)."""
    rs = np.random.default_rng(3)
    c_true = jnp.asarray(rs.normal(size=(9,)), jnp.float32)

    def fn(d):
        return sh.eval(c_true, d)

    c = np.asarray(sh.project(fn, bands=3, res=48))
    np.testing.assert_allclose(c, np.asarray(c_true), atol=2e-3)
    d = jnp.asarray(_sphere_samples(512, 1), jnp.float32)
    np.testing.assert_allclose(np.asarray(sh.eval(c, d)),
                               np.asarray(fn(d)), atol=5e-3)


def test_convolve_cosine_lobe():
    """Funk-Hecke: convolving the constant function with a zonal
    kernel k yields a constant scaled by the kernel's integral."""
    const = sh.project(lambda d: jnp.ones(d.shape[:-1]), bands=3,
                       res=48)

    def kernel(d):
        return jnp.maximum(d[..., 2], 0.0)  # clamped-cosine zonal lobe

    k = sh.project(kernel, bands=3, res=48)
    out = np.asarray(sh.convolve(const, k))
    # out should be constant = (1/4pi) * integral(k) * ... : check by
    # evaluating — a zonal convolution of a constant stays constant
    d = jnp.asarray(_sphere_samples(256, 2), jnp.float32)
    vals = np.asarray(sh.eval(out, d))
    assert vals.std() < 1e-3 * max(abs(vals.mean()), 1e-6) + 1e-4
    # and equals integral(kernel)/(4pi) * integral-preserving scale:
    # for f = const c0*Y00, out = sqrt(4pi) * k00 * c0 * Y00
    # -> value = k_integral / (4 pi) * f_value * ... sanity: positive
    assert vals.mean() > 0
