"""Oriented phase functions: Kajiya-Kay + Gaussian micro-flakes
(src/phase/kkay.cpp, microflake.cpp) — normalization, sampler
consistency (chi-square), and the directional extinction lut."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import chisquare, rng
from alvrl_tpu.media import phase as ph

ORIENT = jnp.array([0.0, 0.0, 1.0])
WI = jnp.array([np.sin(1.1), 0.0, np.cos(1.1)], jnp.float32)


def _sphere_integral(f, n=256):
    th = (np.arange(n) + 0.5) / n * np.pi
    phi = (np.arange(2 * n) + 0.5) / (2 * n) * 2 * np.pi
    t, p = np.meshgrid(th, phi, indexing="ij")
    wo = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], -1
    ).reshape(-1, 3).astype(np.float32)
    vals = np.asarray(jax.vmap(f)(jnp.asarray(wo))).reshape(n, 2 * n)
    return (vals * np.sin(t)).sum() * (np.pi / n) * (np.pi / n)


def test_microflake_normalized():
    pp = ph.microflake_params(0.3)
    integ = _sphere_integral(
        lambda w: ph.eval_microflake(pp, ORIENT, WI, w))
    assert abs(integ - 1.0) < 5e-3, integ


def test_microflake_sampler_chisquare():
    pp = ph.microflake_params(0.25)

    def sample_fn(n):
        u = jax.random.uniform(jax.random.key(3), (n, 16, 3))
        wo, w, _ = jax.vmap(
            lambda uu: ph.sample_microflake(pp, ORIENT, WI, uu))(u)
        return wo

    def pdf_fn(dirs):
        return jax.vmap(
            lambda d: ph.eval_microflake(
                pp, ORIENT, WI, jnp.asarray(d, jnp.float32)))(dirs)

    ok, p, _ = chisquare.chi_square_test(
        sample_fn, pdf_fn, n_samples=60_000)
    assert ok, p


def test_microflake_sigma_dir_isotropic_limit():
    """Wide flake distributions approach the isotropic projected area:
    sigmaDir -> 1 (the reference's scaling convention)."""
    pp = ph.microflake_params(1.0)
    sd = np.asarray(ph.microflake_sigma_dir(
        pp, jnp.linspace(0.0, 1.0, 8)))
    assert np.all(np.abs(sd - 1.0) < 0.25), sd
    # tight fibers: extinction perpendicular >> along the fiber
    pp2 = ph.microflake_params(0.1)
    s_perp = float(ph.microflake_sigma_dir(pp2, jnp.float32(0.0)))
    s_par = float(ph.microflake_sigma_dir(pp2, jnp.float32(1.0)))
    assert s_perp > 3.0 * s_par, (s_perp, s_par)


def test_kkay_eval_and_sampler():
    pp = ph.kkay_params(ks=0.4, kd=0.2, exponent=4.0)
    integ = _sphere_integral(lambda w: ph.eval_kkay(pp, ORIENT, WI, w))
    assert 0.2 < integ <= 1.0 + 1e-3, integ
    # zero orientation falls back to the isotropic kd term
    v0 = float(ph.eval_kkay(pp, jnp.zeros(3), WI, WI))
    np.testing.assert_allclose(v0, 0.2 / (4 * np.pi), rtol=1e-5)
    # sampler: uniform sphere with weight eval*4pi reproduces the mean
    u = rng.uniform2(jax.random.key(0), (40_000,))
    wo, w, _ = jax.vmap(
        lambda uu: ph.sample_kkay(pp, ORIENT, WI, uu))(u)
    est = float(jnp.mean(w))  # E[eval*4pi] = integral of eval
    assert abs(est - integ) < 0.02, (est, integ)
