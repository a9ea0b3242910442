"""Full trace->render pipeline gradients (detached sampling + phase
score surrogate; SURVEY §7 hard problem #1 / NEXT round-2 item 2).

Validates E[AD gradient] against finite differences of the pipeline
EXPECTATION (same-seed central differences averaged over seeds: each
seed's FD has expectation (E L(g+h) - E L(g-h)) / 2h regardless of
coupling, so the seed-mean converges to dE/dg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alvrl_tpu.core import rng, spectrum
from alvrl_tpu.integrators.vrl import tracer
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.integrators.vrl.integrator import render_with_vrls
from alvrl_tpu.scene import presets

N_PARTICLES = 32
TCFG = tracer.TracerConfig(max_depth=5, rr_depth=99)
RCFG = VRLConfig(vol_vol_samples=1, vol_surf_samples=1, vrl_chunk=64)


def _pipeline_loss(scene, g, sigma_s, key, score_phase=True):
    med = scene.medium.replace(
        g=jnp.asarray(g, jnp.float32),
        sigma_s=jnp.broadcast_to(jnp.asarray(sigma_s, jnp.float32), (3,)),
    )
    s = scene.replace(medium=med)
    cfg = TCFG.replace(score_phase=score_phase)
    vrls = tracer.trace(s, rng.fold(key, 1), N_PARTICLES, cfg)
    img = render_with_vrls(s, vrls, rng.fold(key, 2), RCFG)
    return jnp.mean(spectrum.luminance(img))


@pytest.fixture(scope="module")
def scene():
    return presets.cornell_smoke(width=12, height=12)


def _seed_means(fn, keys):
    vals = np.asarray([fn(k) for k in keys])
    return vals.mean(), vals.std(ddof=1) / np.sqrt(len(vals))


def test_full_pipeline_dg_matches_fd(scene):
    """d/dg of E[mean image] — the tracer's phase-sampling dependence
    must be captured by the score surrogate."""
    g0, ss0, h = 0.55, 0.9, 0.06
    keys = [jax.random.key(i) for i in range(24)]

    grad_fn = jax.jit(jax.grad(
        lambda g, k: _pipeline_loss(scene, g, ss0, k)))
    ad_mean, ad_se = _seed_means(lambda k: float(grad_fn(g0, k)), keys)

    loss_j = jax.jit(lambda g, k: _pipeline_loss(scene, g, ss0, k))
    fd_mean, fd_se = _seed_means(
        lambda k: (float(loss_j(g0 + h, k)) - float(loss_j(g0 - h, k)))
        / (2 * h), keys)

    se = np.hypot(ad_se, fd_se)
    assert abs(ad_mean - fd_mean) < max(4 * se, 0.12 * abs(fd_mean) + 1e-4), (
        ad_mean, ad_se, fd_mean, fd_se)
    # the surrogate must be exercised: with score_phase=False the
    # gradient estimator is a different random variable (same forward
    # values, different per-seed derivatives)
    grad_ns = jax.jit(jax.grad(
        lambda g, k: _pipeline_loss(scene, g, ss0, k, score_phase=False)))
    per_seed_ad = np.asarray([float(grad_fn(g0, k)) for k in keys[:6]])
    per_seed_ns = np.asarray([float(grad_ns(g0, k)) for k in keys[:6]])
    assert np.abs(per_seed_ad - per_seed_ns).max() > 1e-7


def test_full_pipeline_dsigma_s_matches_fd(scene):
    """d/dsigma_s of E[mean image]: the detached free-flight weights
    carry this exactly (pdf cancellation) — tighter agreement."""
    g0, ss0, h = 0.3, 0.9, 0.05
    keys = [jax.random.key(100 + i) for i in range(24)]

    grad_fn = jax.jit(jax.grad(
        lambda ss, k: _pipeline_loss(scene, g0, ss, k)))
    ad_mean, ad_se = _seed_means(lambda k: float(grad_fn(ss0, k)), keys)

    loss_j = jax.jit(lambda ss, k: _pipeline_loss(scene, g0, ss, k))
    fd_mean, fd_se = _seed_means(
        lambda k: (float(loss_j(ss0 + h, k)) - float(loss_j(ss0 - h, k)))
        / (2 * h), keys)

    se = np.hypot(ad_se, fd_se)
    assert abs(ad_mean - fd_mean) < max(4 * se, 0.12 * abs(fd_mean)), (
        ad_mean, ad_se, fd_mean, fd_se)
    assert abs(ad_mean) > 0  # gradient flows


def test_gradients_finite_and_nonzero(scene):
    g = jax.grad(lambda g, k: _pipeline_loss(scene, g, 0.9, k))(
        0.5, jax.random.key(7))
    assert np.isfinite(float(g))
    assert float(g) != 0.0


def test_grid_medium_full_pipeline_dscale_matches_fd():
    """Grid media: d/d(density scale) of E[mean image] through the FULL
    trace->render pipeline. The detached-weight cancellation covers the
    Woodcock free flight exactly (the detached pdf denominator is the
    deterministic quadrature estimate of the true sampling density, so
    the gradient inherits only the quadrature-level bias)."""
    from alvrl_tpu.scene import presets

    scene = presets.cornell_grid_smoke(width=10, height=10, grid_res=8)
    tcfg = tracer.TracerConfig(max_depth=4, rr_depth=99)
    rcfg = VRLConfig(vol_vol_samples=1, vol_surf_samples=1, vrl_chunk=32)

    def loss(scale, key):
        med0 = scene.medium
        med = med0.replace(
            scale=jnp.asarray(scale, jnp.float32),
            max_density=jnp.max(med0.density) * scale,
        )
        s = scene.replace(medium=med)
        vrls = tracer.trace(s, rng.fold(key, 1), 24, tcfg)
        img = render_with_vrls(s, vrls, rng.fold(key, 2), rcfg)
        return jnp.mean(spectrum.luminance(img))

    s0, h = 1.0, 0.08
    keys = [jax.random.key(300 + i) for i in range(16)]
    grad_fn = jax.jit(jax.grad(loss))
    ad_mean, ad_se = _seed_means(lambda k: float(grad_fn(s0, k)), keys)
    loss_j = jax.jit(loss)
    fd_mean, fd_se = _seed_means(
        lambda k: (float(loss_j(s0 + h, k)) - float(loss_j(s0 - h, k)))
        / (2 * h), keys)
    se = np.hypot(ad_se, fd_se)
    assert np.isfinite(ad_mean) and ad_mean != 0.0
    assert abs(ad_mean - fd_mean) < max(4 * se, 0.15 * abs(fd_mean)), (
        ad_mean, ad_se, fd_mean, fd_se)
