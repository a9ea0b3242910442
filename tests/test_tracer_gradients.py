"""Tracer-side gradients: the detached-sampling estimator.

Free-flight locations are detached AND the importance-pdf DENOMINATORS
are detached, so d/dsigma E[f tau / sg(p)] is the true expectation
gradient (the moving-density score term cancels exactly against the
differentiated denominator). Validation:

  * unit oracles with CLOSED FORMS: the fail-branch estimator
    E[1_fail w_pass] = tau(L) and the scatter-branch estimator
    E[1_succ w_scatter] = (sigma_s/sigma_t)(1 - tau(L)) must
    autodiff to the analytic derivatives;
  * pipeline level: AD and fixed-seed FD are DIFFERENT unbiased
    estimators of the same gradient (FD is pathwise: the sample
    locations move with sigma at fixed uniforms), so seed-averaged
    values are compared with a statistical tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators import volpath
from alvrl_tpu.integrators.vrl import tracer
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.integrators.vrl.integrator import render_with_vrls
from alvrl_tpu.media import api as mapi
from alvrl_tpu.media import homogeneous as hmed
from alvrl_tpu.scene import presets

SCENE = presets.cornell_smoke(width=10, height=10)


def test_detached_freeflight_gradient_analytic():
    """Closed-form check of both branch estimators' gradients."""
    length = jnp.float32(1.3)
    n = 200_000
    keys = jax.random.split(jax.random.key(0), n)

    def estimators(sa):
        med = hmed.make_medium(
            jnp.full((3,), sa), jnp.full((3,), 0.6), g=0.0)

        def one(k):
            ms = mapi.sample_distance_seg(
                med, k, jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), length)
            return (jnp.where(ms.success, 0.0, 1.0)[None] * ms.w_pass,
                    jnp.where(ms.success, 1.0, 0.0)[None] * ms.w_scatter)

        w_pass, w_scat = jax.vmap(one)(keys)
        return jnp.mean(w_pass, axis=0)[0], jnp.mean(w_scat, axis=0)[0]

    sa0 = jnp.float32(0.25)
    jac = jax.jit(jax.jacrev(lambda a: jnp.stack(estimators(a))))(sa0)
    vals = jax.jit(lambda a: jnp.stack(estimators(a)))(sa0)

    st = float(sa0) + 0.6
    tau = np.exp(-st * float(length))
    # values: E[w_pass 1_fail] = tau; E[w_scatter 1_succ] = ss/st (1-tau)
    np.testing.assert_allclose(float(vals[0]), tau, rtol=0.02)
    np.testing.assert_allclose(
        float(vals[1]), 0.6 / st * (1 - tau), rtol=0.02)
    # gradients (d/d sigma_a):
    # d tau / da = -L tau
    np.testing.assert_allclose(
        float(jac[0]), -float(length) * tau, rtol=0.03)
    # d/da [ss/st (1-tau)] = -ss/st^2 (1-tau) + ss/st L tau
    expect = -0.6 / st**2 * (1 - tau) + 0.6 / st * float(length) * tau
    np.testing.assert_allclose(float(jac[1]), expect, rtol=0.05)


def _seed_avg(f_of_seed_and_x, x0, eps, seeds):
    g_ad = np.mean([
        float(jax.grad(lambda x: f_of_seed_and_x(s, x))(x0))
        for s in seeds
    ])
    g_fd = np.mean([
        (float(f_of_seed_and_x(s, x0 + eps))
         - float(f_of_seed_and_x(s, x0 - eps))) / (2 * eps)
        for s in seeds
    ])
    return g_ad, g_fd


def test_grad_through_volpath_sigma_a():
    cfg = volpath.VolpathConfig(max_depth=5, only_vrl_paths=False)

    def f(seed, a):
        med = SCENE.medium.replace(sigma_a=jnp.full((3,), a))
        sc = SCENE.replace(medium=med)
        img = volpath.render_volpath(sc, jax.random.key(seed), spp=32,
                                     cfg=cfg, ray_tile=100)
        return jnp.mean(img)

    g_ad, g_fd = _seed_avg(f, jnp.float32(0.05), 3e-3, range(4))
    assert np.isfinite(g_ad)
    assert g_ad < 0  # more absorption -> darker
    # two different unbiased estimators of the same gradient
    assert abs(g_ad - g_fd) / max(abs(g_fd), 1e-6) < 0.35, (g_ad, g_fd)


def test_grad_through_tracer_and_render():
    """End-to-end: d mean(image) / d sigma_s through photon tracing ->
    raw VRL buffers -> the pairwise render (no host compaction)."""
    cfg = VRLConfig(vrl_chunk=96, detached=True)

    def f(seed, s):
        med = SCENE.medium.replace(sigma_s=jnp.full((3,), s))
        sc = SCENE.replace(medium=med)
        raw = tracer.trace(sc, jax.random.key(seed), 96,
                           tracer.TracerConfig(max_depth=4))
        img = render_with_vrls(sc, raw, jax.random.key(seed + 100),
                               cfg, ray_tile=100)
        return jnp.mean(img)

    g_ad, g_fd = _seed_avg(f, jnp.float32(0.8), 3e-3, range(3))
    assert np.isfinite(g_ad), g_ad
    assert abs(g_ad - g_fd) / max(abs(g_fd), 1e-6) < 0.5, (g_ad, g_fd)
