"""Brent solver + Gauss-Lobatto quadrature (src/libcore/{brent,quad}.cpp)
and the heterogeneous ESimpsonQuadrature sampling strategy."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import solvers
from alvrl_tpu.media import heterogeneous as gmed
from alvrl_tpu.scene import presets


def test_brent_scalar_roots():
    x, ok = solvers.brent(lambda x: x * x - 2.0, 0.0, 2.0)
    assert bool(ok)
    np.testing.assert_allclose(float(x), np.sqrt(2), rtol=1e-5)
    x2, ok2 = solvers.brent(jnp.cos, 1.0, 3.0)
    assert bool(ok2)
    np.testing.assert_allclose(float(x2), np.pi / 2, rtol=1e-5)


def test_brent_vmapped():
    targets = jnp.linspace(0.1, 0.9, 8)
    xs, oks = jax.vmap(
        lambda c: solvers.brent(lambda x: jnp.exp(-x) - c, 0.0, 10.0)
    )(targets)
    assert bool(jnp.all(oks))
    np.testing.assert_allclose(
        np.asarray(xs), -np.log(np.asarray(targets)), rtol=1e-4)


def test_gauss_lobatto():
    v = solvers.gauss_lobatto(np.sin, 0.0, np.pi, tol=1e-10)
    np.testing.assert_allclose(v, 2.0, rtol=1e-8)
    v2 = solvers.gauss_lobatto(lambda x: np.exp(-x * x), -5.0, 5.0,
                               tol=1e-10)
    np.testing.assert_allclose(v2, np.sqrt(np.pi), rtol=1e-7)


def test_quadrature_sampling_freeflight_law():
    """The inversion sampler must reproduce P(success) =
    1 - exp(-chan * od_total) along a fixed ray."""
    scene = presets.cornell_grid_smoke(width=8, height=8, grid_res=24)
    med = scene.medium.replace(sampling=1)
    o = jnp.array([0.0, 0.0, -0.95])
    d = jnp.array([0.0, 0.0, 1.0])
    dist = jnp.float32(1.9)
    od = float(gmed.optical_depth(med, o, o + dist * d, n_steps=128))
    chan = float(jnp.mean(med.sigma_t_color))
    p_hit = 1.0 - np.exp(-chan * od)

    keys = jax.random.split(jax.random.key(0), 20_000)
    smp = jax.vmap(
        lambda k: gmed.sample_distance(med, k, o, d, dist))(keys)
    rate = float(jnp.mean(smp.success))
    np.testing.assert_allclose(rate, p_hit, atol=0.02)
    # sampled t's live inside the segment, weights finite
    assert float(jnp.max(jnp.where(smp.success, smp.t, 0.0))) <= float(dist)
    assert np.isfinite(np.asarray(smp.weight)).all()


def test_quadrature_matches_woodcock_render():
    from alvrl_tpu.integrators import volpath

    scene = presets.cornell_grid_smoke(width=8, height=8, grid_res=16)
    cfg = volpath.VolpathConfig(max_depth=4, only_vrl_paths=False)
    scene_q = scene.replace(medium=scene.medium.replace(sampling=1))
    img_w = np.mean([np.asarray(volpath.render_volpath(
        scene, jax.random.key(i), spp=48, cfg=cfg, ray_tile=64))
        for i in range(3)], axis=0)
    img_q = np.mean([np.asarray(volpath.render_volpath(
        scene_q, jax.random.key(10 + i), spp=48, cfg=cfg, ray_tile=64))
        for i in range(3)], axis=0)
    assert np.isfinite(img_q).all()
    ratio = img_q.mean() / img_w.mean()
    # single-seed means spread ~ +-8% at this budget (measured)
    assert 0.88 < ratio < 1.12, ratio
