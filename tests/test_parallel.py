"""Sharded render path tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators.vrl import tracer
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.parallel import render as prender
from alvrl_tpu.parallel.mesh import make_mesh
from alvrl_tpu.scene import presets


def _setup():
    scene = presets.cornell_smoke(width=8, height=8)
    vrls = tracer.trace(
        scene, jax.random.key(0), 16, tracer.TracerConfig(max_depth=4)
    )
    return scene, vrls


def test_mesh_factorization():
    mesh = make_mesh(8)
    assert mesh.shape["rays"] * mesh.shape["vrls"] == 8


def test_sharded_render_deterministic():
    scene, vrls = _setup()
    mesh = make_mesh(8)
    cfg = VRLConfig(vrl_chunk=8)
    vrls = prender.pad_vrls(vrls, mesh.shape["vrls"])
    a = prender.render_image_sharded(mesh, scene, vrls, jax.random.key(1), cfg)
    b = prender.render_image_sharded(mesh, scene, vrls, jax.random.key(1), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(jnp.isfinite(a).all())


def test_sharded_matches_single_device_statistically():
    """Same estimator, different RNG partitioning: means must agree."""
    scene, vrls = _setup()
    cfg = VRLConfig(vrl_chunk=8, vol_vol_samples=3, vol_surf_samples=3)
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    v8 = prender.pad_vrls(vrls, mesh8.shape["vrls"])
    imgs8 = [
        np.asarray(
            prender.render_image_sharded(mesh8, scene, v8, jax.random.key(i), cfg)
        )
        for i in range(2)
    ]
    imgs1 = [
        np.asarray(
            prender.render_image_sharded(mesh1, scene, vrls, jax.random.key(i), cfg)
        )
        for i in range(2)
    ]
    m8 = np.mean(imgs8, axis=0).mean()
    m1 = np.mean(imgs1, axis=0).mean()
    assert abs(m8 - m1) / max(m1, 1e-6) < 0.2, (m8, m1)


def test_train_step_gradients_finite():
    scene, _ = _setup()
    mesh = make_mesh(8)
    cfg = VRLConfig(vrl_chunk=8)
    target = jnp.zeros((8, 8, 3))
    loss, grads = jax.jit(
        lambda sc, k, t: prender.train_step(
            mesh, sc, k, t, cfg, num_particles=8,
            tracer_cfg=tracer.TracerConfig(max_depth=4),
        )
    )(scene, jax.random.key(3), target)
    assert bool(jnp.isfinite(loss))
    for k, g in grads.items():
        assert bool(jnp.all(jnp.isfinite(g))), k
    assert float(jnp.abs(grads["sigma_a"]).sum()) > 0
    assert float(jnp.abs(grads["intensity"]).sum()) > 0


def test_gradient_matches_finite_difference():
    """AD through the full (deterministic-key) render == finite
    differences of the same function — validates the custom plumbing
    (BASELINE gradient requirement, on the exact MC estimator)."""
    scene, vrls = _setup()
    mesh = make_mesh(2)
    cfg = VRLConfig(vrl_chunk=8)
    vrls = prender.pad_vrls(vrls, mesh.shape["vrls"])
    key = jax.random.key(7)

    def f(sigma_a_scalar):
        med = scene.medium.replace(
            sigma_a=jnp.full((3,), sigma_a_scalar)
        )
        sc = scene.replace(medium=med)
        img = prender.render_image_sharded(mesh, sc, vrls, key, cfg)
        return jnp.mean(img)

    x0 = jnp.float32(0.05)
    g_ad = float(jax.grad(f)(x0))
    eps = 1e-3
    g_fd = (float(f(x0 + eps)) - float(f(x0 - eps))) / (2 * eps)
    assert abs(g_ad - g_fd) / max(abs(g_fd), 1e-6) < 0.05, (g_ad, g_fd)
