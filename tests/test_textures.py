"""Procedural texture tests."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.scene import presets
from alvrl_tpu.scene.scene import make_materials
from alvrl_tpu.textures import procedural as tex


def test_checker_pattern():
    p = jnp.array([[0.1, 0.1, 0.1], [1.1, 0.1, 0.1], [1.1, 1.1, 0.1]])
    v = np.asarray(tex.checker(p, jnp.ones(3)))
    np.testing.assert_array_equal(v, [0.0, 1.0, 0.0])


def test_value_noise_range_and_smooth():
    key = jax.random.key(0)
    p = jax.random.uniform(key, (1000, 3)) * 10
    v = np.asarray(tex.value_noise(p))
    assert (v >= 0).all() and (v <= 1).all()
    # continuity: nearby points have nearby values
    eps = 1e-3
    v2 = np.asarray(tex.value_noise(p + eps))
    assert np.abs(v - v2).max() < 0.05


def test_albedo_at_mixes():
    mats = make_materials(
        [0], [[1.0, 0.0, 0.0]],
        tex_kinds=[tex.TEX_CHECKER], tex_scales=[1.0],
        albedo2=[[0.0, 1.0, 0.0]],
    )
    scene = presets.cornell_smoke(width=4, height=4).replace(materials=mats)
    a0 = np.asarray(
        tex.albedo_at(scene, jnp.int32(0), jnp.array([0.1, 0.1, 0.1]))
    )
    a1 = np.asarray(
        tex.albedo_at(scene, jnp.int32(0), jnp.array([1.1, 0.1, 0.1]))
    )
    np.testing.assert_allclose(a0, [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(a1, [0, 1, 0], atol=1e-6)


def test_textured_scene_renders():
    from alvrl_tpu.integrators.vrl import integrator, tracer
    from alvrl_tpu.integrators.vrl.integrate import VRLConfig

    scene = presets.cornell_smoke(width=8, height=8)
    mats = scene.materials.replace(
        tex_kind=scene.materials.tex_kind.at[0].set(tex.TEX_CHECKER),
        tex_scale=scene.materials.tex_scale.at[0].set(3.0),
        albedo2=scene.materials.albedo2.at[0].set(
            jnp.array([0.1, 0.1, 0.4])
        ),
    )
    scene = scene.replace(materials=mats)
    img, _ = integrator.render_unclustered(
        scene, jax.random.key(0), num_particles=16,
        cfg=VRLConfig(vrl_chunk=16),
        tracer_cfg=tracer.TracerConfig(max_depth=4), ray_tile=64,
    )
    assert bool(jnp.isfinite(img).all())
    assert float(img.max()) > 0
