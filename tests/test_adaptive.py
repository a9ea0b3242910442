"""Adaptive error-controlled meta-integrator (misc/adaptive.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import rng
from alvrl_tpu.integrators import adaptive
from alvrl_tpu.scene import loader


def _tiny_scene(w=16, h=8):
    desc = {
        "camera": {"origin": [0, 0, -3], "target": [0, 0, 0],
                   "up": [0, 1, 0], "fov_x_deg": 60.0,
                   "width": w, "height": h},
        "materials": [{"name": "m", "type": "diffuse",
                       "albedo": [0.5, 0.5, 0.5]}],
        "shapes": [{"type": "rectangle", "material": "m"}],
        "emitters": [{"type": "point", "position": [0, 2, -1],
                      "intensity": [3, 3, 3]}],
    }
    return loader.build_scene(desc)


def test_allocates_samples_to_noisy_pixels():
    """Left half: deterministic radiance (converges in one round).
    Right half: high-variance two-point distribution (needs many)."""
    scene = _tiny_scene()
    w = scene.camera.width

    def li_fn(s, o, d, key):
        # pixel x from the ray direction sign: noisy iff d.x > 0
        # (two-point distribution with p=0.5 so an all-miss first round
        # — which the Z-test accepts at zero, as the reference does —
        # is rare at base_spp=8)
        noisy = d[0] > 0.0
        u = rng.uniform(rng.fold(key, 7))
        val = jnp.where(noisy, jnp.where(u < 0.5, 2.0, 0.0), 1.0)
        return jnp.full((3,), val)

    img, spp = adaptive.render_adaptive(
        scene, jax.random.key(0), li_fn=li_fn, base_spp=8,
        max_error=0.1, max_sample_factor=16, avg_luminance=1.0)
    left = spp[:, : w // 2]
    right = spp[:, w // 2:]
    # converged after the first round: uniform minimal count (the fixed
    # batch packs top/n_pix repeats per pixel per round)
    assert (left == left[0, 0]).all()
    assert left[0, 0] <= 2 * 8 * (256 // (scene.camera.width
                                          * scene.camera.height) + 1)
    assert right.mean() > 4 * left.mean()
    assert np.isfinite(img).all()
    # the noisy pixels' means still estimate E[val] = 1.0
    assert abs(img[:, w // 2:, 0].mean() - 1.0) < 0.25


def test_respects_hard_cap():
    scene = _tiny_scene(w=4, h=4)

    def li_fn(s, o, d, key):
        u = rng.uniform(rng.fold(key, 3))
        return jnp.full((3,), jnp.where(u < 0.01, 100.0, 0.0))

    img, spp = adaptive.render_adaptive(
        scene, jax.random.key(1), li_fn=li_fn, base_spp=8,
        max_error=0.01, max_sample_factor=4, avg_luminance=1.0)
    assert (spp <= 4 * 8).all()
    assert (spp >= 8).all()


def test_volpath_smoke():
    scene = _tiny_scene(w=8, h=4)
    img, spp = adaptive.render_adaptive(
        scene, jax.random.key(2), base_spp=8, max_error=0.5,
        max_sample_factor=2)
    assert np.isfinite(img).all()
    assert img.max() > 0
