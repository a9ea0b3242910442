"""Light tracer (ptracer) vs path tracer (volpath) — the two adjoint
estimators must agree (the classic bidirectional consistency check)."""

import jax
import numpy as np

from alvrl_tpu.integrators import ptracer, volpath
from alvrl_tpu.integrators.vrl.tracer import TracerConfig
from alvrl_tpu.scene import presets


def test_ptracer_matches_volpath():
    scene = presets.cornell_smoke(width=12, height=12)
    imgs = [
        np.asarray(ptracer.render_ptracer(
            scene, jax.random.key(i), num_particles=6144,
            cfg=TracerConfig(max_depth=8)))
        for i in range(3)
    ]
    pt = np.mean(imgs, axis=0)
    o = np.asarray(volpath.render_volpath(
        scene, jax.random.key(9), spp=128,
        cfg=volpath.VolpathConfig(max_depth=8, only_vrl_paths=False),
        ray_tile=144))
    assert np.isfinite(pt).all()
    ratio = pt.mean() / o.mean()
    assert 0.85 < ratio < 1.15, ratio


def test_ptracer_finite_with_area_light():
    scene = presets.cornell_area_light(width=8, height=8)
    img = np.asarray(ptracer.render_ptracer(
        scene, jax.random.key(0), num_particles=2048,
        cfg=TracerConfig(max_depth=6)))
    assert np.isfinite(img).all()
    assert img.mean() > 0
