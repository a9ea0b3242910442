"""Equal-transport A/B: unclustered VRL renderer vs the onlyVRLpaths
volpath oracle — the reference's own correctness methodology (SURVEY §4:
'This equal-transport A/B is the reference's real correctness test and
must be reproduced').

Both sides are Monte Carlo, so the assertion is statistical: the A/B
difference must be comparable to the oracle's own self-noise, and the
image-mean ratio close to 1. Calibrated on 2026-08-17: at these sample
counts the oracle self-noise is ~0.18 mean-rel and the A/B lands at
~0.09 with mean ratio ~0.96.
"""

import jax
import numpy as np

from alvrl_tpu.integrators import volpath
from alvrl_tpu.integrators.vrl import integrator, tracer
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.scene import presets


def test_vrl_matches_oracle():
    scene = presets.cornell_smoke(width=8, height=8)

    imgs = []
    for i in range(6):
        img, _ = integrator.render_unclustered(
            scene, jax.random.key(i), num_particles=256,
            cfg=VRLConfig(vrl_chunk=128),
            tracer_cfg=tracer.TracerConfig(max_depth=16),
            ray_tile=64,
        )
        imgs.append(np.asarray(img))
    vrl_img = np.mean(imgs, axis=0)

    o_img = np.asarray(
        volpath.render_volpath(
            scene, jax.random.key(100), spp=1024,
            cfg=volpath.VolpathConfig(max_depth=16), ray_tile=64,
        )
    )

    assert np.isfinite(vrl_img).all() and np.isfinite(o_img).all()
    ratio = vrl_img.mean() / o_img.mean()
    assert 0.85 < ratio < 1.15, ratio
    rel = np.abs(vrl_img - o_img) / (np.abs(o_img) + 1e-2)
    assert rel.mean() < 0.25, rel.mean()
