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

    # THREE independent oracle runs: the sample std of their means
    # measures the oracle's own noise, and the A/B asserts against THAT
    # instead of fixed bands (VERDICT round-2 item 8 — variance-aware
    # A/B; ADVICE r03 item 5: a single |m1-m2| difference is itself a
    # one-sample noise estimate and made the 4-sigma gate flaky)
    o_runs = [
        np.asarray(volpath.render_volpath(
            scene, jax.random.key(100 + i), spp=1024,
            cfg=volpath.VolpathConfig(max_depth=16), ray_tile=64,
        ))
        for i in range(3)
    ]
    o_img = np.mean(o_runs, axis=0)

    assert np.isfinite(vrl_img).all() and np.isfinite(o_img).all()
    # oracle self-noise of the image MEAN: sample std over the run
    # means estimates sigma_mean of ONE run; the 3-run average has
    # sigma_mean/sqrt(3); the 6-run VRL mean adds its own term of
    # similar scale — allow 4 sigma with a small absolute floor
    run_means = [r.mean() for r in o_runs]
    sigma_mean = max(float(np.std(run_means, ddof=1)),
                     0.01 * o_img.mean())
    z = abs(vrl_img.mean() - o_img.mean()) / sigma_mean
    assert z < 4.0, (z, vrl_img.mean(), o_img.mean(), sigma_mean)
    # per-pixel agreement within the oracle's own per-pixel noise
    self_rel = (np.abs(o_runs[0] - o_runs[1])
                / (np.abs(o_img) + 1e-2)).mean()
    rel = (np.abs(vrl_img - o_img) / (np.abs(o_img) + 1e-2)).mean()
    assert rel < 1.5 * self_rel + 0.02, (rel, self_rel)
