"""Photon mapping tests: the progressive estimator must agree with the
volumetric path tracer (consistency of density estimation)."""

import jax
import numpy as np

from alvrl_tpu.integrators import photonmap, volpath
from alvrl_tpu.integrators.vrl.tracer import TracerConfig
from alvrl_tpu.scene import presets


def test_photon_tracing_deposits():
    scene = presets.cornell_smoke(width=8, height=8)
    pm = photonmap.trace_photons(scene, jax.random.key(0), 64,
                                 TracerConfig(max_depth=8))
    assert int(np.asarray(pm.v_valid).sum()) > 50
    assert int(np.asarray(pm.s_valid).sum()) > 10
    for a in [pm.v_power, pm.s_power]:
        v = np.asarray(a)
        assert np.isfinite(v).all() and (v >= 0).all()


def test_ppm_matches_volpath():
    scene = presets.cornell_smoke(width=10, height=10)
    img = photonmap.render_ppm(
        scene, jax.random.key(0), n_passes=5, photons_per_pass=1024,
        r0_surface=0.15, r0_volume=0.22,
        cfg=TracerConfig(max_depth=10), march_steps=16,
    )
    o = np.asarray(volpath.render_volpath(
        scene, jax.random.key(9), spp=128,
        cfg=volpath.VolpathConfig(max_depth=10, only_vrl_paths=False),
        ray_tile=100,
    ))
    assert np.isfinite(img).all()
    ratio = img.mean() / o.mean()
    assert 0.88 < ratio < 1.12, ratio
