"""Instant radiosity (vpl) vs path tracing: both estimate surface
transport, so means must agree up to VPL clamping bias + noise
(the consistency check behind the reference's GL preview,
src/integrators/vpl/vpl.cpp)."""

import jax
import numpy as np

from alvrl_tpu.integrators import vpl
from alvrl_tpu.integrators.surface import render_path
from alvrl_tpu.integrators.vrl.tracer import TracerConfig
from alvrl_tpu.scene import presets


def test_vpl_matches_path():
    scene = presets.cornell_smoke(width=12, height=12)
    vpls = vpl.generate_vpls(
        scene, jax.random.key(0), 2048, TracerConfig(max_depth=6)
    )
    assert int(np.asarray(vpls.valid).sum()) > 100
    img = np.asarray(vpl.render_vpl(
        scene, vpls, jax.random.key(1), spp=2, clamp=0.01, chunk=512
    ))
    ref = np.asarray(render_path(
        scene, jax.random.key(2), spp=96, max_depth=6, ray_tile=144
    ))
    assert np.isfinite(img).all()
    ratio = img.mean() / ref.mean()
    # clamping removes some near-field energy -> allow a low-side skew
    assert 0.75 < ratio < 1.15, ratio


def test_vpl_area_light_finite():
    scene = presets.cornell_area_light(width=8, height=8)
    vpls = vpl.generate_vpls(
        scene, jax.random.key(0), 1024, TracerConfig(max_depth=4)
    )
    img = np.asarray(vpl.render_vpl(
        scene, vpls, jax.random.key(1), spp=1, chunk=256
    ))
    assert np.isfinite(img).all()
    assert img.mean() > 0
