"""MLT (Metropolis over the bidirectional estimator) vs path tracing:
unbiasedness of the mean and structural agreement."""

import jax
import numpy as np

from alvrl_tpu.integrators import mlt
from alvrl_tpu.integrators.surface import render_path
from alvrl_tpu.scene import presets


def test_mlt_matches_path():
    """Variance-aware A/B (VERDICT r03 item 6): MLT's mean must agree
    with the path tracer within their combined measured self-noise, not
    a fixed band."""
    from tests.ab_utils import assert_means_agree

    scene = presets.cornell_area_light(width=12, height=12)
    cfg = mlt.MLTConfig(
        n_eye=3, n_light=3, n_chains=192, n_mutations=160
    )
    imgs = [
        np.asarray(mlt.render_mlt(scene, jax.random.key(i), cfg))
        for i in range(3)
    ]
    img = np.mean(imgs, axis=0)
    refs = [
        np.asarray(render_path(
            scene, jax.random.key(11 + i), spp=48, max_depth=4,
            ray_tile=144))
        for i in range(3)
    ]
    ref = np.mean(refs, axis=0)
    assert np.isfinite(img).all()
    # MLT's chain-mean estimator has heavier noise than iid sampling at
    # these chain counts: gate at 4 sigma with a 3% floor
    assert_means_agree(imgs, refs, z_max=4.0, floor_frac=0.03,
                       label="mlt-vs-path")
    c = np.corrcoef(img.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1]
    assert c > 0.5, c


def test_mlt_caustic_scene_matches_bdpt():
    """Caustic-style scene (glass sphere over a diffuse floor, small
    area light): the justification evidence VERDICT r03 item 6 asks for
    — PSS-over-BDPT (our MLT) must agree with a brute-force BDPT
    reference on the transport family that path-space caustic/manifold
    mutations were designed for. Agreement here shows the Kelemen-PSS
    substitution covers this scene class; a failure would be the signal
    that mut_caustic/manifold (reference src/libbidir/mut_*.cpp) are
    functionally required."""
    from alvrl_tpu.integrators import bdpt
    from alvrl_tpu.scene import loader
    from tests.ab_utils import assert_means_agree

    desc = {
        "camera": {"origin": [0, 0.2, -0.95], "target": [0, -0.3, 0.5],
                   "fov": 70, "width": 12, "height": 12},
        "medium": {"type": "homogeneous", "sigma_s": [0.0] * 3,
                   "sigma_a": [0.0] * 3},
        "materials": [
            {"name": "white", "type": "diffuse",
             "albedo": [0.75, 0.75, 0.75]},
            {"name": "glass", "type": "dielectric", "eta": 1.5},
        ],
        "shapes": [
            {"type": "cube", "material": "white", "flip_normals": True},
            {"type": "sphere", "material": "glass",
             "center": [0.0, -0.45, 0.3], "radius": 0.3,
             "n_theta": 12, "n_phi": 24},
        ],
        "emitters": [
            {"type": "area", "p0": [-0.2, 0.998, -0.2],
             "e1": [0.4, 0, 0], "e2": [0, 0, 0.4],
             "radiance": [18, 18, 18]},
        ],
    }
    scene = loader.load_json(desc)
    cfg = mlt.MLTConfig(n_eye=4, n_light=3, n_chains=256,
                        n_mutations=160)
    runs_m = [
        np.asarray(mlt.render_mlt(scene, jax.random.key(i), cfg))
        for i in range(3)
    ]
    bcfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=144)
    runs_b = [
        np.asarray(bdpt.render_bdpt(scene, jax.random.key(30 + i),
                                    spp=32, cfg=bcfg))
        for i in range(3)
    ]
    img_m = np.mean(runs_m, axis=0)
    img_b = np.mean(runs_b, axis=0)
    assert np.isfinite(img_m).all() and np.isfinite(img_b).all()
    assert img_m.mean() > 0
    assert_means_agree(runs_m, runs_b, z_max=4.0, floor_frac=0.04,
                       label="mlt-caustic-vs-bdpt")
    c = np.corrcoef(img_m.mean(-1).ravel(), img_b.mean(-1).ravel())[0, 1]
    assert c > 0.5, c
