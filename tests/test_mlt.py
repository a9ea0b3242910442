"""MLT (Metropolis over the bidirectional estimator) vs path tracing:
unbiasedness of the mean and structural agreement."""

import jax
import numpy as np

from alvrl_tpu.integrators import mlt
from alvrl_tpu.integrators.surface import render_path
from alvrl_tpu.scene import presets


def test_mlt_matches_path():
    scene = presets.cornell_area_light(width=12, height=12)
    cfg = mlt.MLTConfig(
        n_eye=3, n_light=3, n_chains=192, n_mutations=160
    )
    imgs = [
        np.asarray(mlt.render_mlt(scene, jax.random.key(i), cfg))
        for i in range(3)
    ]
    img = np.mean(imgs, axis=0)
    ref = np.asarray(render_path(
        scene, jax.random.key(11), spp=96, max_depth=4, ray_tile=144
    ))
    assert np.isfinite(img).all()
    ratio = img.mean() / ref.mean()
    assert 0.7 < ratio < 1.4, ratio
    c = np.corrcoef(img.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1]
    assert c > 0.5, c
