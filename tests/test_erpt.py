"""ERPT vs volpath: energy redistribution must preserve the mean
(Cline et al. 2005 — redistribution moves energy between pixels but
the total and per-region means match plain path tracing)."""

import jax
import numpy as np

from alvrl_tpu.integrators import erpt, volpath
from alvrl_tpu.scene import presets


def test_erpt_matches_volpath_mean():
    scene = presets.cornell_smoke(width=12, height=12)
    cfg = erpt.ERPTConfig(
        max_depth=6, n_seeds=4096, n_chains=256, chain_length=48
    )
    imgs = [
        np.asarray(erpt.render_erpt(scene, jax.random.key(i), cfg))
        for i in range(3)
    ]
    img = np.mean(imgs, axis=0)
    refs = [
        np.asarray(volpath.render_volpath(
            scene, jax.random.key(7 + i), spp=64,
            cfg=volpath.VolpathConfig(max_depth=6, only_vrl_paths=False),
            ray_tile=144,
        ))
        for i in range(3)
    ]
    ref = np.mean(refs, axis=0)
    assert np.isfinite(img).all()
    # variance-aware gate (VERDICT r03 item 6) replaces the 25% band
    from tests.ab_utils import assert_means_agree

    assert_means_agree(imgs, refs, z_max=4.0, floor_frac=0.03,
                       label="erpt-vs-volpath")
    # structure: bright/dark pattern must correlate, not just the mean
    c = np.corrcoef(img.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1]
    assert c > 0.5, c
