"""BDPT tests: strategy coverage and agreement with the unidirectional
surface path tracer (the reference validates bdpt against path the same
way — same integral, independent estimators)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators import bdpt, surface
from alvrl_tpu.media.homogeneous import HomogeneousMedium
from alvrl_tpu.scene import presets


def _vacuum(scene):
    vac = HomogeneousMedium(
        sigma_a=jnp.zeros(3), sigma_s=jnp.zeros(3),
        g=jnp.float32(0.0), sampling_weight=jnp.float32(0.0),
    )
    return scene.replace(medium=vac)


def test_bdpt_matches_path_area_light():
    """Cornell box + ceiling area light in vacuum: BDPT and the surface
    path tracer must agree (both unbiased for this family)."""
    scene = _vacuum(presets.cornell_area_light(width=10, height=10))
    cfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=100)
    img_b = np.asarray(bdpt.render_bdpt(scene, jax.random.key(0), spp=24,
                                        cfg=cfg))
    img_p = np.asarray(surface.render_path(scene, jax.random.key(1),
                                           spp=48, max_depth=5,
                                           ray_tile=100))
    assert np.isfinite(img_b).all()
    assert img_b.mean() > 0
    rel = abs(img_b.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.15, (img_b.mean(), img_p.mean())
    corr = np.corrcoef(img_b.mean(-1).reshape(-1),
                       img_p.mean(-1).reshape(-1))[0, 1]
    assert corr > 0.8, corr


def test_bdpt_point_light():
    """Point-light scene (delta light: s=0 impossible, s=1 + s>=2 carry
    everything) stays finite and agrees with the path tracer."""
    scene = _vacuum(presets.cornell_smoke(width=10, height=10))
    cfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=100)
    img_b = np.asarray(bdpt.render_bdpt(scene, jax.random.key(0), spp=24,
                                        cfg=cfg))
    img_p = np.asarray(surface.render_path(scene, jax.random.key(1),
                                           spp=48, max_depth=5,
                                           ray_tile=100))
    assert np.isfinite(img_b).all()
    rel = abs(img_b.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.15, (img_b.mean(), img_p.mean())


def test_bdpt_mis_weights_bounded():
    """Spot-check: per-ray radiance finite and non-negative across many
    keys (MIS weights in (0, 1] never blow up a strategy)."""
    scene = _vacuum(presets.cornell_area_light(width=6, height=6))
    cfg = bdpt.BDPTConfig(n_eye=3, n_light=3)
    from alvrl_tpu.sensors import perspective

    px, py = jnp.meshgrid(jnp.arange(6), jnp.arange(6))
    o, d = perspective.sample_ray(scene.camera, px.reshape(-1),
                                  py.reshape(-1))
    keys = jax.random.split(jax.random.key(5), o.shape[0])
    li = jax.vmap(lambda oo, dd, kk: bdpt.li_bdpt(scene, oo, dd, kk, cfg))(
        o, d, keys)
    arr = np.asarray(li)
    assert np.isfinite(arr).all()
    assert (arr >= 0).all()
