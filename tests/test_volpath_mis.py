"""Emitter MIS in volpath (the reference volpath's miWeight): emission
is counted at every depth, weighted against NEE, which fixes the
specularly-reflected-emitter paths that a single-strategy NEE tracer
drops entirely."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.geometry import shapes
from alvrl_tpu.integrators import volpath
from alvrl_tpu.integrators.surface import vacuumize
from alvrl_tpu.scene import presets
from alvrl_tpu.scene.scene import MIRROR

CFG = volpath.VolpathConfig(max_depth=4, only_vrl_paths=False)


def test_mirror_shows_area_light():
    """Camera looking at a mirror floor must see the ceiling light's
    reflection at exactly the emitted radiance (delta chain, weight 1).
    Without MIS these paths are lost (NEE is zero at delta vertices and
    emission was only counted at depth 1)."""
    scene = vacuumize(presets.cornell_area_light(
        width=24, height=24, radiance=(6.0, 6.0, 6.0), half=0.4))
    mats = scene.materials.replace(
        kind=scene.materials.kind.at[0].set(MIRROR))  # white walls+floor
    scene = scene.replace(materials=mats)

    img = np.asarray(volpath.render_volpath(
        scene, jax.random.key(0), spp=24, cfg=CFG, ray_tile=192))
    assert np.isfinite(img).all()
    # some pixels must carry (near-)emitter radiance via the mirror
    assert img.max() > 3.0, img.max()

    img_nomis = np.asarray(volpath.render_volpath(
        scene, jax.random.key(0), spp=24,
        cfg=volpath.VolpathConfig(max_depth=4, only_vrl_paths=False,
                                  mis=False), ray_tile=192))
    # single mirror reflections are covered either way (the initial-
    # specular-chain rule keeps depth at 1); the no-MIS tracer loses
    # the deeper diffuse -> specular -> emitter family, so MIS must
    # add energy, strictly
    assert img.sum() > 1.02 * img_nomis.sum(), (
        img.sum(), img_nomis.sum())


def test_mis_preserves_mean_diffuse():
    """On an all-diffuse scene both estimators are unbiased — means
    must agree statistically."""
    scene = presets.cornell_area_light(width=10, height=10)
    img = np.mean([np.asarray(volpath.render_volpath(
        scene, jax.random.key(i), spp=64, cfg=CFG, ray_tile=100))
        for i in range(3)], axis=0)
    img0 = np.mean([np.asarray(volpath.render_volpath(
        scene, jax.random.key(10 + i), spp=64,
        cfg=volpath.VolpathConfig(max_depth=4, only_vrl_paths=False,
                                  mis=False), ray_tile=100))
        for i in range(3)], axis=0)
    ratio = img.mean() / img0.mean()
    assert 0.9 < ratio < 1.1, ratio


def test_mis_env_escape():
    """Constant environment: BSDF-sampled escapes at depth >= 2 are now
    counted with MIS; the mean stays consistent with the no-MIS
    estimator (which covers the same light via NEE only)."""
    from alvrl_tpu.emitters.emitters import CONSTANT, make_emitters

    base = vacuumize(presets.cornell_smoke(width=8, height=8,
                                           with_blocker=False))
    # open the box: keep only the floor so env light dominates
    v, f = shapes.rectangle()
    v = v @ np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32).T
    scene = base.replace(
        vertices=jnp.asarray(v + np.array([0, -1, 0], np.float32)),
        faces=jnp.asarray(f),
        material=jnp.zeros((2,), jnp.int32),
        face_emitter=jnp.full((2,), -1, jnp.int32),
        face_uv=jnp.zeros((2, 3, 2), jnp.float32),
        face_med_int=jnp.zeros((2,), jnp.int32),
        face_med_ext=jnp.zeros((2,), jnp.int32),
        emitters=make_emitters([CONSTANT], [[0, 0, 0]],
                               [[1.0, 1.0, 1.0]]),
    )
    img = np.mean([np.asarray(volpath.render_volpath(
        scene, jax.random.key(i), spp=48, cfg=CFG, ray_tile=64))
        for i in range(2)], axis=0)
    img0 = np.mean([np.asarray(volpath.render_volpath(
        scene, jax.random.key(5 + i), spp=48,
        cfg=volpath.VolpathConfig(max_depth=4, only_vrl_paths=False,
                                  mis=False), ray_tile=64))
        for i in range(2)], axis=0)
    assert np.isfinite(img).all()
    ratio = img.mean() / img0.mean()
    assert 0.9 < ratio < 1.15, ratio
