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
    from tests.ab_utils import assert_means_agree

    cfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=100)
    runs_b = [
        np.asarray(bdpt.render_bdpt(scene, jax.random.key(i), spp=24,
                                    cfg=cfg))
        for i in range(3)
    ]
    runs_p = [
        np.asarray(surface.render_path(scene, jax.random.key(10 + i),
                                       spp=48, max_depth=5,
                                       ray_tile=100))
        for i in range(3)
    ]
    img_b, img_p = np.mean(runs_b, axis=0), np.mean(runs_p, axis=0)
    assert np.isfinite(img_b).all()
    assert img_b.mean() > 0
    # variance-aware gate (VERDICT r03 item 6) replaces the 15% band
    assert_means_agree(runs_b, runs_p, z_max=4.0, floor_frac=0.02,
                       label="bdpt-vs-path-area")
    corr = np.corrcoef(img_b.mean(-1).reshape(-1),
                       img_p.mean(-1).reshape(-1))[0, 1]
    assert corr > 0.8, corr


def test_bdpt_point_light():
    """Point-light scene (delta light: s=0 impossible, s=1 + s>=2 carry
    everything) stays finite and agrees with the path tracer."""
    scene = _vacuum(presets.cornell_smoke(width=10, height=10))
    from tests.ab_utils import assert_means_agree

    cfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=100)
    runs_b = [
        np.asarray(bdpt.render_bdpt(scene, jax.random.key(i), spp=24,
                                    cfg=cfg))
        for i in range(3)
    ]
    runs_p = [
        np.asarray(surface.render_path(scene, jax.random.key(10 + i),
                                       spp=48, max_depth=5,
                                       ray_tile=100))
        for i in range(3)
    ]
    img_b = np.mean(runs_b, axis=0)
    assert np.isfinite(img_b).all()
    assert_means_agree(runs_b, runs_p, z_max=4.0, floor_frac=0.02,
                       label="bdpt-vs-path-point")


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


def test_bdpt_light_tracing_mix():
    """Full Veach mix (VERDICT r03 item 10): the eye pass with
    light-tracing-aware MIS weights plus the lens-splat pass must stay
    unbiased — agreement with the plain path tracer within measured
    self-noise — and the splat pass must contribute (its family gets
    nonzero weight)."""
    from tests.ab_utils import assert_means_agree

    # n_eye/n_light = 3 like the other bdpt tests: the (s, t) unroll
    # grows quadratically and 4x4 with the LT extension is a CPU-XLA
    # compile bomb on the 2-vCPU CI box
    scene = _vacuum(presets.cornell_area_light(width=10, height=10))
    cfg = bdpt.BDPTConfig(n_eye=3, n_light=3, ray_tile=100)
    runs_full = [
        np.asarray(bdpt.render_bdpt_lt(scene, jax.random.key(i), spp=16,
                                       cfg=cfg, num_particles=1600))
        for i in range(3)
    ]
    runs_p = [
        np.asarray(surface.render_path(scene, jax.random.key(40 + i),
                                       spp=32, max_depth=4,
                                       ray_tile=100))
        for i in range(3)
    ]
    img_f = np.mean(runs_full, axis=0)
    assert np.isfinite(img_f).all()
    assert img_f.mean() > 0
    assert_means_agree(runs_full, runs_p, z_max=4.0, floor_frac=0.03,
                       label="bdpt-lt-vs-path")
    # the eye pass alone (weights now yield < 1 on shared families)
    # must fall short of the full mix: the splat pass carries real
    # weight
    eye_only = np.asarray(bdpt.render_bdpt(
        scene, jax.random.key(0), spp=16,
        cfg=cfg.replace(with_light_tracing=True)))
    assert eye_only.mean() < img_f.mean(), (eye_only.mean(),
                                            img_f.mean())


def _plane_scene(emitters, albedo=0.6, cam_h=1.2):
    """3x3 ground plane + given emitters in vacuum (the volpath env
    test scene shape): every bdpt strategy family that an env or
    directional light supports is exercised — escape (s=0), NEE (s=1),
    and light-subpath connections (s>=2)."""
    from alvrl_tpu.emitters import emitters as em_mod  # noqa: F401
    from alvrl_tpu.geometry import shapes
    from alvrl_tpu.scene.scene import (Camera, Scene, look_at,
                                       make_materials)

    v, f = shapes.rectangle()
    v = v @ np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]],
                     np.float32).T * 3.0
    vac = HomogeneousMedium(
        sigma_a=jnp.zeros(3), sigma_s=jnp.zeros(3),
        g=jnp.float32(0.0), sampling_weight=jnp.float32(0.0),
    )
    cam = Camera(
        to_world=look_at([0, cam_h, -2.5], [0, 0.4, 0], [0, 1, 0]),
        fov_x_deg=jnp.float32(70.0), width=10, height=10,
    )
    return Scene(
        vertices=jnp.asarray(v), faces=jnp.asarray(f),
        material=jnp.zeros(2, jnp.int32),
        materials=make_materials([0], [[albedo, albedo, albedo]]),
        emitters=emitters, medium=vac, camera=cam,
    )


def test_bdpt_constant_env():
    """Constant-environment light: the escape family (s=0), env NEE
    (s=1) and env-started light subpaths (s>=2) must MIS-combine to the
    path-traced answer (reference: bdpt over environment emitters,
    src/libbidir/vertex.cpp sampleDirect/perturbPosition env cases)."""
    from alvrl_tpu.emitters import emitters as em_mod
    from tests.ab_utils import assert_means_agree

    em = em_mod.make_emitters([em_mod.CONSTANT], [[0, 0, 0]],
                              [[0.8, 0.8, 0.8]])
    scene = _plane_scene(em)
    cfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=100)
    runs_b = [
        np.asarray(bdpt.render_bdpt(scene, jax.random.key(i), spp=24,
                                    cfg=cfg))
        for i in range(3)
    ]
    runs_p = [
        np.asarray(surface.render_path(scene, jax.random.key(10 + i),
                                       spp=48, max_depth=5,
                                       ray_tile=100))
        for i in range(3)
    ]
    img_b = np.mean(runs_b, axis=0)
    assert np.isfinite(img_b).all()
    assert img_b.mean() > 0
    assert_means_agree(runs_b, runs_p, z_max=4.0, floor_frac=0.02,
                       label="bdpt-vs-path-constenv")


def test_bdpt_directional():
    """Directional light (delta direction): s=1 NEE carries the direct
    family, light subpaths start on the beam disk (s>=2), s=0 is
    impossible — the delta flag machinery must keep the mix unbiased
    (reference: directional.cpp emitters under bdpt)."""
    from alvrl_tpu.emitters import emitters as em_mod
    from tests.ab_utils import assert_means_agree

    em = em_mod.make_emitters(
        [em_mod.DIRECTIONAL], [[0, 0, 0]], [[1.5, 1.5, 1.5]],
        directions=[[-0.3, -1.0, 0.2]])
    scene = _plane_scene(em)
    cfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=100)
    runs_b = [
        np.asarray(bdpt.render_bdpt(scene, jax.random.key(i), spp=24,
                                    cfg=cfg))
        for i in range(3)
    ]
    runs_p = [
        np.asarray(surface.render_path(scene, jax.random.key(10 + i),
                                       spp=48, max_depth=5,
                                       ray_tile=100))
        for i in range(3)
    ]
    img_b = np.mean(runs_b, axis=0)
    assert np.isfinite(img_b).all()
    assert img_b.mean() > 0
    assert_means_agree(runs_b, runs_p, z_max=4.0, floor_frac=0.02,
                       label="bdpt-vs-path-directional")


def test_bdpt_envmap():
    """ENVMAP emitter in the BDPT MIS mix (round 5, VERDICT r04 item
    7): importance-sampled envmap light-subpath starts (s>=2),
    solid-angle env NEE (s=1), and the escape family (s=0) must
    MIS-combine unbiased against the path tracer on an ASYMMETRIC map
    (a bright patch — the case uniform/cosine env sampling handles
    badly and the importance-sampled family exists for). Reference:
    envmap.cpp sampleRay through src/libbidir/pathsampler.cpp."""
    from alvrl_tpu.emitters import emitters as em_mod
    from alvrl_tpu.emitters.envmap import make_envmap
    from tests.ab_utils import assert_means_agree

    img = np.full((8, 16, 3), 0.05, np.float32)
    img[2:4, 3:6] = np.asarray([6.0, 4.0, 2.0], np.float32)  # patch
    em = em_mod.make_emitters([em_mod.ENVMAP], [[0, 0, 0]],
                              [[1.0, 1.0, 1.0]],
                              env=make_envmap(img))
    scene = _plane_scene(em)
    cfg = bdpt.BDPTConfig(n_eye=4, n_light=3, ray_tile=100)
    runs_b = [
        np.asarray(bdpt.render_bdpt(scene, jax.random.key(i), spp=24,
                                    cfg=cfg))
        for i in range(3)
    ]
    runs_p = [
        np.asarray(surface.render_path(scene, jax.random.key(10 + i),
                                       spp=48, max_depth=5,
                                       ray_tile=100))
        for i in range(3)
    ]
    img_b = np.mean(runs_b, axis=0)
    assert np.isfinite(img_b).all()
    assert img_b.mean() > 0
    assert_means_agree(runs_b, runs_p, z_max=4.0, floor_frac=0.02,
                       label="bdpt-vs-path-envmap")
