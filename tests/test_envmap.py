"""Environment map emitter + Preetham sky/sun tests.

Mirrors the reference's sampling-vs-pdf methodology (chi-square style,
SURVEY §4) for the envmap importance sampler, plus an analytic
open-scene fixture (uniform envmap must reproduce the constant-env
answer: sky pixels L, floor albedo*L)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.emitters import emitters as em_mod
from alvrl_tpu.emitters import sunsky
from alvrl_tpu.emitters.envmap import (
    eval_env, make_envmap, pdf_env, sample_env,
)


def _random_map(h=8, w=16, seed=0):
    r = np.random.RandomState(seed)
    img = r.rand(h, w, 3).astype(np.float32) ** 2 * 3.0
    img[2, 5] = 40.0  # a hot texel the sampler must favor
    return img


def test_sample_matches_pdf_histogram():
    """Texel visit frequencies must match the analytic p_texel."""
    img = _random_map()
    env = make_envmap(img)
    h, w = img.shape[:2]
    n = 40000
    u = jax.random.uniform(jax.random.key(1), (n, 2))
    d, pdf, _ = jax.vmap(lambda u2: sample_env(env, u2))(u)
    d = np.asarray(d)
    theta = np.arccos(np.clip(d[:, 1], -1, 1))
    phi = np.arctan2(-d[:, 2], d[:, 0])
    row = np.clip((theta / np.pi * h).astype(int), 0, h - 1)
    col = np.clip(((phi / (2 * np.pi) + 0.5) * w).astype(int), 0, w - 1)
    counts = np.zeros((h, w))
    np.add.at(counts, (row, col), 1.0)
    # p_texel from the pdf map: pdf * omega
    t0 = np.arange(h) / h * np.pi
    t1 = (np.arange(h) + 1) / h * np.pi
    omega = (np.cos(t0) - np.cos(t1))[:, None] * (2 * np.pi / w)
    p = np.asarray(env.pdf_map) * omega
    assert abs(p.sum() - 1.0) < 1e-4
    # compare where expected counts are meaningful
    exp = p * n
    mask = exp > 25
    rel = np.abs(counts[mask] - exp[mask]) / exp[mask]
    assert rel.mean() < 0.15, rel.mean()


def test_eval_pdf_consistency_integral():
    """E[L(d)/pdf(d)] over map samples == sum(L * omega) exactly
    (piecewise-constant importance sampling is variance-free here up to
    the +eps floor)."""
    img = _random_map(seed=3)
    env = make_envmap(img)
    n = 4096
    u = jax.random.uniform(jax.random.key(2), (n, 2))
    d, pdf, L = jax.vmap(lambda u2: sample_env(env, u2))(u)
    est = np.asarray(L / pdf[:, None]).mean(axis=0)
    h, w = img.shape[:2]
    t0 = np.arange(h) / h * np.pi
    t1 = (np.arange(h) + 1) / h * np.pi
    omega = (np.cos(t0) - np.cos(t1))[:, None] * (2 * np.pi / w)
    ref = (img * omega[..., None]).sum(axis=(0, 1))
    assert np.allclose(est, ref, rtol=0.05), (est, ref)
    # and the sampled L/pdf must agree with eval/pdf at the direction
    L2 = jax.vmap(lambda dd: eval_env(env, dd))(d)
    p2 = jax.vmap(lambda dd: pdf_env(env, dd))(d)
    assert np.allclose(np.asarray(L2), np.asarray(L), atol=1e-5)
    assert np.allclose(np.asarray(p2), np.asarray(pdf), rtol=1e-4)


def test_envmap_emission_power():
    """Photon emission integrates the map: E[weight * pmf] =
    sum(L * omega) * pi R^2 (sample_emission envmap branch)."""
    img = _random_map(seed=5)
    env = make_envmap(img)
    em = em_mod.make_emitters([em_mod.ENVMAP], [[0, 0, 0]],
                              [[1, 1, 1]], env=env)
    center = jnp.zeros(3)
    radius = jnp.float32(2.0)
    n = 4096
    keys = jax.random.split(jax.random.key(3), n)
    pos, d, wgt = jax.vmap(
        lambda k: em_mod.sample_emission(em, k, center, radius)
    )(keys)
    est = np.asarray(wgt).mean(axis=0)  # pmf = 1 (single emitter)
    h, w = img.shape[:2]
    t0 = np.arange(h) / h * np.pi
    t1 = (np.arange(h) + 1) / h * np.pi
    omega = (np.cos(t0) - np.cos(t1))[:, None] * (2 * np.pi / w)
    ref = (img * omega[..., None]).sum(axis=(0, 1)) * np.pi * 4.0
    assert np.allclose(est, ref, rtol=0.05), (est, ref)
    # photons travel inward: positions outside, directions toward scene
    assert (np.asarray(jax.vmap(jnp.dot)(d, pos)) < 0).all()


def test_uniform_envmap_matches_constant_analytic():
    """Open scene under a uniform envmap: sky pixels read exactly L,
    floor pixels albedo * L (same fixture as test_constant_env_analytic)."""
    from alvrl_tpu.geometry import shapes
    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.media.homogeneous import HomogeneousMedium
    from alvrl_tpu.scene.scene import Camera, Scene, look_at, make_materials

    v, f = shapes.rectangle()
    v = v @ np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32).T * 3.0
    env = make_envmap(np.full((4, 8, 3), 0.8, np.float32))
    em = em_mod.make_emitters([em_mod.ENVMAP], [[0, 0, 0]],
                              [[1, 1, 1]], env=env)
    vac = HomogeneousMedium(
        sigma_a=jnp.zeros(3), sigma_s=jnp.zeros(3),
        g=jnp.float32(0.0), sampling_weight=jnp.float32(0.0),
    )
    cam = Camera(
        to_world=look_at([0, 1.2, -2.5], [0, 0.4, 0], [0, 1, 0]),
        fov_x_deg=jnp.float32(70.0), width=12, height=12,
    )
    scene = Scene(
        vertices=jnp.asarray(v), faces=jnp.asarray(f),
        material=jnp.zeros(2, jnp.int32),
        materials=make_materials([0], [[0.6, 0.6, 0.6]]),
        emitters=em, medium=vac, camera=cam,
    )
    img = np.asarray(volpath.render_volpath(
        scene, jax.random.key(0), spp=96,
        cfg=volpath.VolpathConfig(max_depth=8, only_vrl_paths=False),
        ray_tile=144,
    ))
    sky = img[:3].mean()
    floor = img[-3:].mean()
    assert abs(sky - 0.8) < 1e-3, sky
    assert abs(floor - 0.6 * 0.8) < 0.05, floor


def test_preetham_sky_shape():
    """Analytic sanity on the baked sky: finite, positive where it
    matters, brighter toward the sun than away from it (aureole), and
    more luminous at the horizon than at the zenith for high turbidity
    (the classic Preetham behavior)."""
    sun = np.array([0.4, 0.5, 0.0])
    img = sunsky.preetham_sky_image(sun, turbidity=6.0, width=64,
                                    height=32)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    env = make_envmap(img)
    d_sun = jnp.asarray(sun / np.linalg.norm(sun), jnp.float32)
    near = np.asarray(eval_env(env, d_sun)).mean()
    d_anti = jnp.asarray([-0.4, 0.5, 0.0]) / np.linalg.norm([0.4, 0.5, 0])
    far = np.asarray(eval_env(env, d_anti)).mean()
    assert near > far, (near, far)
    zenith = np.asarray(eval_env(env, jnp.array([0.0, 1.0, 0.0]))).mean()
    horizon = np.asarray(
        eval_env(env, jnp.array([0.0, 0.05, -1.0]) /
                 np.linalg.norm([0.0, 0.05, -1.0]))
    ).mean()
    assert horizon > 0 and zenith > 0


def test_sun_radiance_attenuation():
    """Lower sun = dimmer and redder (longer optical path)."""
    high = sunsky.sun_rgb_radiance([0.0, 1.0, 0.0], turbidity=3.0)
    low = sunsky.sun_rgb_radiance([0.9, 0.1, 0.0], turbidity=3.0)
    assert (low < high).all()
    # red/blue ratio increases toward the horizon
    assert low[0] / low[2] > high[0] / high[2]


def test_splat_sun_power():
    """Sub-texel sun deposits the disk's full power into one texel."""
    img = np.zeros((16, 32, 3), np.float32)
    rad = np.array([1.0, 0.9, 0.8], np.float32)
    out = sunsky.splat_sun(img, [0.2, 0.9, 0.1], rad)
    h, w = img.shape[:2]
    t0 = np.arange(h) / h * np.pi
    t1 = (np.arange(h) + 1) / h * np.pi
    omega = (np.cos(t0) - np.cos(t1))[:, None] * (2 * np.pi / w)
    power = (out * omega[..., None]).sum(axis=(0, 1))
    expect = rad * sunsky.SUN_SOLID_ANGLE
    assert np.allclose(power, expect, rtol=0.02), (power, expect)


def test_loader_sky_and_sun():
    """Scene loader expands sky/sun/sunsky emitter descriptions."""
    from alvrl_tpu.scene import loader

    desc = {
        "camera": {"origin": [0, 1, -3], "target": [0, 0, 0],
                   "width": 8, "height": 8},
        "shapes": [{"type": "rectangle"}],
        "emitters": [{"type": "sunsky",
                      "sun_direction": [0.3, 0.7, 0.2],
                      "turbidity": 3.0, "resolution": 64,
                      "sun_scale": 1.0e4}],
    }
    scene = loader.load_json(desc)
    assert int((scene.emitters.kind == em_mod.ENVMAP).sum()) == 1
    assert scene.emitters.env.image.shape[0] == 32
    # sun baked into the map: its brightest texel dominates
    assert float(scene.emitters.env.image.max()) > 10.0 * float(
        jnp.sort(scene.emitters.env.image.reshape(-1))[
            scene.emitters.env.image.size // 2]
    )
    desc["emitters"] = [{"type": "sun", "sun_direction": [0.3, 0.7, 0.2]}]
    scene2 = loader.load_json(desc)
    assert int((scene2.emitters.kind == em_mod.DIRECTIONAL).sum()) == 1
