"""Layered BSDFs: coating (coating.cpp), HK slab (hk.cpp), normal
mapping (normalmap.cpp/bumpmap.cpp)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from alvrl_tpu.bsdf import api as bsdf_api
from alvrl_tpu.bsdf import layered
from alvrl_tpu.scene import presets
from alvrl_tpu.scene.scene import COATING, HK, NORMALMAP

NG = jnp.array([0.0, 0.0, 1.0])
WI = jnp.array([0.3, 0.1, 0.95]) / np.linalg.norm([0.3, 0.1, 0.95])


def _scene_with(kind, eta=1.5, sigma_a=(0.0, 0.0, 0.0), thickness=1.0,
                alb=(0.5, 0.5, 0.5), g=0.0, tex_id=0, textures=None):
    scene = presets.cornell_smoke(width=4, height=4)
    mats = scene.materials
    m2 = jtu.tree_map(lambda a: jnp.concatenate([a, a[-1:]], 0), mats)
    m2 = m2.replace(
        kind=jnp.concatenate([mats.kind, jnp.asarray([kind], jnp.int32)]),
        eta=jnp.concatenate([mats.eta, jnp.asarray([eta])]),
        albedo=jnp.concatenate([mats.albedo, jnp.asarray([list(alb)])]),
        albedo2=jnp.concatenate(
            [mats.albedo2, jnp.asarray([list(sigma_a)])]),
        exponent=jnp.concatenate(
            [mats.exponent, jnp.asarray([thickness])]),
        alpha=jnp.concatenate([mats.alpha, jnp.asarray([g])]),
        nested=jnp.concatenate(
            [mats.nested, jnp.asarray([0], jnp.int32)]),  # white diffuse
        tex_id=jnp.concatenate(
            [mats.tex_id, jnp.asarray([tex_id], jnp.int32)]),
    )
    scene = scene.replace(materials=m2)
    if textures is not None:
        scene = scene.replace(textures=jnp.asarray(textures, jnp.float32))
    return scene, m2.kind.shape[0] - 1


def _hemi_integral(f, n=128, lower=False):
    th = (np.arange(n) + 0.5) / n * (np.pi / 2)
    if lower:
        th = np.pi - th
    phi = (np.arange(2 * n) + 0.5) / (2 * n) * 2 * np.pi
    t, p = np.meshgrid(th, phi, indexing="ij")
    wo = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], -1
    ).reshape(-1, 3).astype(np.float32)
    vals = np.asarray(jax.vmap(f)(jnp.asarray(wo)))
    if vals.ndim == 2:
        vals = vals.mean(-1)
    return (vals.reshape(n, 2 * n) * np.sin(t)).sum() * (
        np.pi / 2 / n) * (np.pi / n)


def test_coating_eta1_reduces_to_nested():
    """eta=1, no absorption: the coat is a no-op; eval must equal the
    nested white diffuse exactly."""
    scene, mid = _scene_with(COATING, eta=1.0)
    wo = jnp.array([0.2, -0.3, 0.9]) / np.linalg.norm([0.2, -0.3, 0.9])
    f = np.asarray(bsdf_api.eval_smooth(scene, jnp.int32(mid), NG, WI, wo))
    f0 = np.asarray(bsdf_api.eval_smooth(scene, jnp.int32(0), NG, WI, wo))
    np.testing.assert_allclose(f, f0, rtol=1e-4)


def test_coating_energy_and_absorption():
    scene, mid = _scene_with(COATING, eta=1.5)
    total = _hemi_integral(
        lambda w: bsdf_api.eval_smooth(scene, jnp.int32(mid), NG, WI, w))
    assert 0.0 < total <= 1.0, total
    # absorbing coat darkens
    scene_a, mid_a = _scene_with(COATING, eta=1.5,
                                 sigma_a=(0.5, 0.5, 0.5))
    total_a = _hemi_integral(
        lambda w: bsdf_api.eval_smooth(scene_a, jnp.int32(mid_a), NG, WI, w))
    assert total_a < 0.6 * total, (total_a, total)


def test_coating_sample_eval_consistency():
    """E[weight over smooth samples]*P + P(delta) tracks the total
    reflectance: the one-sample estimator must integrate eval."""
    scene, mid = _scene_with(COATING, eta=1.5)
    n = 30_000
    u = jax.random.uniform(jax.random.key(1), (n, bsdf_api.N_SAMPLE_DIMS))
    smp = jax.vmap(
        lambda uu: bsdf_api.sample_from_uniforms(
            scene, uu, jnp.int32(mid), NG, NG, -WI, jnp.zeros(3))
    )(u)
    w_mean = float(jnp.mean(
        jnp.where(smp.is_delta[:, None], 0.0, smp.weight)))
    total = _hemi_integral(
        lambda w: bsdf_api.eval_smooth(scene, jnp.int32(mid), NG, WI, w))
    assert abs(w_mean - total) < 0.05, (w_mean, total)


def test_hk_energy_and_delta():
    scene, mid = _scene_with(HK, alb=(0.8, 0.8, 0.8),
                             sigma_a=(0.1, 0.1, 0.1), thickness=1.0,
                             g=0.3)
    up = _hemi_integral(
        lambda w: bsdf_api.eval_smooth(scene, jnp.int32(mid), NG, WI, w))
    dn = _hemi_integral(
        lambda w: bsdf_api.eval_smooth(scene, jnp.int32(mid), NG, WI, w),
        lower=True)
    t_delta = float(np.mean(np.asarray(layered.hk_delta_transmittance(
        jnp.array([0.0, 0.0, float(WI[2])]),
        jnp.full(3, 0.8), jnp.full(3, 0.1), jnp.float32(1.0)))))
    assert up > 0 and dn > 0
    assert up + dn + t_delta <= 1.05, (up, dn, t_delta)

    # sampling consistency: E[weight] = scattered integral + delta
    n = 30_000
    u = jax.random.uniform(jax.random.key(2), (n, bsdf_api.N_SAMPLE_DIMS))
    smp = jax.vmap(
        lambda uu: bsdf_api.sample_from_uniforms(
            scene, uu, jnp.int32(mid), NG, NG, -WI, jnp.zeros(3))
    )(u)
    w_mean = float(jnp.mean(smp.weight))
    assert abs(w_mean - (up + dn + t_delta)) < 0.05, (
        w_mean, up + dn + t_delta)


def test_normalmap_flat_is_identity_and_tilt_shifts():
    flat = np.full((1, 4, 4, 3), [0.5, 0.5, 1.0], np.float32)
    scene, mid = _scene_with(NORMALMAP, tex_id=0, textures=flat)
    uv = jnp.array([0.5, 0.5])
    wo = jnp.array([0.2, -0.3, 0.9]) / np.linalg.norm([0.2, -0.3, 0.9])
    f = np.asarray(bsdf_api.eval_smooth(
        scene, jnp.int32(mid), NG, WI, wo, uv=uv))
    f0 = np.asarray(bsdf_api.eval_smooth(
        scene, jnp.int32(0), NG, WI, wo, uv=uv))
    np.testing.assert_allclose(f, f0, rtol=1e-4)

    tilt = np.full((1, 4, 4, 3), [0.8, 0.5, 0.8], np.float32)
    scene_t, mid_t = _scene_with(NORMALMAP, tex_id=0, textures=tilt)
    f_t = np.asarray(bsdf_api.eval_smooth(
        scene_t, jnp.int32(mid_t), NG, WI, wo, uv=uv))
    assert not np.allclose(f_t, f0, rtol=1e-2)


def test_bump_to_normal_map():
    h = np.zeros((8, 8), np.float32)
    nm = layered.bump_to_normal_map(h)
    np.testing.assert_allclose(nm[..., 2], 1.0)
    h2 = np.tile(np.linspace(0, 1, 8, dtype=np.float32), (8, 1))
    nm2 = layered.bump_to_normal_map(h2, strength=2.0)
    assert (nm2[..., 0] < 0.5).all()  # slope in +x tilts normals to -x
