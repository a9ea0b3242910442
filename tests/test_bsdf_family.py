"""BSDF family tests: Phong, Ward, difftrans, smooth plastic, mask,
mixture — energy/consistency checks in the style of the reference's
chi-square + furnace methodology (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.bsdf import api as bsdf_api
from alvrl_tpu.bsdf import lobes
from alvrl_tpu.scene.scene import (
    DIFFTRANS, DIFFUSE, MASK, MIXTURE, PHONG, PLASTIC, WARD,
    Camera, Scene, look_at, make_materials,
)
from alvrl_tpu.media.homogeneous import HomogeneousMedium
from alvrl_tpu.scene.scene import make_point_emitters


def _mini_scene(materials):
    """One-triangle scene wrapping a material table for api calls."""
    v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
    f = jnp.asarray([[0, 1, 2]], jnp.int32)
    return Scene(
        vertices=v, faces=f, material=jnp.zeros(1, jnp.int32),
        materials=materials,
        emitters=make_point_emitters([[0, 0, 1]], [[1, 1, 1]]),
        medium=HomogeneousMedium(
            sigma_a=jnp.zeros(3), sigma_s=jnp.zeros(3),
            g=jnp.float32(0.0), sampling_weight=jnp.float32(0.0)),
        camera=Camera(to_world=look_at([0, 0, -1], [0, 0, 0], [0, 1, 0]),
                      fov_x_deg=jnp.float32(60.0), width=4, height=4),
    )


def _mc_reflectance_from_eval(eval_fn, wi, n=40000, seed=5, sphere=False):
    """Uniform-(hemi)sphere MC of the integral of f*cos over wo."""
    u = jax.random.normal(jax.random.key(seed), (n, 3))
    d = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    if not sphere:
        d = d.at[:, 2].set(jnp.abs(d[:, 2]))
        dom = 2 * np.pi
    else:
        dom = 4 * np.pi
    vals = jax.vmap(lambda wo: eval_fn(wi, wo))(d)
    return np.asarray(vals).mean(axis=0) * dom


def _mc_weight(sample_fn, n=30000, seed=7):
    keys = jax.random.split(jax.random.key(seed), n)
    w = jax.vmap(sample_fn)(keys)
    return np.asarray(w).mean(axis=0)


def test_phong_sample_matches_eval_integral():
    wi = jnp.asarray([0.3, 0.1, 0.95])
    wi = wi / jnp.linalg.norm(wi)
    kd = jnp.asarray([0.4, 0.3, 0.2])
    ks = jnp.asarray([0.3, 0.3, 0.3])
    expo = jnp.float32(40.0)

    ref = _mc_reflectance_from_eval(
        lambda a, b: lobes.eval_phong(a, b, kd, ks, expo), wi)

    def smp(k):
        u3 = jax.random.uniform(k, (3,))
        wo, w, _ = lobes.sample_phong(u3, wi, kd, ks, expo)
        return jnp.where(wo[2] > 0, w, 0.0)

    est = _mc_weight(smp)
    assert np.allclose(est, ref, rtol=0.08), (est, ref)
    # energy conservation: directional-hemispherical reflectance <= 1
    assert (ref <= 1.0 + 1e-3).all()


def test_ward_sample_matches_eval_integral():
    wi = jnp.asarray([0.4, -0.2, 0.89])
    wi = wi / jnp.linalg.norm(wi)
    kd = jnp.asarray([0.2, 0.2, 0.5])
    ks = jnp.asarray([0.4, 0.4, 0.4])
    au, av = jnp.float32(0.25), jnp.float32(0.1)

    ref = _mc_reflectance_from_eval(
        lambda a, b: lobes.eval_ward(a, b, kd, ks, au, av), wi,
        n=120000)

    def smp(k):
        u3 = jax.random.uniform(k, (3,))
        wo, w, _ = lobes.sample_ward(u3, wi, kd, ks, au, av)
        return w

    est = _mc_weight(smp, n=120000)
    assert np.allclose(est, ref, rtol=0.10), (est, ref)


def test_difftrans_transmits():
    wi = jnp.asarray([0.0, 0.0, 1.0])
    alb = jnp.asarray([0.7, 0.6, 0.5])
    ref = _mc_reflectance_from_eval(
        lambda a, b: lobes.eval_difftrans(a, b, alb), wi, sphere=True)
    assert np.allclose(ref, np.asarray(alb), rtol=0.05), ref

    def smp(k):
        u2 = jax.random.uniform(k, (2,))
        wo, w, _ = lobes.sample_difftrans(u2, wi, alb)
        return jnp.where(wo[2] < 0, w, 0.0)  # must be on the far side

    est = _mc_weight(smp)
    assert np.allclose(est, np.asarray(alb), rtol=0.02), est


def test_plastic_energy_split():
    """Delta coat + diffuse base: total sampled energy <= 1 and the
    diffuse part matches the (1-Fi)(1-Fo) eval integral."""
    wi = jnp.asarray([0.2, 0.0, 0.98])
    wi = wi / jnp.linalg.norm(wi)
    alb = jnp.asarray([0.8, 0.8, 0.8])
    eta = jnp.float32(1.5)

    ref_smooth = _mc_reflectance_from_eval(
        lambda a, b: lobes.eval_plastic_smooth(a, b, alb, eta), wi)

    def smp_diffuse(k):
        u3 = jax.random.uniform(k, (3,))
        wo, w, is_d = lobes.sample_plastic_smooth(u3, wi, alb, eta)
        return jnp.where(~is_d, w, 0.0)

    def smp_total(k):
        u3 = jax.random.uniform(k, (3,))
        _, w, _ = lobes.sample_plastic_smooth(u3, wi, alb, eta)
        return w

    est_d = _mc_weight(smp_diffuse)
    est_t = _mc_weight(smp_total)
    assert np.allclose(est_d, ref_smooth, rtol=0.08), (est_d, ref_smooth)
    assert (est_t <= 1.0 + 1e-3).all()


def test_mask_and_mixture_dispatch():
    """MASK: opacity blend with pass-through; MIXTURE: convex combo."""
    mats = make_materials(
        kinds=[MASK, DIFFUSE, DIFFUSE, MIXTURE],
        albedos=[[0, 0, 0], [0.8, 0.2, 0.2], [0.2, 0.2, 0.8], [0, 0, 0]],
        opacity=[0.3, 1.0, 1.0, 0.25],
        nested=[1, 0, 0, 1], nested2=[0, 0, 0, 2],
    )
    scene = _mini_scene(mats)
    ng = jnp.asarray([0.0, 0.0, 1.0])
    wi = jnp.asarray([0.0, 0.0, 1.0])
    wo = jnp.asarray([0.3, 0.0, 0.954])
    wo = wo / jnp.linalg.norm(wo)
    p = jnp.zeros(3)

    f1 = np.asarray(bsdf_api.eval_smooth(scene, 1, ng, wi, wo, p))
    f2 = np.asarray(bsdf_api.eval_smooth(scene, 2, ng, wi, wo, p))
    f_mask = np.asarray(bsdf_api.eval_smooth(scene, 0, ng, wi, wo, p))
    f_mix = np.asarray(bsdf_api.eval_smooth(scene, 3, ng, wi, wo, p))
    assert np.allclose(f_mask, 0.3 * f1, rtol=1e-5)
    assert np.allclose(f_mix, 0.25 * f1 + 0.75 * f2, rtol=1e-5)

    # sampled energy of the mask: opacity*albedo1 + (1-opacity)*1
    d_in = jnp.asarray([0.0, 0.0, -1.0])

    def smp(k):
        s = bsdf_api.sample(scene, k, jnp.int32(0), ng, ng, d_in, p)
        return s.weight

    est = _mc_weight(smp, n=20000)
    expect = 0.3 * np.array([0.8, 0.2, 0.2]) + 0.7 * 1.0
    assert np.allclose(est, expect, rtol=0.05), (est, expect)

    # mask pass-through keeps the direction and flags delta
    def smp_dir(k):
        s = bsdf_api.sample(scene, k, jnp.int32(0), ng, ng, d_in, p)
        passthrough = jnp.all(jnp.abs(s.wo - d_in) < 1e-6)
        return jnp.stack([passthrough.astype(jnp.float32),
                          s.is_delta.astype(jnp.float32)])

    frac = _mc_weight(smp_dir, n=4000)
    assert abs(frac[0] - 0.7) < 0.05, frac
    assert abs(frac[1] - 0.7) < 0.05, frac


def test_volpath_with_new_kinds_runs():
    """A box scene with phong/ward/mask walls renders finite."""
    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.scene import loader

    desc = {
        "camera": {"origin": [0, 1, -2.5], "target": [0, 0.5, 0],
                   "width": 6, "height": 6},
        "medium": {"type": "homogeneous", "sigma_s": [0.1] * 3,
                   "sigma_a": [0.01] * 3},
        "materials": [
            {"name": "ph", "type": "phong", "albedo": [0.4, 0.3, 0.2],
             "specular": [0.3, 0.3, 0.3], "exponent": 25.0},
            {"name": "wd", "type": "ward", "albedo": [0.2, 0.3, 0.4],
             "alpha": 0.2, "alpha_v": 0.08},
            {"name": "msk", "type": "mask", "opacity": 0.5,
             "nested": "ph"},
            {"name": "pl", "type": "plastic", "albedo": [0.6, 0.6, 0.6],
             "eta": 1.5},
        ],
        "shapes": [
            {"type": "rectangle", "material": "ph"},
            {"type": "sphere", "center": [0.0, 0.5, 0.5], "radius": 0.4,
             "material": "wd", "n_theta": 6, "n_phi": 8},
            {"type": "sphere", "center": [-0.8, 0.5, 0.0], "radius": 0.3,
             "material": "msk", "n_theta": 6, "n_phi": 8},
            {"type": "sphere", "center": [0.8, 0.5, 0.0], "radius": 0.3,
             "material": "pl", "n_theta": 6, "n_phi": 8},
        ],
        "emitters": [{"type": "point", "position": [0, 2.0, -1.0],
                      "intensity": [4, 4, 4]}],
    }
    scene = loader.load_json(desc)
    img = np.asarray(volpath.render_volpath(
        scene, jax.random.key(0), spp=8,
        cfg=volpath.VolpathConfig(max_depth=6, only_vrl_paths=False),
        ray_tile=36,
    ))
    assert np.isfinite(img).all()
    assert img.mean() > 0
