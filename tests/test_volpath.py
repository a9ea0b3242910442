"""Volpath tests: single-scatter vs deterministic quadrature.

The single-scatter radiance of a point light in a homogeneous medium
has a 1D integral form
    Li(ray) = int_0^T sigma_s tau(0,s) phase(cos) I/r(s)^2 tau(s->L) V ds
which we evaluate by dense quadrature on the host and compare against
the Monte Carlo volpath in single-scatter mode — the analog of the
reference's analytic fixtures (data/tests/, SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import math as m
from alvrl_tpu.geometry import intersect
from alvrl_tpu.integrators import volpath
from alvrl_tpu.media import phase as ph
from alvrl_tpu.scene import presets


def _single_scatter_quadrature(scene, o, d, n_steps=4000):
    hit = intersect.intersect_all(
        jnp.asarray(o), jnp.asarray(d), scene.vertices, scene.faces
    )
    t_max = float(hit.t)
    light = np.asarray(scene.emitters.position[0])
    inten = np.asarray(scene.emitters.intensity[0])
    sig_t = np.asarray(scene.medium.sigma_t)
    sig_s = np.asarray(scene.medium.sigma_s)
    g = float(scene.medium.g)
    o = np.asarray(o)
    d = np.asarray(d)

    s = (np.arange(n_steps) + 0.5) * (t_max / n_steps)
    p = o[None, :] + s[:, None] * d[None, :]
    r = np.linalg.norm(light[None, :] - p, axis=-1)
    to_l = (light[None, :] - p) / r[:, None]
    # visibility via the jax occlusion helper
    vis = ~np.asarray(
        intersect.occluded(
            jnp.asarray(p, jnp.float32),
            jnp.broadcast_to(jnp.asarray(light), (n_steps, 3)),
            scene.vertices,
            scene.faces,
            scene.opaque_faces(),
        )
    )
    cos = np.sum((-d[None, :]) * to_l, axis=-1)
    phase = np.asarray(
        ph.eval_hg(jnp.float32(g), jnp.asarray(-d, jnp.float32)[None, :].repeat(n_steps, 0), jnp.asarray(to_l, jnp.float32))
    )
    tau_cam = np.exp(-sig_t[None, :] * s[:, None])
    tau_l = np.exp(-sig_t[None, :] * r[:, None])
    integrand = (
        sig_s[None, :] * tau_cam * tau_l * phase[:, None]
        * (inten[None, :] / (r * r)[:, None]) * vis[:, None]
    )
    medium_term = integrand.sum(axis=0) * (t_max / n_steps)

    # direct surface term: survive the medium to the hit, then diffuse
    # NEE at the wall (included by the tracer's surface branch)
    hp = np.asarray(hit.p)
    ng = np.asarray(hit.ng)
    mat = int(np.asarray(scene.material[int(hit.prim)]))
    alb = np.asarray(scene.materials.albedo[mat])
    rl = np.linalg.norm(light - hp)
    to_l = (light - hp) / rl
    vis_s = not bool(
        intersect.occluded(
            jnp.asarray(hp), jnp.asarray(light),
            scene.vertices, scene.faces, scene.opaque_faces(),
        )
    )
    cos_o = max(float(np.dot(ng, to_l)), 0.0)
    surf_term = (
        np.exp(-sig_t * t_max) * alb / np.pi * cos_o
        * inten / (rl * rl) * np.exp(-sig_t * rl) * float(vis_s)
    )
    return medium_term + surf_term


def test_single_scatter_matches_quadrature():
    scene = presets.cornell_smoke(width=4, height=4, with_blocker=True)
    o = np.array([0.0, 0.0, -0.99], np.float32)
    d = np.array([0.05, -0.1, 1.0], np.float32)
    d = d / np.linalg.norm(d)

    expected = _single_scatter_quadrature(scene, o, d)

    cfg = volpath.VolpathConfig(
        max_depth=2, only_vrl_paths=False, single_scatter=True
    )
    n = 3000
    keys = jax.random.split(jax.random.key(0), n)
    li = jax.vmap(
        lambda k: volpath.li_volpath(
            scene, jnp.asarray(o), jnp.asarray(d), k, cfg
        )
    )(keys)
    est = np.asarray(li).mean(axis=0)
    np.testing.assert_allclose(est, expected, rtol=0.08)


def test_volpath_render_finite():
    scene = presets.cornell_smoke(width=8, height=8)
    img = volpath.render_volpath(
        scene, jax.random.key(1), spp=8,
        cfg=volpath.VolpathConfig(max_depth=6), ray_tile=64,
    )
    assert bool(jnp.isfinite(img).all())
    assert float(img.max()) > 0


def test_surface_path_tracer():
    """path = volpath over a vacuumized scene: energy comes only from
    surface NEE; must be finite and positive, and direct <= full."""
    import jax

    from alvrl_tpu.integrators import surface
    from alvrl_tpu.scene import presets

    scene = presets.cornell_smoke(width=6, height=6)
    full = surface.render_path(scene, jax.random.key(0), spp=24,
                               max_depth=6, ray_tile=36)
    direct = surface.render_direct(scene, jax.random.key(0), spp=24,
                                   ray_tile=36)
    f = np.asarray(full)
    d = np.asarray(direct)
    assert np.isfinite(f).all() and np.isfinite(d).all()
    assert f.mean() > 0 and d.mean() > 0
    # global illumination adds energy over direct-only
    assert f.mean() >= d.mean() * 0.999


def test_constant_env_analytic():
    """Open-scene analytic fixture (the reference's data/tests style):
    a Lambertian floor under a constant environment — sky pixels read
    exactly L, floor pixels albedo * L."""
    from alvrl_tpu.emitters import emitters as em_mod
    from alvrl_tpu.geometry import shapes
    from alvrl_tpu.media.homogeneous import HomogeneousMedium
    from alvrl_tpu.scene.scene import Camera, Scene, look_at, make_materials

    v, f = shapes.rectangle()
    v = v @ np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32).T * 3.0
    em = em_mod.make_emitters([em_mod.CONSTANT], [[0, 0, 0]],
                              [[0.8, 0.8, 0.8]])
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
    assert abs(sky - 0.8) < 1e-4, sky
    assert abs(floor - 0.48) < 0.03, floor
