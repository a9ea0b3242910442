"""Adjoint particle tracer: light paths splatted to the sensor.

Counterpart of src/integrators/ptracer (the distributed particle tracer
built on ParticleProcess/ParticleTracer, particleproc.h:45,128): trace
light particles exactly like the VRL tracer's random walk, but at every
medium/surface vertex connect deterministically to the pinhole camera
and splat the attenuated contribution onto the film.

Pinhole connection math (SmallVCM-style): with the image plane placed
at d_img = W_px / (2 tan(fov/2)) so a pixel has unit area, a vertex y
with incident-flux weight beta contributes to its pixel

    beta * f(y -> cam) * tau(y <-> cam) * d_img^2 / (cos^3 theta * r^2)

where f is sigma_s * phase at a medium vertex / BSDF*cos at a surface
vertex, theta the angle to the camera forward axis, r the vertex-camera
distance. Normalized by the traced-particle count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from alvrl_tpu.core import math as m
from alvrl_tpu.core import rng
from alvrl_tpu.geometry import intersect
from alvrl_tpu.integrators.vrl.integrate import (
    bsdf_eval_smooth,
    eval_transmittance_between,
)
from alvrl_tpu.integrators.vrl.tracer import (
    TracerConfig,
    _sample_bsdf_importance,
    _sample_emission,
)
from alvrl_tpu.media import api as mapi
from alvrl_tpu.media import phase as ph
from alvrl_tpu.scene.scene import Scene
from alvrl_tpu.sensors import perspective


def _camera_splat_value(scene: Scene, p, f_val):
    """Common connection factors: visibility-attenuated f * importance.
    Returns (pixel_x, pixel_y, value (3,), on_screen)."""
    cam = scene.camera
    cam_pos = cam.to_world[:3, 3]
    fwd = cam.to_world[:3, 2]
    to_cam = cam_pos - p
    r2 = jnp.maximum(m.length_sq(to_cam), 1e-12)
    r = jnp.sqrt(r2)
    dir_cam = to_cam / r[..., None]

    d_world = -dir_cam  # direction the camera looks along to see p
    x, y = perspective.sample_position(cam, d_world)
    cos_t = jnp.maximum(m.dot(d_world, fwd), 1e-6)
    d_img = cam.width / (2.0 * jnp.tan(jnp.deg2rad(cam.fov_x_deg) * 0.5))
    importance = (d_img * d_img) / (cos_t ** 3 * r2)

    tau = eval_transmittance_between(scene, p, cam_pos)
    value = f_val * tau * importance
    on = (
        (x >= 0) & (x < cam.width) & (y >= 0) & (y < cam.height)
        & (cos_t > 1e-4)
    )
    return x, y, value, on


def _trace_and_splat_one(scene: Scene, key, cfg: TracerConfig):
    """One particle walk; emits per-depth splat records."""
    k_emit, k_walk = jax.random.split(key)
    pos, d, weight = _sample_emission(scene, k_emit)
    med = scene.medium

    state = dict(
        ray_o=pos, ray_d=d, beta=weight,
        tp=jnp.ones((3,)), eta=jnp.float32(1.0),
        active=~jnp.all(weight == 0.0),
    )

    def step(state, inp):
        depth, k = inp
        k_dist, k_phase, k_bsdf, k_rr = jax.random.split(k, 4)
        hit = intersect.intersect_all(
            state["ray_o"], state["ray_d"], scene.vertices, scene.faces
        )
        hit = hit._replace(
            p=jnp.where(hit.valid[..., None], hit.p, state["ray_o"])
        )
        dist_surf = jnp.where(hit.valid, hit.t, jnp.float32(1e30))
        ms = mapi.sample_distance_seg(
            med, k_dist, state["ray_o"], state["ray_d"], dist_surf
        )
        active = state["active"]
        medium_event = ms.success & active
        surface_event = (~ms.success) & hit.valid & active

        # ---- camera connections -------------------------------------
        cam_pos = scene.camera.to_world[:3, 3]
        # medium vertex: beta at vertex = beta * tau/pdfSuccess * sigma_s
        # = beta * w_scatter (then phase toward the camera, NOT / 4pi:
        # w_scatter already divides by pdfSuccess)
        beta_med_v = state["beta"] * ms.w_scatter
        dir_pc = m.normalize(cam_pos - ms.p)
        f_med = ph.eval_phase(
            med.phase_kind, med.g, -state["ray_d"], dir_pc,
            pp=med.phase_params,
        )[..., None]
        xm, ym, vm, on_m = _camera_splat_value(
            scene, ms.p, beta_med_v * f_med
        )
        # surface vertex
        beta_surf_v = state["beta"] * ms.w_pass
        dir_sc = m.normalize(cam_pos - hit.p)
        mat_id = scene.material[jnp.maximum(hit.prim, 0)]
        # importance transport through a Lambertian is symmetric; for
        # microfacets wi is the true incident direction
        f_surf = bsdf_eval_smooth(
            scene, mat_id, hit.ng, -state["ray_d"], dir_sc, p_world=hit.p
        )
        xs, ys, vs, on_s = _camera_splat_value(
            scene, hit.p, beta_surf_v * f_surf
        )

        out = dict(
            x=jnp.where(medium_event, xm, xs),
            y=jnp.where(medium_event, ym, ys),
            v=jnp.where(
                medium_event[..., None], vm,
                jnp.where(surface_event[..., None], vs, 0.0),
            ),
            ok=(medium_event & on_m) | (surface_event & on_s),
        )

        # ---- continuation (same walk as the VRL tracer) -------------
        wo_phase, w_phase, _ = ph.sample_phase(
            med.phase_kind, med.g, -state["ray_d"], rng.uniform2(k_phase),
            pp=med.phase_params,
        )
        wo_bsdf, w_bsdf, eta_ratio, bsdf_valid = _sample_bsdf_importance(
            scene, k_bsdf, mat_id, hit.ng, hit.ng_raw, state["ray_d"], hit.p
        )
        new_o = jnp.where(medium_event[..., None], ms.p, hit.p)
        new_d = jnp.where(medium_event[..., None], wo_phase, wo_bsdf)
        new_beta = jnp.where(
            medium_event[..., None],
            state["beta"] * ms.w_scatter * w_phase[..., None],
            state["beta"] * ms.w_pass * w_bsdf,
        )
        new_tp = jnp.where(
            medium_event[..., None],
            state["tp"] * ms.w_scatter * w_phase[..., None],
            state["tp"] * ms.w_pass * w_bsdf,
        )
        new_eta = jnp.where(
            surface_event, state["eta"] * eta_ratio, state["eta"]
        )
        survive = medium_event | (
            surface_event & bsdf_valid & ~jnp.all(w_bsdf == 0.0)
        )
        q = jnp.minimum(jnp.max(new_tp) * new_eta ** 2, 0.95)
        do_rr = depth >= cfg.rr_depth
        rr_kill = do_rr & (rng.uniform(k_rr) >= q)
        rr_scale = jnp.where(do_rr & ~rr_kill, 1.0 / jnp.maximum(q, 1e-30), 1.0)
        new_state = dict(
            ray_o=new_o, ray_d=new_d,
            beta=new_beta * rr_scale, tp=new_tp * rr_scale,
            eta=new_eta, active=survive & ~rr_kill,
        )
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                active.reshape(active.shape + (1,) * (n.ndim - active.ndim)),
                n, o,
            ),
            new_state, state,
        )
        return new_state, out

    depths = jnp.arange(1, cfg.max_depth + 1)
    keys = jax.random.split(k_walk, cfg.max_depth)
    _, outs = jax.lax.scan(step, state, (depths, keys))
    return outs


@partial(jax.jit, static_argnames=("num_particles", "cfg"))
def render_ptracer(scene: Scene, key, num_particles: int = 4096,
                   cfg: TracerConfig = TracerConfig()):
    """Light-traced image estimate (H, W, 3)."""
    keys = jax.random.split(key, num_particles)
    outs = jax.vmap(lambda k: _trace_and_splat_one(scene, k, cfg))(keys)
    x = outs["x"].reshape(-1)
    y = outs["y"].reshape(-1)
    v = outs["v"].reshape(-1, 3)
    ok = outs["ok"].reshape(-1)
    cam = scene.camera
    px = jnp.clip(x.astype(jnp.int32), 0, cam.width - 1)
    py = jnp.clip(y.astype(jnp.int32), 0, cam.height - 1)
    img = jnp.zeros((cam.height, cam.width, 3))
    img = img.at[py, px].add(jnp.where(ok[..., None], v, 0.0))
    return img / num_particles
