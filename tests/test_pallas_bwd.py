"""Backward Pallas kernel (ops/vrl_pallas_bwd) — AD vs same-seed FD.

Under the Pallas interpreter the on-core PRNG yields zeros on BOTH the
forward and the replaying backward kernel, so the estimator is a
deterministic function of the parameters and central finite
differences of the FORWARD must match the custom-VJP gradients
exactly (to FD truncation)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from alvrl_tpu.geometry import intersect
from alvrl_tpu.integrators.vrl import tracer
from alvrl_tpu.ops import pack as pk
from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_diff
from alvrl_tpu.scene import presets
from alvrl_tpu.sensors import perspective


def _setup():
    scene = presets.cornell_smoke(width=16, height=8)
    scene = scene.replace(medium=scene.medium.replace(g=jnp.float32(0.4)))
    vrls = tracer.trace(scene, jax.random.key(0), 24)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(8))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)
    tri_flat = pk.pack_tris(scene)
    seed = jnp.asarray([123], jnp.int32)

    def loss(params):
        med = scene.medium.replace(
            sigma_a=params["sa"], sigma_s=params["ss"], g=params["g"])
        sc = scene.replace(medium=med)
        v2 = vrls.replace(power=vrls.power * params["pscale"])
        ray_pack = pk.pack_rays(sc, ray_o, ray_d, hit)
        vrl_pack = pk.pack_vrls(v2)
        med_pack = pk.pack_medium(sc)
        out = vrl_sum_diff(ray_pack, vrl_pack, med_pack, tri_flat, seed,
                           2, 1, True, 0)
        return jnp.mean(out)

    p0 = {"sa": scene.medium.sigma_a, "ss": scene.medium.sigma_s,
          "g": scene.medium.g, "pscale": jnp.float32(1.0)}
    return loss, p0


def test_bwd_kernel_matches_fd():
    loss, p0 = _setup()
    with pltpu.force_tpu_interpret_mode():
        g_ad = jax.grad(loss)(p0)
        l0 = float(loss(p0))
        assert np.isfinite(l0) and l0 > 0

        def fd(name, idx=None, eps=2e-3):
            def shift(s):
                q = dict(p0)
                if idx is None:
                    q[name] = p0[name] + s
                else:
                    q[name] = p0[name].at[idx].add(s)
                return float(loss(q))
            return (shift(eps) - shift(-eps)) / (2 * eps)

        checks = [("g", None), ("pscale", None), ("sa", 0), ("ss", 1)]
        for name, idx in checks:
            v_fd = fd(name, idx)
            v_ad = float(g_ad[name] if idx is None else g_ad[name][idx])
            denom = max(abs(v_fd), 1e-6)
            assert abs(v_ad - v_fd) / denom < 5e-3, (name, idx, v_ad, v_fd)


def _fd_check(loss, p0, g_ad, checks, tol=5e-3, eps=2e-3):
    for name, idx in checks:
        def shift(s):
            q = dict(p0)
            if idx is None:
                q[name] = p0[name] + s
            else:
                q[name] = p0[name].at[idx].add(s)
            return float(loss(q))
        v_fd = (shift(eps) - shift(-eps)) / (2 * eps)
        v_ad = float(g_ad[name] if idx is None else g_ad[name][idx])
        denom = max(abs(v_fd), 1e-6)
        assert abs(v_ad - v_fd) / denom < tol, (name, idx, v_ad, v_fd)


def test_bwd_rayleigh_phase():
    """ADVICE r03 item 1: the backward kernel must dispatch on
    phase_kind — with a Rayleigh phase the replayed integrand must
    match the forward (FD agreement) and d/dg must vanish."""
    scene = presets.cornell_smoke(width=16, height=8)
    vrls = tracer.trace(scene, jax.random.key(0), 24)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(8))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)
    tri_flat = pk.pack_tris(scene)
    seed = jnp.asarray([77], jnp.int32)

    def loss(params):
        med = scene.medium.replace(
            sigma_a=params["sa"], sigma_s=params["ss"], g=params["g"])
        sc = scene.replace(medium=med)
        v2 = vrls.replace(power=vrls.power * params["pscale"])
        ray_pack = pk.pack_rays(sc, ray_o, ray_d, hit)
        vrl_pack = pk.pack_vrls(v2)
        med_pack = pk.pack_medium(sc)
        out = vrl_sum_diff(ray_pack, vrl_pack, med_pack, tri_flat, seed,
                           2, 1, True, 1)   # phase_kind=1: Rayleigh
        return jnp.mean(out)

    p0 = {"sa": scene.medium.sigma_a, "ss": scene.medium.sigma_s,
          "g": jnp.float32(0.3), "pscale": jnp.float32(1.0)}
    with pltpu.force_tpu_interpret_mode():
        g_ad = jax.grad(loss)(p0)
        assert float(loss(p0)) > 0
        # Rayleigh has no g dependence at all
        assert abs(float(g_ad["g"])) < 1e-12
        _fd_check(loss, p0, g_ad,
                  [("pscale", None), ("sa", 0), ("ss", 1)])


def test_bwd_hetero_matches_fd():
    """Heterogeneous unclustered kernel VJP (VERDICT r03 next-round
    item 1): FD agreement for sigma_t_color / albedo (through
    sigma_s_color) / g / power scale / density scale. The density-scale
    path exercises BOTH channels: the OD-table cotangents chained
    through media.heterogeneous.cumulative_od in XLA AND the in-kernel
    d_dens accumulation."""
    from alvrl_tpu.media import api as mapi
    from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_hetero_diff

    scene = presets.cornell_grid_smoke(width=16, height=8, grid_res=12)
    med0 = scene.medium
    vrls = tracer.trace(scene, jax.random.key(0), 24)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(8))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)
    tri_flat = pk.pack_tris(scene)
    seed = jnp.asarray([5], jnp.int32)
    cp_pack, cp_err = pk.pack_cp(med0, rank=8)
    assert cp_err < 0.05

    def loss(params):
        s = params["dscale"]
        med = med0.replace(
            sigma_t_color=params["stc"], albedo=params["alb"],
            g=params["g"], scale=med0.scale * s)
        sc = mapi.prepare_scene(scene.replace(medium=med))
        v2 = vrls.replace(power=vrls.power * params["pscale"])
        ray_pack = pk.pack_rays_hetero(sc, ray_o, ray_d, hit)
        vrl_pack = pk.pack_vrls_hetero(v2, sc.medium)
        med_pack = pk.pack_medium_hetero(sc.medium)
        out = vrl_sum_hetero_diff(
            ray_pack, vrl_pack, med_pack, cp_pack, s, tri_flat, seed,
            8, 2, 1, True, 0, 4)
        return jnp.mean(out)

    p0 = {"stc": med0.sigma_t_color, "alb": med0.albedo,
          "g": med0.g, "pscale": jnp.float32(1.0),
          "dscale": jnp.float32(1.0)}
    with pltpu.force_tpu_interpret_mode():
        g_ad = jax.grad(loss)(p0)
        assert float(loss(p0)) > 0
        _fd_check(loss, p0, g_ad,
                  [("g", None), ("pscale", None), ("stc", 0),
                   ("alb", 1), ("dscale", None)],
                  tol=1e-2)


def _clustered_setup():
    """Shared fixture for the clustered VJP tests: rays in 2 tiles
    mapped to 2 slices whose tables draw from the same VRL buffer with
    different weights."""
    import numpy as np_

    from alvrl_tpu.integrators.vrl import vrl as vrl_mod

    scene = presets.cornell_smoke(width=16, height=16)
    scene = scene.replace(medium=scene.medium.replace(g=jnp.float32(0.3)))
    vrls = vrl_mod.compact(
        tracer.trace(scene, jax.random.key(0), 24,
                     tracer.TracerConfig(max_depth=8)),
        128, slots_per_particle=8)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(16))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)
    tile_slice = jnp.asarray([0, 1], jnp.int32)
    w0 = jnp.asarray(np_.linspace(0.5, 1.5, 128), jnp.float32)
    w1 = jnp.asarray(np_.linspace(1.2, 0.3, 128), jnp.float32)
    return scene, vrls, ray_o, ray_d, hit, tile_slice, (w0, w1)


def test_bwd_clustered_matches_fd():
    from alvrl_tpu.ops import vrl_pallas as vp
    from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_clustered_diff

    scene, vrls, ray_o, ray_d, hit, tile_slice, (w0, w1) = \
        _clustered_setup()
    tri_flat = pk.pack_tris(scene)
    seed = jnp.asarray([9], jnp.int32)

    def loss(params):
        med = scene.medium.replace(
            sigma_a=params["sa"], sigma_s=params["ss"], g=params["g"])
        sc = scene.replace(medium=med)
        v2 = vrls.replace(power=vrls.power * params["pscale"])
        base = pk.pack_vrls(v2)        # (VRL_ROWS, 128)
        t0 = base.at[vp._VP:vp._VP + 3, :].multiply(w0[None, :])
        t1 = base.at[vp._VP:vp._VP + 3, :].multiply(
            w1[None, :] * params["wscale"])
        tables = jnp.stack([t0, t1])   # (2, VRL_ROWS, 128)
        ray_pack = pk.pack_rays(sc, ray_o, ray_d, hit)
        med_pack = pk.pack_medium(sc)
        out = vrl_sum_clustered_diff(
            ray_pack, tables, tile_slice, med_pack, tri_flat, seed,
            2, 1, True, 0)
        return jnp.mean(out)

    p0 = {"sa": scene.medium.sigma_a, "ss": scene.medium.sigma_s,
          "g": scene.medium.g, "pscale": jnp.float32(1.0),
          "wscale": jnp.float32(1.0)}
    with pltpu.force_tpu_interpret_mode():
        g_ad = jax.grad(loss)(p0)
        assert float(loss(p0)) > 0
        _fd_check(loss, p0, g_ad,
                  [("g", None), ("pscale", None), ("wscale", None),
                   ("sa", 0), ("ss", 1)])


def test_bwd_hetero_clustered_matches_fd():
    from alvrl_tpu.media import api as mapi
    from alvrl_tpu.ops import vrl_pallas as vp
    from alvrl_tpu.ops.vrl_pallas_bwd import (
        vrl_sum_hetero_clustered_diff,
    )

    from alvrl_tpu.integrators.vrl import vrl as vrl_mod

    scene = presets.cornell_grid_smoke(width=16, height=16, grid_res=12)
    med0 = scene.medium
    vrls = vrl_mod.compact(
        tracer.trace(scene, jax.random.key(0), 24,
                     tracer.TracerConfig(max_depth=8)),
        128, slots_per_particle=8)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(16))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)
    tri_flat = pk.pack_tris(scene)
    seed = jnp.asarray([13], jnp.int32)
    tile_slice = jnp.asarray([0, 1], jnp.int32)
    w0 = jnp.linspace(0.5, 1.5, 128, dtype=jnp.float32)
    w1 = jnp.linspace(1.2, 0.3, 128, dtype=jnp.float32)
    cp_pack, cp_err = pk.pack_cp(med0, rank=8)
    assert cp_err < 0.05

    def loss(params):
        s = params["dscale"]
        med = med0.replace(
            sigma_t_color=params["stc"], g=params["g"],
            scale=med0.scale * s)
        sc = mapi.prepare_scene(scene.replace(medium=med))
        v2 = vrls.replace(power=vrls.power * params["pscale"])
        base = pk.pack_vrls_hetero(v2, sc.medium)  # (H_VRL_ROWS, 128)
        t0 = base.at[vp._VP:vp._VP + 3, :].multiply(w0[None, :])
        t1 = base.at[vp._VP:vp._VP + 3, :].multiply(w1[None, :])
        tables = jnp.stack([t0, t1])
        ray_pack = pk.pack_rays_hetero(sc, ray_o, ray_d, hit)
        med_pack = pk.pack_medium_hetero(sc.medium)
        out = vrl_sum_hetero_clustered_diff(
            ray_pack, tables, tile_slice, med_pack, cp_pack, s,
            tri_flat, seed, 8, 2, 1, True, 0, 4)
        return jnp.mean(out)

    p0 = {"stc": med0.sigma_t_color, "g": med0.g,
          "pscale": jnp.float32(1.0), "dscale": jnp.float32(1.0)}
    with pltpu.force_tpu_interpret_mode():
        g_ad = jax.grad(loss)(p0)
        assert float(loss(p0)) > 0
        _fd_check(loss, p0, g_ad,
                  [("g", None), ("pscale", None), ("stc", 0),
                   ("dscale", None)],
                  tol=1e-2)
