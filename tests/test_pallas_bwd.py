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
        # round 5 (VERDICT r04 item 4): the 1e-2 slack was the
        # projected density-scale gradient; with the exact d_fac route
        # every check measures <= 3.6e-4 — gate at the 1e-3 BASELINE
        # bar the homogeneous kernel meets
        _fd_check(loss, p0, g_ad,
                  [("g", None), ("pscale", None), ("stc", 0),
                   ("alb", 1), ("dscale", None)],
                  tol=1e-3)


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
        # gate at 1e-3 (see the unclustered test's round-5 note)
        _fd_check(loss, p0, g_ad,
                  [("g", None), ("pscale", None), ("stc", 0),
                   ("dscale", None)],
                  tol=1e-3)


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r04 next-round item 1): per-voxel heterogeneous
# gradients through the kernel VJP. The in-kernel CP density terms
# (dens_u, dens_v, the U<->V quadrature) now return EXACT factor-table
# cotangents d_fac; ops.cp chains them to the raw voxels through the
# CP fit's implicit VJP. Three layers of evidence:
#   1. entry-level FD on the factor tables through the kernel (exact
#      function, no fit in the loop) at <= 1e-3;
#   2. the gauge invariant <d_cp, cp> == 3 * d(dens_scale) (density is
#      trilinear in the factor blocks);
#   3. voxel-level FD through the FULL refit-then-render pipeline on an
#      exactly low-rank field at <= 1e-3 (the BASELINE gradient bar).
# ---------------------------------------------------------------------------


def _hetero_fixed_inputs(scene, n_particles=24):
    vrls = tracer.trace(scene, jax.random.key(0), n_particles)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(cam.width), jnp.arange(cam.height))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)
    return vrls, ray_o, ray_d, hit, pk.pack_tris(scene)


def test_bwd_hetero_factor_cotangents_fd():
    """d_fac is the exact derivative of the kernel w.r.t. individual CP
    factor entries (FD <= 1e-3), and the trilinear gauge invariant
    <d_cp, cp_pack> = 3 * d/d(dens_scale) holds."""
    from alvrl_tpu.media import api as mapi
    from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_hetero_diff

    scene = presets.cornell_grid_smoke(width=16, height=8, grid_res=12)
    vrls, ray_o, ray_d, hit, tri_flat = _hetero_fixed_inputs(scene)
    seed = jnp.asarray([5], jnp.int32)
    cp_pack, cp_err = pk.pack_cp(scene.medium, rank=8)
    sc = mapi.prepare_scene(scene)
    ray_pack = pk.pack_rays_hetero(sc, ray_o, ray_d, hit)
    vrl_pack = pk.pack_vrls_hetero(vrls, sc.medium)
    med_pack = pk.pack_medium_hetero(sc.medium)

    def loss(cp, s):
        out = vrl_sum_hetero_diff(
            ray_pack, vrl_pack, med_pack, cp, s, tri_flat, seed,
            8, 2, 1, True, 0, 4)
        return jnp.mean(out)

    with pltpu.force_tpu_interpret_mode():
        d_cp, d_s = jax.grad(loss, argnums=(0, 1))(
            cp_pack, jnp.float32(1.0))
        d_np = np.asarray(d_cp)
        assert np.isfinite(d_np).all()
        assert np.abs(d_np).max() > 0

        # gauge invariant (density trilinear in the three blocks)
        ip = float(jnp.sum(d_cp * cp_pack))
        assert abs(ip - 3.0 * float(d_s)) / max(abs(ip), 1e-9) < 1e-4, \
            (ip, float(d_s))

        # entry FD: the largest-cotangent entry of each factor block
        errs = []
        for blk in range(3):
            sub = np.abs(d_np[blk * 8:(blk + 1) * 8])
            k, e = np.unravel_index(np.argmax(sub), sub.shape)
            r = blk * 8 + k
            eps = 2e-3 * max(abs(float(cp_pack[r, e])), 0.05)
            lp = float(loss(cp_pack.at[r, e].add(eps), jnp.float32(1.0)))
            lm = float(loss(cp_pack.at[r, e].add(-eps), jnp.float32(1.0)))
            fd = (lp - lm) / (2 * eps)
            ad = float(d_np[r, e])
            errs.append(abs(ad - fd) / max(abs(fd), 1e-9))
        assert max(errs) < 1e-3, errs


def test_bwd_hetero_pervoxel_fd():
    """Voxel-level FD through the FULL chain — refit (warm-started ALS)
    -> render — against d_total = (OD-table route via XLA AD) +
    (in-kernel route via d_fac -> ops.cp implicit fit VJP), on an
    EXACTLY rank-K density so the fit is exact and FD converges.
    (Exact rank STRICTLY BELOW K leaves near-zero spare factors: a
    rank-deficient fit point where the argmin Jacobian is genuinely
    ill-defined — both this chain and FD-through-ALS break there, and
    production fits never sit at such points.) Gate: median <= 1e-3
    over the top-gradient voxels (the BASELINE bar the homogeneous
    kernel meets; VERDICT r04 next-round items 1 and 4)."""
    import numpy as np_

    from alvrl_tpu.media import api as mapi
    from alvrl_tpu.media import heterogeneous as gmed
    from alvrl_tpu.ops import cp as cp_mod
    from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_hetero_diff

    res, K = 9, 8
    base_scene = presets.cornell_grid_smoke(width=16, height=8,
                                            grid_res=res)
    rs = np_.random.default_rng(7)
    A0 = rs.uniform(0.1, 1.0, (res, K))
    B0 = rs.uniform(0.1, 1.0, (res, K))
    C0 = rs.uniform(0.1, 1.0, (res, K))
    dens0 = (np_.einsum("zr,yr,xr->zyx", A0, B0, C0) / K
             * 1.5).astype(np_.float32)
    med0 = base_scene.medium.replace(density=jnp.asarray(dens0))
    scene = base_scene.replace(medium=med0)
    vrls, ray_o, ray_d, hit, tri_flat = _hetero_fixed_inputs(scene)
    seed = jnp.asarray([5], jnp.int32)
    nss = 2 * res - 1

    ss0 = np_.asarray(gmed._upsample2(med0.density), np_.float64)

    # seed ALS with the (upsampled) true factors: plain cold-start ALS
    # swamps at ~2e-4 on over-parameterized exact-rank targets; the
    # seeded fit reaches the f32-upsample noise floor (~3e-8)
    def _up1(v):
        out = np_.zeros(2 * len(v) - 1)
        out[::2] = v
        out[1::2] = 0.5 * (v[:-1] + v[1:])
        return out

    init = tuple(
        np_.stack([_up1(F[:, r]) for r in range(K)], 1)
        * (1.5 / K) ** (1.0 / 3.0)
        for F in (A0, B0, C0))
    A, B, C = cp_mod._als(ss0, K, iters=200, init=init)
    resid = np_.sqrt(((cp_mod.reconstruct(A, B, C) - ss0) ** 2).mean())
    resid /= np_.sqrt((ss0 ** 2).mean())
    assert resid < 1e-6, resid  # rank-2 target: the fit must be exact

    def pack_from(Af, Bf, Cf):
        out = np_.zeros((3, K, 128), np_.float32)
        out[0, :, :nss] = Af.T
        out[1, :, :nss] = Bf.T
        out[2, :, :nss] = Cf.T
        return jnp.asarray(out.reshape(3 * K, 128))

    cp0 = pack_from(A, B, C)

    def loss(density, cp):
        med = med0.replace(density=density)
        sc = mapi.prepare_scene(scene.replace(medium=med))
        ray_pack = pk.pack_rays_hetero(sc, ray_o, ray_d, hit)
        vrl_pack = pk.pack_vrls_hetero(vrls, sc.medium)
        med_pack = pk.pack_medium_hetero(sc.medium)
        out = vrl_sum_hetero_diff(
            ray_pack, vrl_pack, med_pack, cp, jnp.float32(1.0),
            tri_flat, seed, K, 2, 1, True, 0, 4)
        return jnp.mean(out)

    with pltpu.force_tpu_interpret_mode():
        d_dens_od, d_cp = jax.grad(loss, argnums=(0, 1))(
            med0.density, cp0)
        d3 = np_.asarray(d_cp).reshape(3, K, 128)
        d_ss, cg_res = cp_mod._cp_fit_vjp_dense(
            A, B, C, d3[0][:, :nss].T, d3[1][:, :nss].T,
            d3[2][:, :nss].T, cg_iters=2000, ridge_rel=1e-10)
        assert cg_res < 1e-6, cg_res
        _, up_vjp = jax.vjp(gmed._upsample2, med0.density)
        (d_dens_cp,) = up_vjp(jnp.asarray(d_ss, jnp.float32))
        d_total = np_.asarray(d_dens_od) + np_.asarray(d_dens_cp)
        assert np_.isfinite(d_total).all()

        order = np_.argsort(-np_.abs(d_total).ravel())[:6]
        errs = []
        for fi in order:
            idx = np_.unravel_index(fi, d_total.shape)
            eps = 1e-2 * max(float(dens0[idx]), 0.1)

            def ev(sgn):
                d2 = dens0.astype(np_.float64).copy()
                d2[idx] += sgn * eps
                ss2 = np_.asarray(
                    gmed._upsample2(jnp.asarray(d2, jnp.float32)),
                    np_.float64)
                # 800 warm-started iters: at 300 the FD still carries
                # ~6e-3 ALS tracking error (measured); at 800 it sits
                # at ~6e-4 against the implicit-VJP value
                A2, B2, C2 = cp_mod._als(ss2, K, iters=800,
                                         init=(A, B, C))
                return float(loss(jnp.asarray(d2, jnp.float32),
                                  pack_from(A2, B2, C2)))

            fd = (ev(1.0) - ev(-1.0)) / (2 * eps)
            ad = float(d_total[idx])
            errs.append(abs(ad - fd) / max(abs(fd), 1e-9))
        errs = np_.array(errs)
        assert np_.median(errs) < 1e-3, errs
        assert errs.max() < 3e-3, errs
