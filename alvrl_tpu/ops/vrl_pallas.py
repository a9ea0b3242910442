"""Pallas TPU kernel for the VRL x eye-ray integral — the hot path.

The jnp/XLA path (alvrl_tpu.integrators.vrl.integrate) materializes
(rays x vrls x triangles) occlusion intermediates in HBM; this kernel
tiles the pair space into (128 rays x 128 vrls) blocks that live
entirely in VMEM, loops the (SMEM-prefetched) triangle list for shadow
rays, and draws its uniforms from the on-core PRNG — zero HBM traffic
beyond the packed inputs and the (3, rays) output accumulator.

Same estimator as integrate.pair_contribution (Kulla equi-angular +
sinh/asinh inverse-distance product sampling; vol-vol + vol-surf terms;
short-VRL pdfFailure division — vrlIntegrator.cpp:603-953), written as
per-channel scalar math over (R, V) tiles.

Scope: forward rendering AND gradients. The backward pass runs as
seed-replay custom VJPs in ops/vrl_pallas_bwd.py — all four launch
variants ({homog, hetero} x {unclustered, clustered}) recompute the
forward samples from the same per-tile PRNG seeds and accumulate
cotangents in-kernel (FD-validated in tests/test_pallas_bwd.py;
measured 11x faster than XLA AD at config-4 scale,
scripts/bench_grad_hetero.py).

Triangle capacity: the occlusion list is scalar-prefetched into SMEM —
suitable for benchmark-scale meshes (T <= ~500). For larger meshes,
vrl_sum_pallas_bvh (bottom of this file) streams BVH-leaf triangle
clusters from beyond SMEM with double-buffered DMA, a register-carry
Wald sweep, and per-ray-group AABB culling (phase 2, round 4): it is
the large-mesh winner — 13.6-34.9x faster than the chunked XLA path at
4k-16k triangles and bit-exact vs the SMEM kernel at Cornell scale
(tests/test_bvh.py regression). Scaling with triangle count is
~linear in the leaf-cluster stream; see scripts/bench_bvh_large.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 128
VRL_TILE = 128

# ray_pack rows
_RO, _RD, _HP, _NG, _ALB, _VALID, _TAU = 0, 3, 6, 9, 12, 15, 16
RAY_ROWS = 24
# vrl_pack rows
_VS, _VE, _VP, _VVALID = 0, 3, 6, 9
VRL_ROWS = 16

# heterogeneous (grid-medium) variants: the packs grow cumulative
# optical-depth tables (media.heterogeneous.cumulative_od, N_TAU_STEPS
# sub-intervals -> NQ+1 entries) for the eye and VRL segments; the
# U<->V segment integrates in-kernel against CP density factors
# (ops.cp — see that module for why gathers force a separable form).
NQ = 16                      # table sub-intervals (gmed.N_TAU_STEPS)
_EOD = RAY_ROWS              # eye cum-OD rows [24, 24+NQ]
H_RAY_ROWS = 48              # 24 + 17 rounded up to a sublane multiple
_VOD = VRL_ROWS              # vrl cum-OD rows [16, 16+NQ]
H_VRL_ROWS = 40              # 16 + 17 rounded up

_INV_FOURPI = 1.0 / (4.0 * np.pi)
_H_EPS = 1e-6


def _u01(shape):
    """uint32 bits -> U[0,1) via the mantissa trick (no u32->f32 cast,
    which the Mosaic lowering lacks): set exponent to 127 -> [1,2)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _hg(g, cos_wi_wo):
    temp = jnp.maximum(1.0 + g * g + 2.0 * g * cos_wi_wo, 1e-12)
    return _INV_FOURPI * (1.0 - g * g) / (temp * jnp.sqrt(temp))


def _phase(kind: int, g, cos_wi_wo):
    """Static phase dispatch (media.phase kinds); compiled to one branch."""
    if kind == 1:  # RAYLEIGH
        return (3.0 / (16.0 * np.pi)) * (1.0 + cos_wi_wo * cos_wi_wo)
    return _hg(g, cos_wi_wo)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _asinh(x):
    """asinh via log (the TPU lowering has no asinh primitive)."""
    ax = jnp.abs(x)
    return jnp.sign(x) * jnp.log(ax + jnp.sqrt(ax * ax + 1.0))


def _sinh(x):
    ex = jnp.exp(x)
    return 0.5 * (ex - 1.0 / ex)


def _tan(x):
    return jnp.sin(x) / jnp.cos(x)


def _atan_pos(x):
    """atan for x >= 0 (no atan primitive in the Mosaic lowering):
    minimax odd polynomial on [0,1] + pi/2 - atan(1/x) reduction.
    Max abs error ~2e-7 rad."""
    big = x > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(x, 1.0), x)
    a = t * t
    p = jnp.float32(-0.0040540580636724)
    p = p * a + jnp.float32(0.0218612288252080)
    p = p * a + jnp.float32(-0.0559098861749203)
    p = p * a + jnp.float32(0.0964200441963227)
    p = p * a + jnp.float32(-0.1390853351006242)
    p = p * a + jnp.float32(0.1994653599610785)
    p = p * a + jnp.float32(-0.3332985605746843)
    p = p * a + jnp.float32(0.9999993329093277)
    r = t * p
    return jnp.where(big, jnp.float32(0.5 * np.pi) - r, r)


def _lane_gather_row(row_vec, idx):
    """Arbitrary per-lane gather from a <=128-entry 1D table: the table
    row is sublane-replicated and fetched with tpu.dynamic_gather along
    lanes (the ONE O(1) gather form Mosaic supports; axis-0 gathers
    across >8 sublanes fail with 'multiple source vregs')."""
    x = jnp.broadcast_to(row_vec[None, :], idx.shape)
    return jnp.take_along_axis(x, idx, axis=1)


def _kernel(
    tri_ref,      # scalar prefetch: (T*9,) f32 opaque triangles
    seed_ref,     # scalar prefetch: (1,) i32
    ray_ref,      # (RAY_TILE, RAY_ROWS) f32
    vrl_ref,      # (VRL_ROWS, VRL_TILE) f32 (dense) or (1, VRL_ROWS,
                  # VRL_TILE) slice-table block (clustered)
    med_ref,      # (1, 16) f32: sigma_t(3), sigma_s(3), g, msw, n_samples...
                  # hetero: (1, 32), see pack.pack_medium_hetero
    out_ref,      # (3, RAY_TILE) f32 accumulated over the vrl grid dim
    *,
    n_tris: int,
    vol_vol_samples: int,
    vol_surf_samples: int,
    short_vrls: bool,
    phase_kind: int = 0,
    clustered: bool = False,
    occl_fn=None,  # override: fn(pre, shape) -> list of blocked masks
                   # (the two-level BVH variant streams triangle
                   # clusters from HBM instead of the SMEM sweep)
    hetero: bool = False,
    cp_ref=None,   # (3*n_cp, 128) CP density factors (z, y, x blocks)
    n_cp: int = 0,
    uv_steps: int = 4,
    debug_out: str = None,  # hetero debug: write a chosen vol-vol
                            # intermediate (summed over the vrl axis)
                            # into channel 0 instead of radiance
    r_mode: bool = False,   # transfer-matrix mode: out_ref is a
                            # (2, RAY_TILE, VRL_TILE) block holding the
                            # per-pair luminance sample mean [0] and
                            # variance-of-mean [1] (the Welford outputs
                            # the clustering consumes; build_R /
                            # integrate.pair_contribution semantics,
                            # getLiLuminanceVrlContributions,
                            # vrlIntegrator.cpp:527-539)
):
    i = pl.program_id(0)
    if clustered:
        # one vrl tile per ray tile (the slice's representative set)
        j = 0
        out_ref[:, :] = jnp.zeros_like(out_ref)
        pltpu.prng_seed(seed_ref[0], i)
    else:
        j = pl.program_id(1)

        if not r_mode:
            @pl.when(j == 0)
            def _():
                out_ref[:, :] = jnp.zeros_like(out_ref)

        pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)

    def rrow(k):  # (R, 1)
        return ray_ref[:, k][:, None]

    if clustered:
        def vrow(k):  # (1, V)
            return vrl_ref[0, k, :][None, :]
    else:
        def vrow(k):  # (1, V)
            return vrl_ref[k, :][None, :]

    ox, oy, oz = rrow(_RO), rrow(_RO + 1), rrow(_RO + 2)
    dx, dy, dz = rrow(_RD), rrow(_RD + 1), rrow(_RD + 2)
    hx, hy, hz = rrow(_HP), rrow(_HP + 1), rrow(_HP + 2)
    ngx, ngy, ngz = rrow(_NG), rrow(_NG + 1), rrow(_NG + 2)
    alb = (rrow(_ALB), rrow(_ALB + 1), rrow(_ALB + 2))
    rvalid = rrow(_VALID)
    tau_eu_s = (rrow(_TAU), rrow(_TAU + 1), rrow(_TAU + 2))

    sx, sy, sz = vrow(_VS), vrow(_VS + 1), vrow(_VS + 2)
    ex, ey, ez = vrow(_VE), vrow(_VE + 1), vrow(_VE + 2)
    pw = (vrow(_VP), vrow(_VP + 1), vrow(_VP + 2))
    vvalid = vrow(_VVALID)

    sig_t = (med_ref[0, 0], med_ref[0, 1], med_ref[0, 2])
    sig_s = (med_ref[0, 3], med_ref[0, 4], med_ref[0, 5])
    g = med_ref[0, 6]
    msw = med_ref[0, 7]

    shape = (RAY_TILE, VRL_TILE)
    pair_mask = (rvalid > 0.5) & (vvalid > 0.5)

    if hetero:
        # grid-medium parameter block (pack.pack_medium_hetero):
        # sig_t rows double as sigma_t_color, sig_s as sigma_s_color;
        # 7 = chan (mean sigma_t channel), 8:11 box_min (x,y,z),
        # 11:14 1/extent, 14:17 half-cell index scales 2*(d-1) (x,y,z)
        chan = med_ref[0, 7]
        box0 = (med_ref[0, 8], med_ref[0, 9], med_ref[0, 10])
        inv_e = (med_ref[0, 11], med_ref[0, 12], med_ref[0, 13])
        isc = (med_ref[0, 14], med_ref[0, 15], med_ref[0, 16])

        def density_at(px_, py_, pz_):
            """CP density at world points (supersampled-NN indexing of
            media.heterogeneous.lookup_density_nn: half-cell rounding,
            zero outside the box). n_cp lane-gathers per axis, run as a
            fori_loop over rank (a full python unroll keeps ~100 MB of
            (128,128) temporaries live and blows scoped VMEM)."""
            qx = (px_ - box0[0]) * inv_e[0]
            qy = (py_ - box0[1]) * inv_e[1]
            qz = (pz_ - box0[2]) * inv_e[2]
            inside = (
                (qx >= 0.0) & (qx <= 1.0) & (qy >= 0.0) & (qy <= 1.0)
                & (qz >= 0.0) & (qz <= 1.0)
            )
            ix = jnp.clip(jnp.floor(qx * isc[0] + 0.5), 0.0, isc[0]
                          ).astype(jnp.int32)
            iy = jnp.clip(jnp.floor(qy * isc[1] + 0.5), 0.0, isc[1]
                          ).astype(jnp.int32)
            iz = jnp.clip(jnp.floor(qz * isc[2] + 0.5), 0.0, isc[2]
                          ).astype(jnp.int32)

            def one(k, acc_d):
                az = _lane_gather_row(cp_ref[k, :], iz)
                ay = _lane_gather_row(cp_ref[n_cp + k, :], iy)
                ax = _lane_gather_row(cp_ref[2 * n_cp + k, :], ix)
                return acc_d + az * ay * ax

            unroll = 4
            assert n_cp % unroll == 0, n_cp

            def body(q, acc_d):
                k0 = q * unroll
                for dk in range(unroll):
                    acc_d = one(k0 + dk, acc_d)
                return acc_d

            acc_d = jax.lax.fori_loop(
                0, n_cp // unroll, body, jnp.zeros(ix.shape, jnp.float32))
            return jnp.where(inside, jnp.maximum(acc_d, 0.0), 0.0)

        # cumulative-OD table interpolation (gmed.interp_od semantics)
        eod = ray_ref[:, _EOD:_EOD + NQ + 1]           # (R, NQ+1)
        eod_pad = jnp.concatenate(
            [eod, jnp.zeros((RAY_TILE, VRL_TILE - (NQ + 1)), jnp.float32)],
            axis=1,
        )

        def interp_eye(frac):
            t = jnp.clip(frac, 0.0, 1.0) * NQ
            k0f = jnp.clip(jnp.floor(t), 0.0, NQ - 1.0)
            w = t - k0f
            k0 = k0f.astype(jnp.int32)
            c0 = jnp.take_along_axis(eod_pad, k0, axis=1)
            c1 = jnp.take_along_axis(eod_pad, k0 + 1, axis=1)
            return c0 * (1.0 - w) + c1 * w

        if clustered:
            vod = vrl_ref[0, _VOD:_VOD + NQ + 1, :]    # (NQ+1, V)
        else:
            vod = vrl_ref[_VOD:_VOD + NQ + 1, :]
        vod_t = jnp.concatenate(
            [vod.T, jnp.zeros((VRL_TILE, RAY_TILE - (NQ + 1)), jnp.float32)],
            axis=1,
        )  # (V, 128): per-vrl table along lanes

        def interp_vrl(frac):
            # per-(ray, vrl) entry from a per-VRL table: axis-0 gathers
            # across sublanes are unsupported, so gather transposed
            t = jnp.clip(frac, 0.0, 1.0) * NQ
            k0f = jnp.clip(jnp.floor(t), 0.0, NQ - 1.0)
            w = t - k0f
            k0t = k0f.astype(jnp.int32).T                 # (V, R)
            c0 = jnp.take_along_axis(vod_t, k0t, axis=1).T
            c1 = jnp.take_along_axis(vod_t, k0t + 1, axis=1).T
            return c0 * (1.0 - w) + c1 * w

        def od_between(p_a, p_b, d_ab):
            """Midpoint quadrature of CP density along [p_a, p_b]
            (the per-sample U<->V segment; integrate.py uv_tau_steps)."""
            total = jnp.zeros(d_ab.shape, jnp.float32)
            for s_i in range(uv_steps):
                tq = (s_i + 0.5) / uv_steps
                total = total + density_at(
                    p_a[0] + tq * (p_b[0] - p_a[0]),
                    p_a[1] + tq * (p_b[1] - p_a[1]),
                    p_a[2] + tq * (p_b[2] - p_a[2]),
                )
            return total * (d_ab / uv_steps)

    # vrl direction + length
    vdx, vdy, vdz = ex - sx, ey - sy, ez - sz
    vlen = jnp.sqrt(jnp.maximum(vdx * vdx + vdy * vdy + vdz * vdz, 1e-30))
    ivl = 1.0 / vlen
    ux_v, uy_v, uz_v = vdx * ivl, vdy * ivl, vdz * ivl  # unit vrl dir
    # eye segment length
    ex_e, ey_e, ez_e = hx - ox, hy - oy, hz - oz
    elen = jnp.sqrt(jnp.maximum(ex_e * ex_e + ey_e * ey_e + ez_e * ez_e, 1e-30))

    def seg_seg_closest():
        """Closest point parameter tc on the VRL segment to the eye
        segment (branchless clamped segment-segment)."""
        ax_, ay_, az_ = ex_e, ey_e, ez_e            # u = eye vec
        bx_, by_, bz_ = vdx, vdy, vdz               # v = vrl vec
        wx, wy, wz = ox - sx, oy - sy, oz - sz
        a = _dot3(ax_, ay_, az_, ax_, ay_, az_)
        b = _dot3(ax_, ay_, az_, bx_, by_, bz_)
        c = _dot3(bx_, by_, bz_, bx_, by_, bz_)
        d = _dot3(ax_, ay_, az_, wx, wy, wz)
        e = _dot3(bx_, by_, bz_, wx, wy, wz)
        denom = a * c - b * b
        par = denom < 1e-9 * a * c + 1e-30
        s_n = jnp.where(par, 0.0, b * e - c * d)
        s_d = jnp.where(par, 1.0, denom)
        t_n = jnp.where(par, e, a * e - b * d)
        t_d = jnp.where(par, c, denom)
        below = s_n < 0.0
        above = s_n > s_d
        t_n = jnp.where(below, e, jnp.where(above, e + b, t_n))
        t_d = jnp.where(below | above, c, t_d)
        s_n = jnp.where(below, 0.0, jnp.where(above, s_d, s_n))
        t_below = t_n < 0.0
        t_above = t_n > t_d
        s_lo = jnp.clip(-d, 0.0, a)
        s_hi = jnp.clip(-d + b, 0.0, a)
        s_n = jnp.where(t_below, s_lo, jnp.where(t_above, s_hi, s_n))
        s_d = jnp.where(t_below | t_above, jnp.maximum(a, 1e-30), s_d)
        t_n = jnp.where(t_below, 0.0, jnp.where(t_above, t_d, t_n))
        sc = s_n / jnp.maximum(s_d, 1e-30)
        tc = t_n / jnp.maximum(t_d, 1e-30)
        # distance between the closest points
        px = ox + sc * ax_ - (sx + tc * bx_)
        py = oy + sc * ay_ - (sy + tc * by_)
        pz = oz + sc * az_ - (sz + tc * bz_)
        h = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 0.0))
        return tc, h

    tc_close, h_close = seg_seg_closest()

    cos_theta = _dot3(dx, dy, dz, ux_v, uy_v, uz_v)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    near_par = sin_theta < 1e-4
    sin_safe = jnp.maximum(sin_theta, 1e-4)
    h = jnp.maximum(h_close, _H_EPS)

    # arc position of closest point on the vrl: tc_close * vlen
    arc_h = tc_close * vlen
    v0c = -arc_h
    v1c = vlen - arc_h
    a0 = _asinh(v0c / h * sin_safe)
    a1 = _asinh(v1c / h * sin_safe)

    def sample_v(u):
        """V on the VRL ~ inverse distance; returns (arc, pdf)."""
        new_v = h * _sinh(a0 + u * (a1 - a0)) / sin_safe
        inv_dist = jax.lax.rsqrt(
            jnp.maximum(h * h + new_v * new_v * sin_safe * sin_safe, 1e-30)
        )
        denom = jnp.maximum((a1 - a0) / sin_safe, 1e-30)
        arc = new_v + arc_h
        pdf_k = inv_dist / denom
        arc_u = u * vlen
        pdf_u = ivl
        return (
            jnp.where(near_par, arc_u, arc),
            jnp.where(near_par, pdf_u, pdf_k),
        )

    def kulla_u(vx_, vy_, vz_, u):
        """U on the eye segment ~ equi-angular around point V."""
        dot_pr = _dot3(dx, dy, dz, vx_ - ox, vy_ - oy, vz_ - oz)
        ix_ = ox + dot_pr * dx
        iy_ = oy + dot_pr * dy
        iz_ = oz + dot_pr * dz
        ddx, ddy, ddz = vx_ - ix_, vy_ - iy_, vz_ - iz_
        dis = jnp.maximum(
            jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz), _H_EPS
        )
        dist_ai = jnp.abs(dot_pr)
        dist_ib = jnp.abs(elen - dot_pr)
        angle_a = _atan_pos(dist_ai / dis)
        angle_b = _atan_pos(dist_ib / dis)
        pos = dot_pr > 0
        angle_a = jnp.where(pos, -angle_a, angle_a)
        angle_b = jnp.where(pos & (dist_ai > elen), -angle_b, angle_b)
        t = dis * _tan((1.0 - u) * angle_a + u * angle_b)
        span = angle_b - angle_a
        pdf = jnp.where(
            jnp.abs(span) > 1e-12,
            dis / jnp.maximum(span * (dis * dis + t * t), 1e-30),
            0.0,
        )
        arc = dot_pr + t
        return arc, pdf

    def occluded_multi(segments):
        """One triangle sweep testing every sample segment: each loop
        iteration loads a triangle's 9 scalars once and intersects all
        (p -> q) segments (amortizes SMEM loads + loop overhead over
        volVol+volSurf samples). segments: list of (p, q) point tuples;
        returns list of blocked masks."""
        pre = []
        for (px_, py_, pz_), (qx_, qy_, qz_) in segments:
            ddx, ddy, ddz = qx_ - px_, qy_ - py_, qz_ - pz_
            idist = jax.lax.rsqrt(
                jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-30))
            dist = (ddx * ddx + ddy * ddy + ddz * ddz) * idist
            ux, uy, uz = ddx * idist, ddy * idist, ddz * idist
            lo = 1e-3 * jnp.maximum(dist, 1.0)
            hi = dist - lo
            pre.append((px_, py_, pz_, ux, uy, uz, lo, hi))

        if occl_fn is not None:
            return occl_fn(segments, pre, shape)

        def body(t, blocked):
            base = t * 9
            p0x = tri_ref[base + 0]
            p0y = tri_ref[base + 1]
            p0z = tri_ref[base + 2]
            e1x = tri_ref[base + 3]
            e1y = tri_ref[base + 4]
            e1z = tri_ref[base + 5]
            e2x = tri_ref[base + 6]
            e2y = tri_ref[base + 7]
            e2z = tri_ref[base + 8]
            out = []
            for k, (px_, py_, pz_, ux, uy, uz, lo, hi) in enumerate(pre):
                pvx = uy * e2z - uz * e2y
                pvy = uz * e2x - ux * e2z
                pvz = ux * e2y - uy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                # division-free Wald test: compare det-scaled
                # barycentrics against |det| (one sign flip replaces
                # the per-triangle reciprocal — divisions dominate the
                # VPU cost of this sweep)
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                adet = det * sgn
                tvx, tvy, tvz = px_ - p0x, py_ - p0y, pz_ - p0z
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * sgn
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (ux * qvx + uy * qvy + uz * qvz) * sgn
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * sgn
                # min-margin form of the acceptance test: hit iff every
                # slack is positive (fewer VPU ops than the 6-compare
                # + 5-and chain)
                mn = jnp.minimum(uu, vv)
                mn = jnp.minimum(mn, adet - (uu + vv))
                mn = jnp.minimum(mn, tt - lo * adet)
                mn = jnp.minimum(mn, hi * adet - tt)
                mn = jnp.minimum(mn, adet - 1e-12)
                # f32 carry: scf.for cannot legalize vector<i1> state
                out.append(jnp.where(mn > 0.0, 1.0, blocked[k]))
            return tuple(out)

        init = tuple(jnp.zeros(shape, jnp.float32) for _ in segments)
        # unroll x4: amortizes the scf.for carry and pipelines the SMEM
        # scalar loads without exceeding scoped VMEM (a full unroll
        # keeps too many tiles live)
        unroll = 4
        n_main = (n_tris // unroll) * unroll

        def body4(q, blocked):
            t0 = q * unroll
            for dt in range(unroll):
                blocked = body(t0 + dt, blocked)
            return blocked

        blocked = jax.lax.fori_loop(0, n_main // unroll, body4, init)
        for t in range(n_main, n_tris):
            blocked = body(t, blocked)
        return [b > 0.5 for b in blocked]

    acc = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    # r_mode: per-family luminance sums / sums of squares for the
    # sample mean + variance-of-mean (Rec.709 weights, spectrum._LUM)
    lum_s = {"vv": jnp.zeros(shape, jnp.float32),
             "vs": jnp.zeros(shape, jnp.float32)}
    lum_q = {"vv": jnp.zeros(shape, jnp.float32),
             "vs": jnp.zeros(shape, jnp.float32)}

    def _emit(t3, family):
        """Fold one sample's 3-channel term into the accumulators.
        t3 carries the RAW per-sample term (no 1/samples factor)."""
        if r_mode:
            lum = (jnp.float32(0.212671) * t3[0]
                   + jnp.float32(0.715160) * t3[1]
                   + jnp.float32(0.072169) * t3[2])
            lum_s[family] += lum
            lum_q[family] += lum * lum
        else:
            inv = 1.0 / (vol_vol_samples if family == "vv"
                         else vol_surf_samples)
            for ch in range(3):
                acc[ch] += t3[ch] * inv

    # ---------------- sample generation ------------------------------
    vv_samples = []
    for _ in range(vol_vol_samples):
        u1 = _u01(shape)
        u2 = _u01(shape)
        arc_v, pdf_v = sample_v(u1)
        vx_ = sx + arc_v * ux_v
        vy_ = sy + arc_v * uy_v
        vz_ = sz + arc_v * uz_v
        arc_u, pdf_u = kulla_u(vx_, vy_, vz_, u2)
        ux_p = ox + arc_u * dx
        uy_p = oy + arc_u * dy
        uz_p = oz + arc_u * dz
        vv_samples.append(
            dict(arc_u=arc_u, arc_v=arc_v, pdf=pdf_v * pdf_u,
                 u=(ux_p, uy_p, uz_p), v=(vx_, vy_, vz_))
        )

    alb_any = (alb[0] + alb[1] + alb[2]) > 0.0
    vs_samples = []
    for _ in range(vol_surf_samples):
        u1 = _u01(shape)
        # Kulla sampling of V on the vrl w.r.t. the surface point
        dot_pr = _dot3(ux_v, uy_v, uz_v, hx - sx, hy - sy, hz - sz)
        ix_ = sx + dot_pr * ux_v
        iy_ = sy + dot_pr * uy_v
        iz_ = sz + dot_pr * uz_v
        ddx, ddy, ddz = hx - ix_, hy - iy_, hz - iz_
        dis = jnp.maximum(jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz), _H_EPS)
        dist_ai = jnp.abs(dot_pr)
        dist_ib = jnp.abs(vlen - dot_pr)
        angle_a = _atan_pos(dist_ai / dis)
        angle_b = _atan_pos(dist_ib / dis)
        pos = dot_pr > 0
        angle_a = jnp.where(pos, -angle_a, angle_a)
        angle_b = jnp.where(pos & (dist_ai > vlen), -angle_b, angle_b)
        t = dis * _tan((1.0 - u1) * angle_a + u1 * angle_b)
        span = angle_b - angle_a
        pdf_v = jnp.where(
            jnp.abs(span) > 1e-12,
            dis / jnp.maximum(span * (dis * dis + t * t), 1e-30),
            0.0,
        )
        arc_v = dot_pr + t
        vx_ = sx + arc_v * ux_v
        vy_ = sy + arc_v * uy_v
        vz_ = sz + arc_v * uz_v
        vs_samples.append(
            dict(arc_v=arc_v, pdf=pdf_v, v=(vx_, vy_, vz_))
        )

    # ---------------- one occlusion sweep for all samples ------------
    segments = [(smp["u"], smp["v"]) for smp in vv_samples]
    segments += [((hx, hy, hz), smp["v"]) for smp in vs_samples]
    blocked_all = occluded_multi(segments)

    # ---------------- vol-vol integrand ------------------------------
    for k, smp in enumerate(vv_samples):
        ux_p, uy_p, uz_p = smp["u"]
        vx_, vy_, vz_ = smp["v"]
        arc_u, arc_v, pdf = smp["arc_u"], smp["arc_v"], smp["pdf"]
        blocked = blocked_all[k]

        dxuv, dyuv, dzuv = ux_p - vx_, uy_p - vy_, uz_p - vz_
        d_uv2 = dxuv * dxuv + dyuv * dyuv + dzuv * dzuv
        d_uv = jnp.sqrt(jnp.maximum(d_uv2, 1e-30))
        i_uv = 1.0 / d_uv
        vux, vuy, vuz = dxuv * i_uv, dyuv * i_uv, dzuv * i_uv

        d_eu = jnp.abs(arc_u)
        d_sv = jnp.abs(arc_v)
        ok = pair_mask & ~blocked & (d_uv2 > 0.0) & (pdf > 0.0)
        # rho_U(-VU, -EU): cos(wi, wo) = dot(-vu, -d) = +vu.d — matches
        # the oracle-validated XLA integrand (integrate.py:300; a
        # round-3 SIGN FIX: the old -vu.d was invisible at g=0 but
        # wrong for anisotropic phases)
        ph_u = _phase(phase_kind, g, _dot3(vux, vuy, vuz, dx, dy, dz))
        ph_v = _phase(phase_kind, g, -_dot3(ux_v, uy_v, uz_v, vux, vuy, vuz))
        geo = jnp.where(
            ok, ph_u * ph_v / jnp.maximum(pdf * d_uv2, 1e-30), 0.0
        )
        if hetero:
            od_eu = interp_eye(d_eu / jnp.maximum(elen, 1e-20))
            od_sv = interp_vrl(jnp.clip(arc_v * ivl, 0.0, 1.0))
            od_uv = od_between(
                (ux_p, uy_p, uz_p), (vx_, vy_, vz_), d_uv)
            dens_u = density_at(ux_p, uy_p, uz_p)
            dens_v = density_at(vx_, vy_, vz_)
            if debug_out is not None:
                dbg = dict(
                    od_eu=od_eu, od_sv=od_sv, od_uv=od_uv,
                    dens_u=dens_u, dens_v=dens_v,
                    frac_u=d_eu / jnp.maximum(elen, 1e-20),
                    arc_u=arc_u, arc_v=arc_v, geo=geo,
                )[debug_out]
                acc[0] += jnp.where(pair_mask, dbg, 0.0)
                continue
            if short_vrls:
                # grid media: pdfFailure = exp(-chan * od(S->V)), no
                # sampling-weight mixture (heterogeneous.cpp eval)
                geo = geo / jnp.maximum(jnp.exp(-chan * od_sv), 1e-30)
            od_all = od_eu + od_uv + od_sv
            _emit([
                pw[ch] * (sig_s[ch] * dens_v) * (sig_s[ch] * dens_u)
                * jnp.exp(-sig_t[ch] * od_all) * geo
                for ch in range(3)
            ], "vv")
        else:
            # pdfFailure of the vrl segment (balance strategy, 3 channels)
            if short_vrls:
                pf = (
                    jnp.exp(-sig_t[0] * d_sv)
                    + jnp.exp(-sig_t[1] * d_sv)
                    + jnp.exp(-sig_t[2] * d_sv)
                ) * (1.0 / 3.0)
                pf = msw * pf + (1.0 - msw)
                geo = geo / jnp.maximum(pf, 1e-30)
            _emit([
                pw[ch] * sig_s[ch] * sig_s[ch]
                * jnp.exp(-sig_t[ch] * (d_eu + d_uv + d_sv)) * geo
                for ch in range(3)
            ], "vv")

    # ---------------- vol-surf integrand -----------------------------
    for k, smp in enumerate(vs_samples):
        vx_, vy_, vz_ = smp["v"]
        arc_v, pdf_v = smp["arc_v"], smp["pdf"]
        blocked = blocked_all[vol_vol_samples + k]

        dxuv, dyuv, dzuv = hx - vx_, hy - vy_, hz - vz_
        d_uv2 = dxuv * dxuv + dyuv * dyuv + dzuv * dzuv
        d_uv = jnp.sqrt(jnp.maximum(d_uv2, 1e-30))
        i_uv = 1.0 / d_uv
        vux, vuy, vuz = dxuv * i_uv, dyuv * i_uv, dzuv * i_uv
        d_sv = jnp.abs(arc_v)

        cos_o = jnp.maximum(
            _dot3(ngx, ngy, ngz, -vux, -vuy, -vuz), 0.0
        )
        ok = pair_mask & alb_any & ~blocked & (d_uv2 > 0.0) & (pdf_v > 0.0)
        ph_v = _phase(phase_kind, g, -_dot3(ux_v, uy_v, uz_v, vux, vuy, vuz))
        geo = jnp.where(
            ok,
            ph_v * cos_o * (1.0 / np.pi) / jnp.maximum(pdf_v * d_uv2, 1e-30),
            0.0,
        )
        if hetero:
            od_sv = interp_vrl(jnp.clip(arc_v * ivl, 0.0, 1.0))
            od_uv = od_between((hx, hy, hz), (vx_, vy_, vz_), d_uv)
            dens_v = density_at(vx_, vy_, vz_)
            if short_vrls:
                geo = geo / jnp.maximum(jnp.exp(-chan * od_sv), 1e-30)
            od_all = od_uv + od_sv
            _emit([
                pw[ch] * (sig_s[ch] * dens_v) * alb[ch]
                * tau_eu_s[ch] * jnp.exp(-sig_t[ch] * od_all) * geo
                for ch in range(3)
            ], "vs")
        else:
            if short_vrls:
                pf = (
                    jnp.exp(-sig_t[0] * d_sv)
                    + jnp.exp(-sig_t[1] * d_sv)
                    + jnp.exp(-sig_t[2] * d_sv)
                ) * (1.0 / 3.0)
                pf = msw * pf + (1.0 - msw)
                geo = geo / jnp.maximum(pf, 1e-30)
            _emit([
                pw[ch] * sig_s[ch] * alb[ch] * tau_eu_s[ch]
                * jnp.exp(-sig_t[ch] * (d_uv + d_sv)) * geo
                for ch in range(3)
            ], "vs")

    if r_mode:
        # sample mean + variance-of-mean per family, summed
        # (pair_contribution semantics)
        mean = jnp.zeros(shape, jnp.float32)
        var = jnp.zeros(shape, jnp.float32)
        for family, s_n in (("vv", vol_vol_samples),
                            ("vs", vol_surf_samples)):
            if s_n == 0:
                continue
            mu = lum_s[family] / s_n
            mean += mu
            if s_n > 1:
                # sum (x - mu)^2 = sum x^2 - n mu^2; clamp the
                # cancellation residue
                ssq = jnp.maximum(lum_q[family] - s_n * mu * mu, 0.0)
                var += ssq / (s_n - 1) / s_n
        out_ref[0, :, :] = mean
        out_ref[1, :, :] = var
        return

    for ch in range(3):
        out_ref[ch, :] += jnp.sum(acc[ch], axis=1)


@partial(
    jax.jit,
    static_argnames=("vol_vol_samples", "vol_surf_samples", "short_vrls",
                     "phase_kind"),
)
def vrl_sum_pallas(
    ray_pack,     # (B, RAY_ROWS) f32, B % 128 == 0
    vrl_pack,     # (VRL_ROWS, N) f32, N % 128 == 0
    tri_flat,     # (T*9,) f32: p0, e1, e2 per opaque triangle
    med_pack,     # (1, 16) f32
    seed,         # (1,) i32
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
):
    """Returns (3, B) per-ray VRL sums (not particle-normalized)."""
    b = ray_pack.shape[0]
    n = vrl_pack.shape[1]
    n_tris = tri_flat.shape[0] // 9
    grid = (b // RAY_TILE, n // VRL_TILE)

    kernel = partial(
        _kernel,
        n_tris=n_tris,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls,
        phase_kind=phase_kind,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RAY_TILE, RAY_ROWS), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (VRL_ROWS, VRL_TILE), lambda i, j, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 16), lambda i, j, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (3, RAY_TILE), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((3, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(tri_flat, seed, ray_pack, vrl_pack, med_pack)


@partial(
    jax.jit,
    static_argnames=("vol_vol_samples", "vol_surf_samples", "short_vrls",
                     "phase_kind"),
)
def vrl_sum_pallas_clustered(
    ray_pack,     # (B, RAY_ROWS) f32, B % 128 == 0, rays grouped by slice
    vrl_tables,   # (S, VRL_ROWS, VRL_TILE) f32 per-slice representative
                  # tables; representative weights pre-multiplied into
                  # the power rows (weights enter linearly)
    tile_slice,   # (B // RAY_TILE,) i32: slice table row per ray tile
    tri_flat,     # (T*9,) f32
    med_pack,     # (1, 16) f32
    seed,         # (1,) i32
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
):
    """Clustered VRL gather: each 128-ray tile integrates against its
    slice's (<= 128) representative VRLs, DMA'd by the scalar-prefetched
    tile -> slice map (getClusteredVrlContributions as a gather-DMA
    Pallas kernel). Returns (3, B) sums (not particle-normalized)."""
    b = ray_pack.shape[0]
    n_tris = tri_flat.shape[0] // 9
    grid = (b // RAY_TILE,)

    def kernel(tri_ref, seed_ref, tslice_ref, ray_ref, vrl_ref, med_ref,
               out_ref):
        # tslice_ref is consumed by the index_map only
        _kernel(
            tri_ref, seed_ref, ray_ref, vrl_ref, med_ref, out_ref,
            n_tris=n_tris,
            vol_vol_samples=vol_vol_samples,
            vol_surf_samples=vol_surf_samples,
            short_vrls=short_vrls,
            phase_kind=phase_kind,
            clustered=True,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RAY_TILE, RAY_ROWS), lambda i, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, VRL_ROWS, VRL_TILE),
                    lambda i, tri, seed, tslice: (tslice[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 16), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (3, RAY_TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((3, b), jnp.float32),
    )(tri_flat, seed, tile_slice, ray_pack, vrl_tables, med_pack)


# ---------------------------------------------------------------------------
# Heterogeneous (grid-medium) variants: same estimator as the XLA
# table path (integrate.pair_contribution with eye_od/vrl_od tables),
# with the U<->V quadrature + sigma_s lookups evaluated in-kernel
# against CP density factors (ops.cp). Counterpart of the reference's
# heterogeneous medium evaluation inside integrateVRL
# (src/medium/heterogeneous.cpp:546-663 called from
# vrlIntegrator.cpp:603-785).
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("n_cp", "vol_vol_samples", "vol_surf_samples",
                     "short_vrls", "phase_kind", "uv_steps", "debug_out"),
)
def vrl_sum_pallas_hetero(
    ray_pack,     # (B, H_RAY_ROWS) f32 (incl. eye cum-OD rows)
    vrl_pack,     # (H_VRL_ROWS, N) f32 (incl. vrl cum-OD rows)
    tri_flat,     # (T*9,) f32
    med_pack,     # (1, 32) f32 (pack_medium_hetero)
    cp_pack,      # (3*n_cp, 128) f32 CP density factors
    seed,         # (1,) i32
    n_cp: int,
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
    uv_steps: int = 4,
    debug_out: str = None,
):
    """Grid-medium unclustered VRL sums: (3, B), not particle-normalized."""
    b = ray_pack.shape[0]
    n = vrl_pack.shape[1]
    n_tris = tri_flat.shape[0] // 9
    grid = (b // RAY_TILE, n // VRL_TILE)

    def kernel(tri_ref, seed_ref, ray_ref, vrl_ref, med_ref, cp_ref,
               out_ref):
        _kernel(
            tri_ref, seed_ref, ray_ref, vrl_ref, med_ref, out_ref,
            n_tris=n_tris,
            vol_vol_samples=vol_vol_samples,
            vol_surf_samples=vol_surf_samples,
            short_vrls=short_vrls,
            phase_kind=phase_kind,
            hetero=True, cp_ref=cp_ref, n_cp=n_cp, uv_steps=uv_steps,
            debug_out=debug_out,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RAY_TILE, H_RAY_ROWS), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (H_VRL_ROWS, VRL_TILE), lambda i, j, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 32), lambda i, j, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (cp_pack.shape[0], 128), lambda i, j, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (3, RAY_TILE), lambda i, j, *_: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((3, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(tri_flat, seed, ray_pack, vrl_pack, med_pack, cp_pack)


@partial(
    jax.jit,
    static_argnames=("n_cp", "vol_vol_samples", "vol_surf_samples",
                     "short_vrls", "phase_kind", "uv_steps"),
)
def vrl_sum_pallas_hetero_clustered(
    ray_pack,     # (B, H_RAY_ROWS) f32, rays grouped by slice
    vrl_tables,   # (S, H_VRL_ROWS, VRL_TILE) f32 per-slice tables
    tile_slice,   # (B // RAY_TILE,) i32
    tri_flat,     # (T*9,) f32
    med_pack,     # (1, 32) f32
    cp_pack,      # (3*n_cp, 128) f32
    seed,         # (1,) i32
    n_cp: int,
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
    uv_steps: int = 4,
):
    """Clustered grid-medium render: per-tile slice tables DMA'd by the
    prefetched tile->slice map (the hetero twin of
    vrl_sum_pallas_clustered). Returns (3, B) sums."""
    b = ray_pack.shape[0]
    n_tris = tri_flat.shape[0] // 9
    grid = (b // RAY_TILE,)

    def kernel(tri_ref, seed_ref, tslice_ref, ray_ref, vrl_ref, med_ref,
               cp_ref, out_ref):
        _kernel(
            tri_ref, seed_ref, ray_ref, vrl_ref, med_ref, out_ref,
            n_tris=n_tris,
            vol_vol_samples=vol_vol_samples,
            vol_surf_samples=vol_surf_samples,
            short_vrls=short_vrls,
            phase_kind=phase_kind,
            clustered=True,
            hetero=True, cp_ref=cp_ref, n_cp=n_cp, uv_steps=uv_steps,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RAY_TILE, H_RAY_ROWS), lambda i, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, H_VRL_ROWS, VRL_TILE),
                    lambda i, tri, seed, tslice: (tslice[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 32), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (cp_pack.shape[0], 128), lambda i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (3, RAY_TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((3, b), jnp.float32),
    )(tri_flat, seed, tile_slice, ray_pack, vrl_tables, med_pack, cp_pack)


# ---------------------------------------------------------------------------
# Transfer-matrix (R) mode: the same pair estimator emitting per-pair
# luminance mean + variance-of-mean instead of the per-ray radiance sum
# (VERDICT r03 next-round item 4: the R build previously ran through
# the XLA pair_contribution at AD-graph speed and dominated the
# clustered pass at large VRL counts). Counterpart of the reference's
# Rbuilder threads (vrlIntegrator.cpp:1038-1083 over
# getLiLuminanceVrlContributions :527-539).
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("vol_vol_samples", "vol_surf_samples", "short_vrls",
                     "phase_kind"),
)
def vrl_r_pallas(
    ray_pack,     # (P, RAY_ROWS) f32 representative rays, P % 128 == 0
    vrl_pack,     # (VRL_ROWS, N) f32
    tri_flat,     # (T*9,) f32
    med_pack,     # (1, 16) f32
    seed,         # (1,) i32
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
):
    """Returns (2, P, N): per-pair luminance [mean, var-of-mean], not
    particle-normalized."""
    b = ray_pack.shape[0]
    n = vrl_pack.shape[1]
    n_tris = tri_flat.shape[0] // 9
    grid = (b // RAY_TILE, n // VRL_TILE)

    kernel = partial(
        _kernel,
        n_tris=n_tris,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls,
        phase_kind=phase_kind,
        r_mode=True,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RAY_TILE, RAY_ROWS), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (VRL_ROWS, VRL_TILE), lambda i, j, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 16), lambda i, j, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, RAY_TILE, VRL_TILE), lambda i, j, *_: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((2, b, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(tri_flat, seed, ray_pack, vrl_pack, med_pack)


@partial(
    jax.jit,
    static_argnames=("n_cp", "vol_vol_samples", "vol_surf_samples",
                     "short_vrls", "phase_kind", "uv_steps"),
)
def vrl_r_pallas_hetero(
    ray_pack,     # (P, H_RAY_ROWS) f32
    vrl_pack,     # (H_VRL_ROWS, N) f32
    tri_flat,     # (T*9,) f32
    med_pack,     # (1, 32) f32
    cp_pack,      # (3*n_cp, 128) f32
    seed,         # (1,) i32
    n_cp: int,
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
    uv_steps: int = 4,
):
    """Grid-medium R build: (2, P, N) per-pair luminance
    [mean, var-of-mean]."""
    b = ray_pack.shape[0]
    n = vrl_pack.shape[1]
    n_tris = tri_flat.shape[0] // 9
    grid = (b // RAY_TILE, n // VRL_TILE)

    def kernel(tri_ref, seed_ref, ray_ref, vrl_ref, med_ref, cp_ref,
               out_ref):
        _kernel(
            tri_ref, seed_ref, ray_ref, vrl_ref, med_ref, out_ref,
            n_tris=n_tris,
            vol_vol_samples=vol_vol_samples,
            vol_surf_samples=vol_surf_samples,
            short_vrls=short_vrls,
            phase_kind=phase_kind,
            hetero=True, cp_ref=cp_ref, n_cp=n_cp, uv_steps=uv_steps,
            r_mode=True,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RAY_TILE, H_RAY_ROWS), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (H_VRL_ROWS, VRL_TILE), lambda i, j, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 32), lambda i, j, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (cp_pack.shape[0], 128), lambda i, j, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, RAY_TILE, VRL_TILE), lambda i, j, *_: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((2, b, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(tri_flat, seed, ray_pack, vrl_pack, med_pack, cp_pack)


# ---------------------------------------------------------------------------
# Two-level occlusion: BVH-leaf triangle clusters streamed from HBM.
#
# The SMEM sweep above caps at ~500 triangles (scalar-prefetch budget).
# For larger meshes, triangles are grouped into K-triangle clusters
# (the native builder's BVH leaves), the per-cluster AABBs are scalar-
# prefetched, and each kernel invocation: (1) reduces its sample
# segments to one union AABB, (2) walks the cluster list with a SCALAR
# AABB-overlap test, (3) only for overlapping clusters DMAs the K-
# triangle block HBM -> SMEM and runs the same Wald sweep. Spatially
# sorting the VRL buffer (Morton order, see sort_vrls_morton) keeps
# each tile's union AABB tight so most clusters are culled.
# ---------------------------------------------------------------------------

K_CLUSTER = 64               # triangles per cluster block
# each cluster's 64*9=576 floats are stored as an (8, 128) row-block —
# slices of 8 rows match the VMEM (8, 128) tiling, which the per-
# cluster DMA requires
_CL_ROWS, _CL_COLS = 8, 128


N_RAY_GROUPS = 8  # per-segment-group culling granularity (16-ray rows)


def _occl_bvh(clb_ref, sclb_ref, n_clusters, tri_hbm, tri_scr,
              blocked_scr, sem):
    """Occlusion builder for the two-level kernel (see _kernel).

    Round-4 phase 2 (VERDICT r03 item 5):
    * blocked masks accumulate in LOOP-CARRY REGISTERS instead of the
      blocked_scr VMEM scratch — the round-2 version paid a VMEM
      read-modify-write per (triangle x segment), which dominated the
      24x loss to the chunked XLA sweep at 4k triangles;
    * per-segment-GROUP culling: the ray tile splits into N_RAY_GROUPS
      sublane groups with their own segment AABBs; a cluster runs only
      if it overlaps ANY group box — strictly tighter than the old
      whole-tile union (clusters sitting in the gaps between ray
      groups are now culled).
    Round-5 phase 3 (VERDICT r04 item 3) — the HIERARCHY level: the
    walk now iterates SUPER-clusters (SUPER_M leaves each, union
    AABBs scalar-prefetched in sclb_ref) and descends — including the
    leaf DMAs — only into supers that overlap a ray-group box. The
    round-4 walk DMA'd every leaf cluster unconditionally, which made
    the pass linear in triangle count regardless of culling; with the
    super level both the DMA traffic and the per-leaf AABB tests scale
    with the number of INTERSECTED subtrees.
    Double-buffering: within a descended super, leaf c+1's block is
    DMA'd while leaf c is processed (the first leaf of each super pays
    one ~us DMA latency)."""

    def fn(segments, pre, shape):
        n_seg = len(segments)
        rows_per = shape[0] // N_RAY_GROUPS
        # per-ray-group AABBs over all sample segments (a segment is
        # contained in AABB(p, q); reduce per sublane group)
        glos = [[None] * 3 for _ in range(N_RAY_GROUPS)]
        ghis = [[None] * 3 for _ in range(N_RAY_GROUPS)]
        for ax in range(3):
            per_lo = None
            per_hi = None
            for (p, q) in segments:
                lo = jnp.minimum(p[ax], q[ax])
                hi = jnp.maximum(p[ax], q[ax])
                per_lo = lo if per_lo is None else jnp.minimum(per_lo, lo)
                per_hi = hi if per_hi is None else jnp.maximum(per_hi, hi)
            for gi in range(N_RAY_GROUPS):
                sl = slice(gi * rows_per, (gi + 1) * rows_per)
                glos[gi][ax] = jnp.min(per_lo[sl])
                ghis[gi][ax] = jnp.max(per_hi[sl])

        def tri_test(t, par, blocked):
            def at(i):
                f = t * 9 + i
                return tri_scr[par, f // _CL_COLS, f % _CL_COLS]

            p0x = at(0)
            p0y = at(1)
            p0z = at(2)
            e1x = at(3)
            e1y = at(4)
            e1z = at(5)
            e2x = at(6)
            e2y = at(7)
            e2z = at(8)
            out = []
            for k, (px_, py_, pz_, ux, uy, uz, lo, hi) in enumerate(pre):
                pvx = uy * e2z - uz * e2y
                pvy = uz * e2x - ux * e2z
                pvz = ux * e2y - uy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                adet = det * sgn
                tvx, tvy, tvz = px_ - p0x, py_ - p0y, pz_ - p0z
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * sgn
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (ux * qvx + uy * qvy + uz * qvz) * sgn
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * sgn
                mn = jnp.minimum(uu, vv)
                mn = jnp.minimum(mn, adet - (uu + vv))
                mn = jnp.minimum(mn, tt - lo * adet)
                mn = jnp.minimum(mn, hi * adet - tt)
                mn = jnp.minimum(mn, adet - 1e-12)
                out.append(jnp.where(mn > 0.0, 1.0, blocked[k]))
            return tuple(out)

        def copy(c, par):
            return pltpu.make_async_copy(
                tri_hbm.at[pl.ds(c * _CL_ROWS, _CL_ROWS)],
                tri_scr.at[par], sem.at[par])

        def box_overlap(ref, base):
            overlap = jnp.bool_(False)
            for gi in range(N_RAY_GROUPS):
                overlap = overlap | (
                    (ref[base + 0] <= ghis[gi][0])
                    & (ref[base + 3] >= glos[gi][0])
                    & (ref[base + 1] <= ghis[gi][1])
                    & (ref[base + 4] >= glos[gi][1])
                    & (ref[base + 2] <= ghis[gi][2])
                    & (ref[base + 5] >= glos[gi][2])
                )
            return overlap

        def cluster_body(ci, carry):
            sc, blocked = carry
            c = sc * SUPER_M + ci
            par = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < SUPER_M)
            def _():
                copy(c + 1, 1 - par).start()

            copy(c, par).wait()

            def sweep(blk):
                def t4(q, blk):
                    t0 = q * 4
                    for dt in range(4):
                        blk = tri_test(t0 + dt, par, blk)
                    return blk

                return jax.lax.fori_loop(0, K_CLUSTER // 4, t4, blk)

            blocked = jax.lax.cond(box_overlap(clb_ref, c * 6), sweep,
                                   lambda blk: blk, blocked)
            return (sc, blocked)

        n_super = n_clusters // SUPER_M

        def super_body(sc, blocked):
            def descend(blk):
                copy(sc * SUPER_M, jnp.int32(0)).start()
                _, blk = jax.lax.fori_loop(0, SUPER_M, cluster_body,
                                           (sc, blk))
                return blk

            return jax.lax.cond(box_overlap(sclb_ref, sc * 6), descend,
                                lambda blk: blk, blocked)

        init = tuple(jnp.zeros(shape, jnp.float32) for _ in range(n_seg))
        blocked = jax.lax.fori_loop(0, n_super, super_body, init)
        return [b > 0.5 for b in blocked]

    return fn


def sort_vrls_morton(vrls):
    """Reorder a VRL buffer by the Morton code of segment midpoints —
    spatially localizes each 128-VRL kernel tile so the two-level
    occlusion's union AABBs stay tight (the Hilbert-order idea of the
    reference's pixel traversal, renderproc.cpp:79, applied to the VRL
    axis). Invalid slots sort to the end."""
    import numpy as np_

    mid = np_.asarray(0.5 * (vrls.start + vrls.end))
    valid = np_.asarray(vrls.valid)
    lo = mid.min(axis=0)
    ext = np_.maximum(mid.max(axis=0) - lo, 1e-12)
    q = np_.clip(((mid - lo) / ext * 1023).astype(np_.uint32), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))
    code = np_.where(valid, code, np_.uint32(0xFFFFFFFF))
    order = np_.argsort(code, kind="stable")
    take = lambda a: jnp.asarray(np_.asarray(a)[order])
    return type(vrls)(
        start=take(vrls.start), end=take(vrls.end),
        power=take(vrls.power), valid=take(vrls.valid),
        particle_count=vrls.particle_count,
    )


SUPER_M = 8   # leaf clusters per super-cluster (the hierarchy level)


def pack_tri_clusters(verts, faces, opaque_mask):
    """Host-side: BVH-leaf clusters of opaque triangles ->
    (cluster_bounds (C*6,) f32, super_bounds (S*6,) f32,
    tri_blocks (C*8, 128) f32, n_clusters).

    Round 5 (VERDICT r04 item 3): clusters are padded to a multiple of
    SUPER_M and grouped into super-clusters with union AABBs — the
    kernel walks the SUPER list and descends (DMA + leaf tests) only
    into overlapping subtrees, making the occlusion walk sublinear in
    triangle count when the geometry is spatially separable. The BVH
    build's leaf order is spatially coherent, so consecutive leaves
    form tight super boxes. Padding clusters carry never-overlapping
    AABBs (+inf lo) and zero triangle blocks."""
    import numpy as np_

    from alvrl_tpu.geometry import bvh as bvh_mod

    verts = np_.asarray(verts, np_.float32)
    faces = np_.asarray(faces)[np_.asarray(opaque_mask)]
    if len(faces) == 0:
        return (jnp.zeros((6,), jnp.float32),
                jnp.zeros((6,), jnp.float32),
                jnp.zeros((_CL_ROWS, _CL_COLS), jnp.float32), 0)
    b = bvh_mod.build(verts, faces, leaf_size=K_CLUSTER)
    leaf = np_.asarray(b.prim_count) > 0
    starts = np_.asarray(b.prim_start)[leaf]
    counts = np_.asarray(b.prim_count)[leaf]
    lo = np_.asarray(b.bounds_lo)[leaf]
    hi = np_.asarray(b.bounds_hi)[leaf]
    p0 = np_.asarray(b.tri_p0)
    e1 = np_.asarray(b.tri_e1)
    e2 = np_.asarray(b.tri_e2)
    c_real = len(starts)
    c = int(-(-c_real // SUPER_M) * SUPER_M)
    blocks = np_.zeros((c, _CL_ROWS * _CL_COLS), np_.float32)
    for i in range(c_real):
        s, n = int(starts[i]), int(counts[i])
        tri = np_.concatenate(
            [p0[s:s + n], e1[s:s + n], e2[s:s + n]], axis=1
        )  # (n, 9)
        blocks[i, : n * 9] = tri.reshape(-1)
    blocks = blocks.reshape(c * _CL_ROWS, _CL_COLS)
    lo_p = np_.full((c, 3), 1e30, np_.float32)
    hi_p = np_.full((c, 3), -1e30, np_.float32)
    lo_p[:c_real] = lo
    hi_p[:c_real] = hi
    clb = np_.concatenate([lo_p, hi_p], axis=1).reshape(-1)
    s_lo = lo_p.reshape(-1, SUPER_M, 3).min(axis=1)
    s_hi = hi_p.reshape(-1, SUPER_M, 3).max(axis=1)
    sclb = np_.concatenate([s_lo, s_hi], axis=1).reshape(-1)
    return (jnp.asarray(clb.astype(np_.float32)),
            jnp.asarray(sclb.astype(np_.float32)),
            jnp.asarray(blocks), c)


@partial(
    jax.jit,
    static_argnames=("n_clusters", "vol_vol_samples", "vol_surf_samples",
                     "short_vrls", "phase_kind"),
)
def vrl_sum_pallas_bvh(
    ray_pack,     # (B, RAY_ROWS) f32, B % RAY_TILE == 0
    vrl_pack,     # (VRL_ROWS, N) f32, N % VRL_TILE == 0 (Morton-sorted)
    cluster_bounds,  # (C*6,) f32 AABBs (lo3, hi3 per cluster)
    super_bounds,    # (C/SUPER_M*6,) f32 super-cluster union AABBs
    tri_blocks,   # (C*8, 128) f32 triangle row-blocks
    med_pack,     # (1, 16) f32
    seed,         # (1,) i32
    n_clusters: int,
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
):
    """Two-level unclustered VRL sum: like vrl_sum_pallas but with
    HBM-streamed triangle clusters (no SMEM triangle cap) behind a
    super-cluster hierarchy level (round 5 — sublinear walk).
    Returns (3, B) per-ray sums (not particle-normalized)."""
    b = ray_pack.shape[0]
    n = vrl_pack.shape[1]
    grid = (b // RAY_TILE, n // VRL_TILE)
    n_seg = vol_vol_samples + vol_surf_samples
    assert n_clusters % SUPER_M == 0, n_clusters

    def kernel(clb_ref, sclb_ref, seed_ref, ray_ref, vrl_ref, med_ref,
               tri_hbm, out_ref, tri_scr, blocked_scr, sem):
        occl = _occl_bvh(clb_ref, sclb_ref, n_clusters, tri_hbm,
                         tri_scr, blocked_scr, sem)
        _kernel(
            None, seed_ref, ray_ref, vrl_ref, med_ref, out_ref,
            n_tris=0,
            vol_vol_samples=vol_vol_samples,
            vol_surf_samples=vol_surf_samples,
            short_vrls=short_vrls,
            phase_kind=phase_kind,
            occl_fn=occl,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (RAY_TILE, RAY_ROWS), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (VRL_ROWS, VRL_TILE), lambda i, j, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 16), lambda i, j, *_: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),  # tri_blocks (HBM)
            ],
            out_specs=pl.BlockSpec(
                (3, RAY_TILE), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.SMEM((2, _CL_ROWS, _CL_COLS), jnp.float32),
                pltpu.VMEM((4, RAY_TILE, VRL_TILE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(cluster_bounds, super_bounds, seed, ray_pack, vrl_pack, med_pack,
      tri_blocks)
