"""Backward Pallas kernels for the VRL pair integral (all launches).

The north-star contract (BASELINE) wants forward AND backward Pallas
kernels. Reverse-mode through the forward kernel is impossible (Pallas
kernels are opaque to AD), and the XLA fallback re-evaluates the whole
estimator at AD-graph speed (~3x slower than the kernel). This module
implements the custom VJPs: the backward kernel RECOMPUTES the forward
estimator with the SAME PRNG seed sequence (identical samples) and
accumulates the analytic parameter cotangents in one pass. Round 4
extends the round-3 homogeneous unclustered kernel to all four launch
variants ({homogeneous, heterogeneous} x {unclustered, clustered}),
matching the forward `ops.vrl_pallas._kernel` parametrization.

Cotangents (homogeneous):
    d_power   (3, N)  — per-VRL  (term is linear in power)
    d_sigma_t (3,)    — through tau = exp(-sig_t * D), the short-VRL
                        pdfFailure mixture, and the eye-surface tau
    d_sigma_s (3,)    — term ~ sigma_s^2 (vol-vol) / sigma_s (vol-surf)
    d_g               — phase log-derivative at both phase vertices
                        (static phase_kind dispatch: HG has a g
                        derivative, Rayleigh's is zero)
    d_tau_eu_s (3, B) — per-ray vol-surf eye transmittance (lets the
                        XLA side chain d sigma_t through pack_rays)

Additional cotangents (heterogeneous, pack layout of
pack.pack_rays_hetero / pack_vrls_hetero / pack_medium_hetero):
    d_eod (NQ+1, B)   — eye cumulative-OD table entries; XLA chains
                        these through media.heterogeneous.cumulative_od
                        to the density voxels / med.scale
    d_vod (NQ+1, N)   — VRL cumulative-OD table entries (same chain)
    d_chan            — the pdfFailure channel (mean sigma_t), chained
                        through pack_medium_hetero's jnp.mean
    d_fac (3K, 128)   — EXACT per-entry cotangents of the CP density
                        factor tables (round 5, replacing the round-4
                        density-scale projection): every in-kernel
                        density evaluation (dens_u, dens_v, the U<->V
                        quadrature) scatters its cotangent as three
                        rank-1 one-hot updates on the MXU. XLA chains
                        d_fac to the raw voxels + med.scale through
                        the CP fit's implicit VJP
                        (ops.cp.fit_medium_vjp: CG on the Khatri-Rao
                        Gauss-Newton system, then _upsample2^T).
                        Validated by entry-level FD, the trilinear
                        gauge invariant <d_fac, cp> = 3 d_dens, and
                        voxel-level FD through refit-then-render at
                        <= 1e-3 (tests/test_pallas_bwd.py).
    d_dens            — cotangent of a global density multiplier;
                        retained only as the cross-check channel for
                        the invariant test above.

Derivatives mirror integrate.pair_contribution's estimator exactly
(vrlIntegrator.cpp:603-785, heterogeneous.cpp:546-663 semantics); the
unclustered grid is (vrl-tile, ray-tile) — j outer so the per-VRL
output block stays resident while the inner ray dimension accumulates;
the clustered grid is 1-D over ray tiles with per-tile table outputs
segment-summed per slice on the XLA side.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alvrl_tpu.ops.vrl_pallas import (
    NQ, RAY_TILE, RAY_ROWS, VRL_ROWS, VRL_TILE,
    H_RAY_ROWS, H_VRL_ROWS, _EOD, _VOD,
    _ALB, _HP, _NG, _RD, _RO, _TAU, _VALID, _VE, _VP, _VS, _VVALID,
    _atan_pos, _asinh, _dot3, _lane_gather_row, _sinh, _tan, _u01,
)

_INV_FOURPI = 1.0 / (4.0 * np.pi)
_H_EPS = 1e-6
# gbar (cotangent of the per-ray output) rides spare ray_pack rows
_GBAR = 19  # rows 19..21 (RAY_ROWS = 24; 16..18 hold tau_eu_s)
N_PAR = 8    # homogeneous d_par rows: sig_t(3), sig_s(3), g, (spare)
N_PAR_H = 16  # hetero: sig_t(3), sig_s(3), g, chan, dens, (spares)
OD_PAD = 24  # NQ+1 = 17 table-cotangent rows padded to a sublane mult


def _hg(g, c):
    temp = jnp.maximum(1.0 + g * g + 2.0 * g * c, 1e-12)
    return _INV_FOURPI * (1.0 - g * g) / (temp * jnp.sqrt(temp))


def _dlog_hg_dg(g, c):
    """d/dg log hg(g, c) = -2g/(1-g^2) - 3(g + c)/(1 + g^2 + 2gc)."""
    temp = jnp.maximum(1.0 + g * g + 2.0 * g * c, 1e-12)
    return -2.0 * g / jnp.maximum(1.0 - g * g, 1e-9) \
        - 3.0 * (g + c) / temp


def _phase_pair(kind: int, g, c):
    """Static phase dispatch matching the forward's _phase: returns
    (value, dlog/dg). Rayleigh (kind 1) has no g dependence."""
    if kind == 1:
        return (3.0 / (16.0 * np.pi)) * (1.0 + c * c), jnp.zeros_like(c)
    return _hg(g, c), _dlog_hg_dg(g, c)


def _bwd_kernel(
    tri_ref, seed_ref,
    vrl_ref,    # (VRL_ROWS, V) dense / (1, ROWS, V) clustered table
    ray_ref,    # (RAY_TILE, RAY_ROWS|H_RAY_ROWS) incl. gbar rows
    med_ref,    # (1, 16) homog / (1, 32) hetero
    dpw_ref,    # out: (3, V) accumulated over rays, or (1, 3, V)/tile
    dpar_ref,   # out: (N_PAR[_H], 128) lane 0 holds the scalar sums
    dtau_ref,   # out: (3, RAY_TILE) per-ray d tau_eu_s
    *,
    n_tris: int,
    vol_vol_samples: int,
    vol_surf_samples: int,
    short_vrls: bool,
    phase_kind: int,
    clustered: bool = False,
    hetero: bool = False,
    cp_ref=None,
    n_cp: int = 0,
    uv_steps: int = 4,
    deod_ref=None,  # out (hetero): (OD_PAD, RAY_TILE) eye-table cots
    dvod_ref=None,  # out (hetero): (OD_PAD, V) or (1, OD_PAD, V)/tile
    dfac_ref=None,  # out (hetero): (3*n_cp, 128) CP factor cotangents
    scat_scr=None,  # scratch (hetero): 3x (R,V) i32 + 1x (R,V) f32 for
                    # the per-row dynamic loads of scatter_density
):
    if clustered:
        i = pl.program_id(0)
        j = 0
        # every per-tile / per-ray block is visited exactly once
        dpw_ref[...] = jnp.zeros_like(dpw_ref)
        dtau_ref[...] = jnp.zeros_like(dtau_ref)
        if hetero:
            deod_ref[...] = jnp.zeros_like(deod_ref)
            dvod_ref[...] = jnp.zeros_like(dvod_ref)

        @pl.when(i == 0)
        def _():
            dpar_ref[...] = jnp.zeros_like(dpar_ref)
            if hetero:
                dfac_ref[...] = jnp.zeros_like(dfac_ref)

        # forward clustered seed: (seed, i)
        pltpu.prng_seed(seed_ref[0], i)
    else:
        j = pl.program_id(0)   # vrl tile (outer)
        i = pl.program_id(1)   # ray tile (inner)

        @pl.when(i == 0)
        def _():
            dpw_ref[...] = jnp.zeros_like(dpw_ref)
            if hetero:
                dvod_ref[...] = jnp.zeros_like(dvod_ref)

        @pl.when((i == 0) & (j == 0))
        def _():
            dpar_ref[...] = jnp.zeros_like(dpar_ref)
            if hetero:
                dfac_ref[...] = jnp.zeros_like(dfac_ref)

        @pl.when(j == 0)
        def _():
            dtau_ref[...] = jnp.zeros_like(dtau_ref)
            if hetero:
                deod_ref[...] = jnp.zeros_like(deod_ref)

        # SAME seed the forward used for tile (i, j): i * n_j + j with
        # the forward's (ray, vrl) grid ordering
        pltpu.prng_seed(seed_ref[0], i * pl.num_programs(0) + j)

    def rrow(k):
        return ray_ref[:, k][:, None]

    if clustered:
        def vrow(k):
            return vrl_ref[0, k, :][None, :]
    else:
        def vrow(k):
            return vrl_ref[k, :][None, :]

    ox, oy, oz = rrow(_RO), rrow(_RO + 1), rrow(_RO + 2)
    dx, dy, dz = rrow(_RD), rrow(_RD + 1), rrow(_RD + 2)
    hx, hy, hz = rrow(_HP), rrow(_HP + 1), rrow(_HP + 2)
    ngx, ngy, ngz = rrow(_NG), rrow(_NG + 1), rrow(_NG + 2)
    alb = (rrow(_ALB), rrow(_ALB + 1), rrow(_ALB + 2))
    rvalid = rrow(_VALID)
    tau_eu_s = (rrow(_TAU), rrow(_TAU + 1), rrow(_TAU + 2))
    gbar = (rrow(_GBAR), rrow(_GBAR + 1), rrow(_GBAR + 2))

    sx, sy, sz = vrow(_VS), vrow(_VS + 1), vrow(_VS + 2)
    ex, ey, ez = vrow(_VE), vrow(_VE + 1), vrow(_VE + 2)
    pw = (vrow(_VP), vrow(_VP + 1), vrow(_VP + 2))
    vvalid = vrow(_VVALID)

    sig_t = (med_ref[0, 0], med_ref[0, 1], med_ref[0, 2])
    sig_s = (med_ref[0, 3], med_ref[0, 4], med_ref[0, 5])
    g = med_ref[0, 6]
    msw = med_ref[0, 7]   # hetero: chan (mean sigma_t channel)

    shape = (RAY_TILE, VRL_TILE)
    pair_mask = (rvalid > 0.5) & (vvalid > 0.5)

    vdx, vdy, vdz = ex - sx, ey - sy, ez - sz
    vlen = jnp.sqrt(jnp.maximum(vdx * vdx + vdy * vdy + vdz * vdz, 1e-30))
    ivl = 1.0 / vlen
    ux_v, uy_v, uz_v = vdx * ivl, vdy * ivl, vdz * ivl
    ex_e, ey_e, ez_e = hx - ox, hy - oy, hz - oz
    elen = jnp.sqrt(jnp.maximum(
        ex_e * ex_e + ey_e * ey_e + ez_e * ez_e, 1e-30))

    if hetero:
        # grid-medium replay machinery — mirrors the forward hetero
        # branch of ops.vrl_pallas._kernel exactly (same CP density,
        # same table interpolation), with k0/w exposed so the table
        # cotangents can be scattered back
        chan = msw
        box0 = (med_ref[0, 8], med_ref[0, 9], med_ref[0, 10])
        inv_e = (med_ref[0, 11], med_ref[0, 12], med_ref[0, 13])
        isc = (med_ref[0, 14], med_ref[0, 15], med_ref[0, 16])

        def _cell_indices(px_, py_, pz_):
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
            return ix, iy, iz, inside

        def density_at(px_, py_, pz_):
            """Forward replay of the CP density lookup. Returns
            (value, dmask): dmask is the lookup's own derivative mask —
            1 where the value actually responds to the factor tables
            (inside the box AND above the max(.,0) clamp), 0 elsewhere.
            Density cotangents must be multiplied by it before
            scatter_density."""
            ix, iy, iz, inside = _cell_indices(px_, py_, pz_)

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
            dmask = jnp.where(inside & (acc_d > 0.0), 1.0, 0.0)
            return jnp.where(inside, jnp.maximum(acc_d, 0.0), 0.0), dmask

        # ---- per-voxel density cotangents (round 5, VERDICT r04 #1) --
        # d_fac: EXACT cotangents of the CP factor tables — the
        # derivative of the kernel's own density evaluations, replacing
        # the old density-scale projection. Every lookup
        # dens = sum_k A[k,iz]*B[k,iy]*C[k,ix] with local cotangent c
        # scatters three rank-1 updates: dA[k,iz] += c*B[k,iy]*C[k,ix],
        # dB[k,iy] += c*A[k,iz]*C[k,ix], dC[k,ix] += c*A[k,iz]*B[k,iy].
        # Per sample-row the update is one lane-gather per factor plus
        # a one-hot contraction on the MXU; the one-hot is built
        # TRANSPOSED ((entry-sublane == idx-lane) broadcast compare
        # needs no relayout) and dot_general contracts the sample axis.
        # The XLA side chains d_fac to voxels through the CP fit's
        # implicit VJP (ops.cp.fit_medium_vjp).
        d_fac = [jnp.zeros((n_cp, 128), jnp.float32) for _ in range(3)]
        cp_a = cp_ref[0:n_cp, :]
        cp_b = cp_ref[n_cp:2 * n_cp, :]
        cp_c = cp_ref[2 * n_cp:3 * n_cp, :]

        def scatter_density(px_, py_, pz_, cot):
            """Accumulate cot (pre-masked with density_at's dmask) into
            d_fac. Indices are recomputed from the position — cheaper
            than keeping 22 index triples live across the tile. The
            per-row extraction goes through VMEM scratch (Mosaic has no
            dynamic_slice on values, only dynamic ref loads). Rows are
            processed 8 at a time: the per-row (K,128) weight tiles and
            (128,128) transposed one-hots are lane-concatenated so each
            dot_general contracts 8*128 samples on the MXU (8x fewer
            matmul dispatches than the naive per-row loop; gathers stay
            per-row — dynamic_gather addresses one 128-lane vreg)."""
            ix, iy, iz, _ = _cell_indices(px_, py_, pz_)
            ix_scr, iy_scr, iz_scr, cot_scr = scat_scr
            ix_scr[...] = ix
            iy_scr[...] = iy
            iz_scr[...] = iz
            cot_scr[...] = cot
            iota_sub = jax.lax.broadcasted_iota(
                jnp.int32, (RAY_TILE, VRL_TILE), 0)
            GRP = 8

            def group(gi, carry):
                da_, db_, dc_ = carry
                a0 = gi * GRP
                wz, wy, wx, ohz, ohy, ohx = [], [], [], [], [], []
                for d in range(GRP):
                    izr = iz_scr[pl.ds(a0 + d, 1), :]
                    iyr = iy_scr[pl.ds(a0 + d, 1), :]
                    ixr = ix_scr[pl.ds(a0 + d, 1), :]
                    cr = cot_scr[pl.ds(a0 + d, 1), :]
                    az = jnp.take_along_axis(
                        cp_a, jnp.broadcast_to(izr, (n_cp, 128)),
                        axis=1)
                    ay = jnp.take_along_axis(
                        cp_b, jnp.broadcast_to(iyr, (n_cp, 128)),
                        axis=1)
                    ax = jnp.take_along_axis(
                        cp_c, jnp.broadcast_to(ixr, (n_cp, 128)),
                        axis=1)
                    cb = jnp.broadcast_to(cr, (n_cp, 128))
                    wz.append(cb * ay * ax)
                    wy.append(cb * az * ax)
                    wx.append(cb * az * ay)
                    # one-hot^T: oh[e, s] = (e == idx_row[s])
                    ohz.append((iota_sub == izr).astype(jnp.float32))
                    ohy.append((iota_sub == iyr).astype(jnp.float32))
                    ohx.append((iota_sub == ixr).astype(jnp.float32))
                dn = (((1,), (1,)), ((), ()))
                da_ = da_ + jax.lax.dot_general(
                    jnp.concatenate(wz, axis=1),
                    jnp.concatenate(ohz, axis=1), dn,
                    preferred_element_type=jnp.float32)
                db_ = db_ + jax.lax.dot_general(
                    jnp.concatenate(wy, axis=1),
                    jnp.concatenate(ohy, axis=1), dn,
                    preferred_element_type=jnp.float32)
                dc_ = dc_ + jax.lax.dot_general(
                    jnp.concatenate(wx, axis=1),
                    jnp.concatenate(ohx, axis=1), dn,
                    preferred_element_type=jnp.float32)
                return da_, db_, dc_

            d_fac[0], d_fac[1], d_fac[2] = jax.lax.fori_loop(
                0, RAY_TILE // GRP, group,
                (d_fac[0], d_fac[1], d_fac[2]))

        eod = ray_ref[:, _EOD:_EOD + NQ + 1]
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
            return c0 * (1.0 - w) + c1 * w, k0, w

        if clustered:
            vod = vrl_ref[0, _VOD:_VOD + NQ + 1, :]
        else:
            vod = vrl_ref[_VOD:_VOD + NQ + 1, :]
        vod_t = jnp.concatenate(
            [vod.T, jnp.zeros((VRL_TILE, RAY_TILE - (NQ + 1)), jnp.float32)],
            axis=1,
        )

        def interp_vrl(frac):
            t = jnp.clip(frac, 0.0, 1.0) * NQ
            k0f = jnp.clip(jnp.floor(t), 0.0, NQ - 1.0)
            w = t - k0f
            k0 = k0f.astype(jnp.int32)
            k0t = k0.T
            c0 = jnp.take_along_axis(vod_t, k0t, axis=1).T
            c1 = jnp.take_along_axis(vod_t, k0t + 1, axis=1).T
            return c0 * (1.0 - w) + c1 * w, k0, w

        def od_between(p_a, p_b, d_ab):
            """Midpoint quadrature replay. Also returns the per-step
            (position, dmask) pairs so the density cotangent
            g_od * d_ab/uv_steps can be scattered at each quadrature
            point after the integrand cotangents are known."""
            total = jnp.zeros(d_ab.shape, jnp.float32)
            steps = []
            for s_i in range(uv_steps):
                tq = (s_i + 0.5) / uv_steps
                pq = (
                    p_a[0] + tq * (p_b[0] - p_a[0]),
                    p_a[1] + tq * (p_b[1] - p_a[1]),
                    p_a[2] + tq * (p_b[2] - p_a[2]),
                )
                dq, mq = density_at(*pq)
                total = total + dq
                steps.append((pq, mq))
            return total * (d_ab / uv_steps), steps

        # table-cotangent accumulators: one (R,)/(V,) row per entry
        d_eod_rows = [jnp.zeros((RAY_TILE,), jnp.float32)
                      for _ in range(NQ + 1)]
        d_vod_rows = [jnp.zeros((VRL_TILE,), jnp.float32)
                      for _ in range(NQ + 1)]

        def scatter_eod(gts, k0, w):
            # d/d c0 = (1-w), d/d c1 = w at per-pair entry k0: one-hot
            # accumulation over the NQ+1 entries (lane scatters are
            # unsupported; 17 masked reductions are cheap and exact)
            for m in range(NQ + 1):
                wm = jnp.where(k0 == m, 1.0 - w, 0.0) \
                    + jnp.where(k0 + 1 == m, w, 0.0)
                d_eod_rows[m] += jnp.sum(gts * wm, axis=1)

        def scatter_vod(gts, k0, w):
            for m in range(NQ + 1):
                wm = jnp.where(k0 == m, 1.0 - w, 0.0) \
                    + jnp.where(k0 + 1 == m, w, 0.0)
                d_vod_rows[m] += jnp.sum(gts * wm, axis=0)

    # ---- identical sampling machinery to the forward ------------------
    def seg_seg_closest():
        ax_, ay_, az_ = ex_e, ey_e, ez_e
        bx_, by_, bz_ = vdx, vdy, vdz
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
        px_ = ox + sc * ax_ - (sx + tc * bx_)
        py_ = oy + sc * ay_ - (sy + tc * by_)
        pz_ = oz + sc * az_ - (sz + tc * bz_)
        h = jnp.sqrt(jnp.maximum(px_ * px_ + py_ * py_ + pz_ * pz_, 0.0))
        return tc, h

    tc_close, h_close = seg_seg_closest()
    cos_theta = _dot3(dx, dy, dz, ux_v, uy_v, uz_v)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    near_par = sin_theta < 1e-4
    sin_safe = jnp.maximum(sin_theta, 1e-4)
    h = jnp.maximum(h_close, _H_EPS)
    arc_h = tc_close * vlen
    a0 = _asinh(-arc_h / h * sin_safe)
    a1 = _asinh((vlen - arc_h) / h * sin_safe)

    def sample_v(u):
        new_v = h * _sinh(a0 + u * (a1 - a0)) / sin_safe
        inv_dist = jax.lax.rsqrt(
            jnp.maximum(h * h + new_v * new_v * sin_safe * sin_safe, 1e-30))
        denom = jnp.maximum((a1 - a0) / sin_safe, 1e-30)
        arc = new_v + arc_h
        pdf_k = inv_dist / denom
        return (jnp.where(near_par, u * vlen, arc),
                jnp.where(near_par, ivl, pdf_k))

    def kulla_u(vx_, vy_, vz_, u):
        dot_pr = _dot3(dx, dy, dz, vx_ - ox, vy_ - oy, vz_ - oz)
        ix_ = ox + dot_pr * dx
        iy_ = oy + dot_pr * dy
        iz_ = oz + dot_pr * dz
        ddx, ddy, ddz = vx_ - ix_, vy_ - iy_, vz_ - iz_
        dis = jnp.maximum(
            jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz), _H_EPS)
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
            dis / jnp.maximum(span * (dis * dis + t * t), 1e-30), 0.0)
        return dot_pr + t, pdf

    def occluded_multi(segments):
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

        init = tuple(jnp.zeros(shape, jnp.float32) for _ in segments)
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

    # ---- replay samples ----------------------------------------------
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
        vv_samples.append(dict(arc_u=arc_u, arc_v=arc_v,
                               pdf=pdf_v * pdf_u,
                               u=(ux_p, uy_p, uz_p), v=(vx_, vy_, vz_)))

    alb_any = (alb[0] + alb[1] + alb[2]) > 0.0
    vs_samples = []
    for _ in range(vol_surf_samples):
        u1 = _u01(shape)
        dot_pr = _dot3(ux_v, uy_v, uz_v, hx - sx, hy - sy, hz - sz)
        ix_ = sx + dot_pr * ux_v
        iy_ = sy + dot_pr * uy_v
        iz_ = sz + dot_pr * uz_v
        ddx, ddy, ddz = hx - ix_, hy - iy_, hz - iz_
        dis = jnp.maximum(
            jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz), _H_EPS)
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
            dis / jnp.maximum(span * (dis * dis + t * t), 1e-30), 0.0)
        arc_v = dot_pr + t
        vs_samples.append(dict(
            arc_v=arc_v, pdf=pdf_v,
            v=(sx + arc_v * ux_v, sy + arc_v * uy_v, sz + arc_v * uz_v)))

    segments = [(smp["u"], smp["v"]) for smp in vv_samples]
    segments += [((hx, hy, hz), smp["v"]) for smp in vs_samples]
    blocked_all = occluded_multi(segments)

    d_pw = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    d_st = [jnp.float32(0.0)] * 3
    d_ss = [jnp.float32(0.0)] * 3
    d_g = jnp.float32(0.0)
    d_chan = jnp.float32(0.0)
    d_dens = jnp.float32(0.0)
    d_tau = [jnp.zeros(shape, jnp.float32) for _ in range(3)]

    # ---- vol-vol cotangents -------------------------------------------
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
        # +vu.d (rho_U) matches the forward's round-3 sign fix
        c_u = _dot3(vux, vuy, vuz, dx, dy, dz)
        c_v = -_dot3(ux_v, uy_v, uz_v, vux, vuy, vuz)
        ph_u, dlog_u = _phase_pair(phase_kind, g, c_u)
        ph_v, dlog_v = _phase_pair(phase_kind, g, c_v)
        geo = jnp.where(ok, ph_u * ph_v / jnp.maximum(pdf * d_uv2, 1e-30),
                        0.0)
        dgdg = dlog_u + dlog_v
        if hetero:
            od_eu, ke, we = interp_eye(
                d_eu / jnp.maximum(elen, 1e-20))
            od_sv, kv, wv = interp_vrl(jnp.clip(arc_v * ivl, 0.0, 1.0))
            od_uv, uv_qsteps = od_between(
                (ux_p, uy_p, uz_p), (vx_, vy_, vz_), d_uv)
            dens_u, dmask_u = density_at(ux_p, uy_p, uz_p)
            dens_v, dmask_v = density_at(vx_, vy_, vz_)
            if short_vrls:
                # grid media pdfFailure = exp(-chan * od_sv)
                geo = geo / jnp.maximum(jnp.exp(-chan * od_sv), 1e-30)
            od_all = od_eu + od_uv + od_sv
            wterm = []
            g_eod = jnp.zeros(shape, jnp.float32)
            g_vod = jnp.zeros(shape, jnp.float32)
            c_du = jnp.zeros(shape, jnp.float32)
            c_dv = jnp.zeros(shape, jnp.float32)
            for ch in range(3):
                tau = jnp.exp(-sig_t[ch] * od_all)
                # term is bilinear in (dens_u, dens_v): keep the base
                # product so the density slopes survive dens == 0
                base = (pw[ch] * sig_s[ch] * sig_s[ch] * tau * geo
                        * (1.0 / vol_vol_samples))
                t_ch = base * dens_u * dens_v
                gt = gbar[ch] * t_ch
                gb = gbar[ch] * base
                wterm.append(gt)
                c_du += gb * dens_v
                c_dv += gb * dens_u
                d_pw[ch] += gt / jnp.maximum(pw[ch], 1e-30) \
                    * jnp.where(pw[ch] != 0.0, 1.0, 0.0)
                d_ss[ch] += 2.0 * jnp.sum(gt) \
                    / jnp.maximum(sig_s[ch], 1e-30)
                d_st[ch] += jnp.sum(gt * (-od_all))
                g_eod += gt * (-sig_t[ch])
                g_vod += gt * (-sig_t[ch])
                # in-kernel density scale (kept as the cross-check
                # channel for the exact d_fac route): dens_u*dens_v ~
                # eta^2, od_uv ~ eta -> d/d eta = gt * (2 - st*od_uv)
                d_dens += jnp.sum(gt * (2.0 - sig_t[ch] * od_uv))
            gt_all = wterm[0] + wterm[1] + wterm[2]
            d_g += jnp.sum(gt_all * dgdg)
            if short_vrls:
                d_chan += jnp.sum(gt_all * od_sv)
                g_vod += gt_all * chan
            scatter_eod(g_eod, ke, we)
            scatter_vod(g_vod, kv, wv)
            # per-voxel density cotangents: the U/V point factors and
            # the U<->V quadrature (g_eod == sum_ch gt*(-sig_t) is the
            # od_all cotangent; od_uv = (d_uv/S) * sum_q dens_q)
            scatter_density(ux_p, uy_p, uz_p, c_du * dmask_u)
            scatter_density(vx_, vy_, vz_, c_dv * dmask_v)
            c_od = g_eod * (d_uv / uv_steps)
            for (pq, mq) in uv_qsteps:
                scatter_density(pq[0], pq[1], pq[2], c_od * mq)
        else:
            pf_c = [jnp.exp(-sig_t[c] * d_sv) for c in range(3)]
            pf = msw * (pf_c[0] + pf_c[1] + pf_c[2]) / 3.0 + (1.0 - msw)
            if short_vrls:
                geo = geo / jnp.maximum(pf, 1e-30)
            dd = d_eu + d_uv + d_sv
            wterm = []
            for ch in range(3):
                tau = jnp.exp(-sig_t[ch] * dd)
                t_ch = (pw[ch] * sig_s[ch] * sig_s[ch] * tau * geo
                        * (1.0 / vol_vol_samples))
                gt = gbar[ch] * t_ch          # cotangent-weighted term
                wterm.append(gt)
                d_pw[ch] += gt / jnp.maximum(pw[ch], 1e-30) \
                    * jnp.where(pw[ch] != 0.0, 1.0, 0.0)
                d_ss[ch] += 2.0 * jnp.sum(gt) \
                    / jnp.maximum(sig_s[ch], 1e-30)
                d_st[ch] += jnp.sum(gt * (-dd))
            gt_all = wterm[0] + wterm[1] + wterm[2]
            d_g += jnp.sum(gt_all * dgdg)
            if short_vrls:
                # t_ch ~ 1/pf: d/d sig_t_c = t_ch * msw d_sv
                #              exp(-st_c d_sv) / (3 pf)
                for c in range(3):
                    d_st[c] += jnp.sum(
                        gt_all * msw * d_sv * pf_c[c]
                        / jnp.maximum(3.0 * pf, 1e-30))

    # ---- vol-surf cotangents ------------------------------------------
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
        cos_o = jnp.maximum(_dot3(ngx, ngy, ngz, -vux, -vuy, -vuz), 0.0)
        ok = pair_mask & alb_any & ~blocked & (d_uv2 > 0.0) & (pdf_v > 0.0)
        c_v = -_dot3(ux_v, uy_v, uz_v, vux, vuy, vuz)
        ph_v, dlog_v = _phase_pair(phase_kind, g, c_v)
        geo = jnp.where(
            ok, ph_v * cos_o * (1.0 / np.pi)
            / jnp.maximum(pdf_v * d_uv2, 1e-30), 0.0)
        if hetero:
            od_sv, kv, wv = interp_vrl(jnp.clip(arc_v * ivl, 0.0, 1.0))
            od_uv, uv_qsteps = od_between(
                (hx, hy, hz), (vx_, vy_, vz_), d_uv)
            dens_v, dmask_v = density_at(vx_, vy_, vz_)
            if short_vrls:
                geo = geo / jnp.maximum(jnp.exp(-chan * od_sv), 1e-30)
            od_all = od_uv + od_sv
            wterm = []
            g_vod = jnp.zeros(shape, jnp.float32)
            c_dv = jnp.zeros(shape, jnp.float32)
            g_od = jnp.zeros(shape, jnp.float32)
            for ch in range(3):
                tau = jnp.exp(-sig_t[ch] * od_all)
                base = (pw[ch] * sig_s[ch] * alb[ch]
                        * tau_eu_s[ch] * tau * geo
                        * (1.0 / vol_surf_samples))
                t_ch = base * dens_v
                gt = gbar[ch] * t_ch
                wterm.append(gt)
                c_dv += gbar[ch] * base
                d_pw[ch] += gt / jnp.maximum(pw[ch], 1e-30) \
                    * jnp.where(pw[ch] != 0.0, 1.0, 0.0)
                d_ss[ch] += jnp.sum(gt) / jnp.maximum(sig_s[ch], 1e-30)
                d_st[ch] += jnp.sum(gt * (-od_all))
                d_tau[ch] += gt / jnp.maximum(tau_eu_s[ch], 1e-30)
                g_vod += gt * (-sig_t[ch])
                g_od += gt * (-sig_t[ch])
                d_dens += jnp.sum(gt * (1.0 - sig_t[ch] * od_uv))
            gt_all = wterm[0] + wterm[1] + wterm[2]
            d_g += jnp.sum(gt_all * dlog_v)
            if short_vrls:
                d_chan += jnp.sum(gt_all * od_sv)
                g_vod += gt_all * chan
            scatter_vod(g_vod, kv, wv)
            scatter_density(vx_, vy_, vz_, c_dv * dmask_v)
            c_od = g_od * (d_uv / uv_steps)
            for (pq, mq) in uv_qsteps:
                scatter_density(pq[0], pq[1], pq[2], c_od * mq)
        else:
            pf_c = [jnp.exp(-sig_t[c] * d_sv) for c in range(3)]
            pf = msw * (pf_c[0] + pf_c[1] + pf_c[2]) / 3.0 + (1.0 - msw)
            if short_vrls:
                geo = geo / jnp.maximum(pf, 1e-30)
            dd = d_uv + d_sv
            wterm = []
            for ch in range(3):
                tau = jnp.exp(-sig_t[ch] * dd)
                t_ch = (pw[ch] * sig_s[ch] * alb[ch] * tau_eu_s[ch] * tau
                        * geo * (1.0 / vol_surf_samples))
                gt = gbar[ch] * t_ch
                wterm.append(gt)
                d_pw[ch] += gt / jnp.maximum(pw[ch], 1e-30) \
                    * jnp.where(pw[ch] != 0.0, 1.0, 0.0)
                d_ss[ch] += jnp.sum(gt) / jnp.maximum(sig_s[ch], 1e-30)
                d_st[ch] += jnp.sum(gt * (-dd))
                # d tau_eu_s: per-ray row sum over vrls
                d_tau[ch] += gt / jnp.maximum(tau_eu_s[ch], 1e-30)
            gt_all = wterm[0] + wterm[1] + wterm[2]
            d_g += jnp.sum(gt_all * dlog_v)
            if short_vrls:
                for c in range(3):
                    d_st[c] += jnp.sum(
                        gt_all * msw * d_sv * pf_c[c]
                        / jnp.maximum(3.0 * pf, 1e-30))

    for ch in range(3):
        if clustered:
            dpw_ref[0, ch, :] += jnp.sum(d_pw[ch], axis=0)
        else:
            dpw_ref[ch, :] += jnp.sum(d_pw[ch], axis=0)
        dtau_ref[ch, :] += jnp.sum(d_tau[ch], axis=1)
    if hetero:
        for m in range(NQ + 1):
            deod_ref[m, :] += d_eod_rows[m]
            if clustered:
                dvod_ref[0, m, :] += d_vod_rows[m]
            else:
                dvod_ref[m, :] += d_vod_rows[m]
        dfac_ref[0:n_cp, :] += d_fac[0]
        dfac_ref[n_cp:2 * n_cp, :] += d_fac[1]
        dfac_ref[2 * n_cp:3 * n_cp, :] += d_fac[2]
        updates = [d_st[0], d_st[1], d_st[2], d_ss[0], d_ss[1], d_ss[2],
                   d_g, d_chan, d_dens] + [jnp.float32(0.0)] * 7
    else:
        updates = [d_st[0], d_st[1], d_st[2], d_ss[0], d_ss[1], d_ss[2],
                   d_g, jnp.float32(0.0)]
    # scalar stores to VMEM are unsupported (Mosaic) — broadcast each
    # scalar across a lane row; every lane carries the same total and
    # the wrapper reads lane 0
    dpar_ref[:, :] += jnp.stack(
        [jnp.full((128,), u, jnp.float32) for u in updates])


@partial(
    jax.jit,
    static_argnames=("vol_vol_samples", "vol_surf_samples", "short_vrls",
                     "phase_kind"),
)
def vrl_sum_pallas_bwd(
    ray_pack_g,   # (B, RAY_ROWS) with gbar in rows _GBAR..+2
    vrl_pack,     # (VRL_ROWS, N)
    tri_flat,     # (T*9,)
    med_pack,     # (1, 16)
    seed,         # (1,) i32 — MUST equal the forward's seed
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
):
    """Seed-replay backward pass (homogeneous unclustered). Returns
    (d_power (3, N), d_par (N_PAR,) [sig_t 0:3, sig_s 3:6, g 6],
    d_tau_eu_s (3, B))."""
    b = ray_pack_g.shape[0]
    n = vrl_pack.shape[1]
    n_tris = tri_flat.shape[0] // 9
    n_i = b // RAY_TILE
    grid = (n // VRL_TILE, n_i)

    kernel = partial(
        _bwd_kernel,
        n_tris=n_tris,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls,
        phase_kind=phase_kind,
    )
    d_pw, d_par, d_tau = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (VRL_ROWS, VRL_TILE), lambda j, i, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (RAY_TILE, RAY_ROWS), lambda j, i, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 16), lambda j, i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (3, VRL_TILE), lambda j, i, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (N_PAR, 128), lambda j, i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (3, RAY_TILE), lambda j, i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((N_PAR, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, b), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(tri_flat, seed, vrl_pack, ray_pack_g, med_pack)
    return d_pw, d_par[:, 0], d_tau


@partial(
    jax.jit,
    static_argnames=("n_cp", "vol_vol_samples", "vol_surf_samples",
                     "short_vrls", "phase_kind", "uv_steps"),
)
def vrl_sum_pallas_hetero_bwd(
    ray_pack_g,   # (B, H_RAY_ROWS) with gbar rows set
    vrl_pack,     # (H_VRL_ROWS, N)
    tri_flat,     # (T*9,)
    med_pack,     # (1, 32)
    cp_pack,      # (3*n_cp, 128) — the SAME (scaled) factors the
                  # forward consumed
    seed,         # (1,) i32 — MUST equal the forward's seed
    n_cp: int,
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
    uv_steps: int = 4,
):
    """Seed-replay backward pass (heterogeneous unclustered). Returns
    (d_power (3, N), d_par (N_PAR_H,) [sig_t 0:3, sig_s 3:6, g 6,
    chan 7, dens 8 — dens is now only the cross-check channel],
    d_tau_eu_s (3, B), d_eod (NQ+1, B), d_vod (NQ+1, N),
    d_fac (3*n_cp, 128) — EXACT CP factor-table cotangents (round 5:
    the per-voxel route; chain to voxels with ops.cp.fit_medium_vjp)."""
    b = ray_pack_g.shape[0]
    n = vrl_pack.shape[1]
    n_tris = tri_flat.shape[0] // 9
    assert n_cp % 8 == 0, n_cp  # dfac block rows need a sublane mult
    grid = (n // VRL_TILE, b // RAY_TILE)

    kernel = partial(
        _bwd_kernel,
        n_tris=n_tris,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls,
        phase_kind=phase_kind,
        hetero=True, n_cp=n_cp, uv_steps=uv_steps,
    )

    def kfn(tri_ref, seed_ref, vrl_ref, ray_ref, med_ref, cp_ref,
            dpw_ref, dpar_ref, dtau_ref, deod_ref, dvod_ref, dfac_ref,
            *scat_scr):
        kernel(tri_ref, seed_ref, vrl_ref, ray_ref, med_ref,
               dpw_ref, dpar_ref, dtau_ref,
               cp_ref=cp_ref, deod_ref=deod_ref, dvod_ref=dvod_ref,
               dfac_ref=dfac_ref, scat_scr=scat_scr)

    d_pw, d_par, d_tau, d_eod, d_vod, d_fac = pl.pallas_call(
        kfn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (H_VRL_ROWS, VRL_TILE), lambda j, i, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (RAY_TILE, H_RAY_ROWS), lambda j, i, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 32), lambda j, i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (cp_pack.shape[0], 128), lambda j, i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (3, VRL_TILE), lambda j, i, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (N_PAR_H, 128), lambda j, i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (3, RAY_TILE), lambda j, i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (OD_PAD, RAY_TILE), lambda j, i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (OD_PAD, VRL_TILE), lambda j, i, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (3 * n_cp, 128), lambda j, i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.int32),
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.int32),
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.int32),
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((N_PAR_H, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, b), jnp.float32),
            jax.ShapeDtypeStruct((OD_PAD, b), jnp.float32),
            jax.ShapeDtypeStruct((OD_PAD, n), jnp.float32),
            jax.ShapeDtypeStruct((3 * n_cp, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(tri_flat, seed, vrl_pack, ray_pack_g, med_pack, cp_pack)
    return (d_pw, d_par[:, 0], d_tau,
            d_eod[:NQ + 1], d_vod[:NQ + 1], d_fac)


@partial(
    jax.jit,
    static_argnames=("vol_vol_samples", "vol_surf_samples", "short_vrls",
                     "phase_kind"),
)
def vrl_sum_pallas_clustered_bwd(
    ray_pack_g,   # (B, RAY_ROWS), rays grouped by slice, gbar rows set
    vrl_tables,   # (S, VRL_ROWS, VRL_TILE) per-slice tables
    tile_slice,   # (B // RAY_TILE,) i32
    tri_flat,     # (T*9,)
    med_pack,     # (1, 16)
    seed,         # (1,) i32 — MUST equal the forward's seed
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
):
    """Seed-replay backward pass (homogeneous clustered). Returns
    (d_table_pw (n_tiles, 3, VRL_TILE) per-ray-tile table-power
    cotangents — segment-sum by tile_slice on the XLA side,
    d_par (N_PAR,), d_tau_eu_s (3, B))."""
    b = ray_pack_g.shape[0]
    n_tris = tri_flat.shape[0] // 9
    n_tiles = b // RAY_TILE
    grid = (n_tiles,)

    kernel = partial(
        _bwd_kernel,
        n_tris=n_tris,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls,
        phase_kind=phase_kind,
        clustered=True,
    )

    def kfn(tri_ref, seed_ref, tslice_ref, ray_ref, vrl_ref, med_ref,
            dpw_ref, dpar_ref, dtau_ref):
        kernel(tri_ref, seed_ref, vrl_ref, ray_ref, med_ref,
               dpw_ref, dpar_ref, dtau_ref)

    d_pw, d_par, d_tau = pl.pallas_call(
        kfn,
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
            out_specs=(
                pl.BlockSpec(
                    (1, 3, VRL_TILE), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (N_PAR, 128), lambda i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (3, RAY_TILE), lambda i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 3, VRL_TILE), jnp.float32),
            jax.ShapeDtypeStruct((N_PAR, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, b), jnp.float32),
        ),
    )(tri_flat, seed, tile_slice, ray_pack_g, vrl_tables, med_pack)
    return d_pw, d_par[:, 0], d_tau


@partial(
    jax.jit,
    static_argnames=("n_cp", "vol_vol_samples", "vol_surf_samples",
                     "short_vrls", "phase_kind", "uv_steps"),
)
def vrl_sum_pallas_hetero_clustered_bwd(
    ray_pack_g,   # (B, H_RAY_ROWS), rays grouped by slice, gbar set
    vrl_tables,   # (S, H_VRL_ROWS, VRL_TILE)
    tile_slice,   # (B // RAY_TILE,) i32
    tri_flat,     # (T*9,)
    med_pack,     # (1, 32)
    cp_pack,      # (3*n_cp, 128)
    seed,         # (1,) i32
    n_cp: int,
    vol_vol_samples: int = 2,
    vol_surf_samples: int = 2,
    short_vrls: bool = True,
    phase_kind: int = 0,
    uv_steps: int = 4,
):
    """Seed-replay backward pass (heterogeneous clustered). Returns
    (d_table_pw (n_tiles, 3, 128), d_par (N_PAR_H,), d_tau (3, B),
    d_eod (NQ+1, B), d_table_vod (n_tiles, NQ+1, 128),
    d_fac (3*n_cp, 128) — exact CP factor cotangents, round 5)."""
    b = ray_pack_g.shape[0]
    n_tris = tri_flat.shape[0] // 9
    n_tiles = b // RAY_TILE
    assert n_cp % 8 == 0, n_cp
    grid = (n_tiles,)

    kernel = partial(
        _bwd_kernel,
        n_tris=n_tris,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls,
        phase_kind=phase_kind,
        clustered=True, hetero=True, n_cp=n_cp, uv_steps=uv_steps,
    )

    def kfn(tri_ref, seed_ref, tslice_ref, ray_ref, vrl_ref, med_ref,
            cp_ref, dpw_ref, dpar_ref, dtau_ref, deod_ref, dvod_ref,
            dfac_ref, *scat_scr):
        kernel(tri_ref, seed_ref, vrl_ref, ray_ref, med_ref,
               dpw_ref, dpar_ref, dtau_ref,
               cp_ref=cp_ref, deod_ref=deod_ref, dvod_ref=dvod_ref,
               dfac_ref=dfac_ref, scat_scr=scat_scr)

    d_pw, d_par, d_tau, d_eod, d_vod, d_fac = pl.pallas_call(
        kfn,
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
            out_specs=(
                pl.BlockSpec(
                    (1, 3, VRL_TILE), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (N_PAR_H, 128), lambda i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (3, RAY_TILE), lambda i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (OD_PAD, RAY_TILE), lambda i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, OD_PAD, VRL_TILE), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (3 * n_cp, 128), lambda i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.int32),
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.int32),
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.int32),
                pltpu.VMEM((RAY_TILE, VRL_TILE), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 3, VRL_TILE), jnp.float32),
            jax.ShapeDtypeStruct((N_PAR_H, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, b), jnp.float32),
            jax.ShapeDtypeStruct((OD_PAD, b), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, OD_PAD, VRL_TILE),
                                 jnp.float32),
            jax.ShapeDtypeStruct((3 * n_cp, 128), jnp.float32),
        ),
    )(tri_flat, seed, tile_slice, ray_pack_g, vrl_tables, med_pack,
      cp_pack)
    return (d_pw, d_par[:, 0], d_tau, d_eod[:NQ + 1],
            d_vod[:, :NQ + 1, :], d_fac)


# ---------------------------------------------------------------------------
# custom_vjp wrappers: the differentiable kernel entry points. Gradients
# flow to the VRL power rows (or clustered tables), the medium scalars,
# the per-ray eye-surface tau rows, and (hetero) the cumulative-OD
# table rows + a global in-kernel density scale; geometry rows are
# detached (the detached-sampling contract of media/api.py).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def vrl_sum_diff(ray_pack, vrl_pack, med_pack, tri_flat, seed,
                 vol_vol_samples=2, vol_surf_samples=2, short_vrls=True,
                 phase_kind=0):
    from alvrl_tpu.ops.vrl_pallas import vrl_sum_pallas

    return vrl_sum_pallas(
        ray_pack, vrl_pack, tri_flat, med_pack, seed,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls, phase_kind=phase_kind)


def _vsd_fwd(ray_pack, vrl_pack, med_pack, tri_flat, seed,
             vol_vol_samples, vol_surf_samples, short_vrls, phase_kind):
    out = vrl_sum_diff(ray_pack, vrl_pack, med_pack, tri_flat, seed,
                       vol_vol_samples, vol_surf_samples, short_vrls,
                       phase_kind)
    return out, (ray_pack, vrl_pack, med_pack, tri_flat, seed)


def _vsd_bwd(vol_vol_samples, vol_surf_samples, short_vrls, phase_kind,
             res, gbar):
    ray_pack, vrl_pack, med_pack, tri_flat, seed = res
    ray_pack_g = ray_pack.at[:, _GBAR:_GBAR + 3].set(gbar.T)
    d_pw, d_par, d_tau = vrl_sum_pallas_bwd(
        ray_pack_g, vrl_pack, tri_flat, med_pack, seed,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls, phase_kind=phase_kind)
    d_ray = jnp.zeros_like(ray_pack).at[:, _TAU:_TAU + 3].set(d_tau.T)
    d_vrl = jnp.zeros_like(vrl_pack).at[_VP:_VP + 3, :].set(d_pw)
    d_med = (jnp.zeros_like(med_pack)
             .at[0, 0:3].set(d_par[0:3])
             .at[0, 3:6].set(d_par[3:6])
             .at[0, 6].set(d_par[6]))
    return d_ray, d_vrl, d_med, jnp.zeros_like(tri_flat), None


vrl_sum_diff.defvjp(_vsd_fwd, _vsd_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def vrl_sum_hetero_diff(ray_pack, vrl_pack, med_pack, cp_pack,
                        dens_scale, tri_flat, seed,
                        n_cp, vol_vol_samples=2, vol_surf_samples=2,
                        short_vrls=True, phase_kind=0, uv_steps=4):
    """Differentiable heterogeneous unclustered kernel. dens_scale is a
    relative multiplier on the CP density factors (exact forward: CP is
    linear in the z-factor block); its gradient is the in-kernel
    density-scale cotangent plus whatever the caller chains through the
    OD-table rows. cp_pack itself is detached (see module docstring)."""
    from alvrl_tpu.ops.vrl_pallas import vrl_sum_pallas_hetero

    cp_eff = cp_pack.at[:n_cp].multiply(dens_scale)
    return vrl_sum_pallas_hetero(
        ray_pack, vrl_pack, tri_flat, med_pack, cp_eff, seed,
        n_cp=n_cp, vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls, phase_kind=phase_kind, uv_steps=uv_steps)


def _vshd_fwd(ray_pack, vrl_pack, med_pack, cp_pack, dens_scale,
              tri_flat, seed, n_cp, vol_vol_samples, vol_surf_samples,
              short_vrls, phase_kind, uv_steps):
    out = vrl_sum_hetero_diff(
        ray_pack, vrl_pack, med_pack, cp_pack, dens_scale, tri_flat,
        seed, n_cp, vol_vol_samples, vol_surf_samples, short_vrls,
        phase_kind, uv_steps)
    return out, (ray_pack, vrl_pack, med_pack, cp_pack, dens_scale,
                 tri_flat, seed)


def _vshd_bwd(n_cp, vol_vol_samples, vol_surf_samples, short_vrls,
              phase_kind, uv_steps, res, gbar):
    (ray_pack, vrl_pack, med_pack, cp_pack, dens_scale, tri_flat,
     seed) = res
    cp_eff = cp_pack.at[:n_cp].multiply(dens_scale)
    ray_pack_g = ray_pack.at[:, _GBAR:_GBAR + 3].set(gbar.T)
    d_pw, d_par, d_tau, d_eod, d_vod, d_fac = vrl_sum_pallas_hetero_bwd(
        ray_pack_g, vrl_pack, tri_flat, med_pack, cp_eff, seed,
        n_cp=n_cp, vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls, phase_kind=phase_kind, uv_steps=uv_steps)
    d_ray = (jnp.zeros_like(ray_pack)
             .at[:, _TAU:_TAU + 3].set(d_tau.T)
             .at[:, _EOD:_EOD + NQ + 1].set(d_eod.T))
    d_vrl = (jnp.zeros_like(vrl_pack)
             .at[_VP:_VP + 3, :].set(d_pw)
             .at[_VOD:_VOD + NQ + 1, :].set(d_vod))
    d_med = (jnp.zeros_like(med_pack)
             .at[0, 0:3].set(d_par[0:3])
             .at[0, 3:6].set(d_par[3:6])
             .at[0, 6].set(d_par[6])
             .at[0, 7].set(d_par[7]))
    # round 5: d_fac is the EXACT cotangent of cp_eff — chain through
    # cp_eff = cp_pack.at[:n_cp] * dens_scale. The cp_pack cotangent is
    # per-entry (the per-voxel route: ops.cp.fit_medium_vjp maps it to
    # the density voxels); the dens_scale cotangent is the z-block
    # inner product (equal to the legacy in-kernel d_par[8]/dens_scale
    # channel — kept as a cross-check, see test_pallas_bwd).
    d_cp = d_fac.at[:n_cp].multiply(dens_scale)
    d_scale = jnp.sum(d_fac[:n_cp] * cp_pack[:n_cp])
    return (d_ray, d_vrl, d_med, d_cp, d_scale,
            jnp.zeros_like(tri_flat), None)


vrl_sum_hetero_diff.defvjp(_vshd_fwd, _vshd_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def vrl_sum_clustered_diff(ray_pack, vrl_tables, tile_slice, med_pack,
                           tri_flat, seed,
                           vol_vol_samples=2, vol_surf_samples=2,
                           short_vrls=True, phase_kind=0):
    """Differentiable homogeneous clustered launch: gradients flow to
    the per-slice table power rows (chain to vrls.power x weights
    through the XLA table construction), the medium scalars, and the
    per-ray tau rows."""
    from alvrl_tpu.ops.vrl_pallas import vrl_sum_pallas_clustered

    return vrl_sum_pallas_clustered(
        ray_pack, vrl_tables, tile_slice, tri_flat, med_pack, seed,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls, phase_kind=phase_kind)


def _vscd_fwd(ray_pack, vrl_tables, tile_slice, med_pack, tri_flat,
              seed, vol_vol_samples, vol_surf_samples, short_vrls,
              phase_kind):
    out = vrl_sum_clustered_diff(
        ray_pack, vrl_tables, tile_slice, med_pack, tri_flat, seed,
        vol_vol_samples, vol_surf_samples, short_vrls, phase_kind)
    return out, (ray_pack, vrl_tables, tile_slice, med_pack, tri_flat,
                 seed)


def _vscd_bwd(vol_vol_samples, vol_surf_samples, short_vrls, phase_kind,
              res, gbar):
    ray_pack, vrl_tables, tile_slice, med_pack, tri_flat, seed = res
    ray_pack_g = ray_pack.at[:, _GBAR:_GBAR + 3].set(gbar.T)
    d_pw_t, d_par, d_tau = vrl_sum_pallas_clustered_bwd(
        ray_pack_g, vrl_tables, tile_slice, tri_flat, med_pack, seed,
        vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls, phase_kind=phase_kind)
    # per-ray-tile table cotangents -> per-slice scatter-add
    d_tables = jnp.zeros_like(vrl_tables).at[tile_slice, _VP:_VP + 3, :
                                             ].add(d_pw_t)
    d_ray = jnp.zeros_like(ray_pack).at[:, _TAU:_TAU + 3].set(d_tau.T)
    d_med = (jnp.zeros_like(med_pack)
             .at[0, 0:3].set(d_par[0:3])
             .at[0, 3:6].set(d_par[3:6])
             .at[0, 6].set(d_par[6]))
    return (d_ray, d_tables, None, d_med, jnp.zeros_like(tri_flat),
            None)


vrl_sum_clustered_diff.defvjp(_vscd_fwd, _vscd_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def vrl_sum_hetero_clustered_diff(ray_pack, vrl_tables, tile_slice,
                                  med_pack, cp_pack, dens_scale,
                                  tri_flat, seed,
                                  n_cp, vol_vol_samples=2,
                                  vol_surf_samples=2, short_vrls=True,
                                  phase_kind=0, uv_steps=4):
    """Differentiable heterogeneous clustered launch."""
    from alvrl_tpu.ops.vrl_pallas import vrl_sum_pallas_hetero_clustered

    cp_eff = cp_pack.at[:n_cp].multiply(dens_scale)
    return vrl_sum_pallas_hetero_clustered(
        ray_pack, vrl_tables, tile_slice, tri_flat, med_pack, cp_eff,
        seed, n_cp=n_cp, vol_vol_samples=vol_vol_samples,
        vol_surf_samples=vol_surf_samples,
        short_vrls=short_vrls, phase_kind=phase_kind, uv_steps=uv_steps)


def _vshcd_fwd(ray_pack, vrl_tables, tile_slice, med_pack, cp_pack,
               dens_scale, tri_flat, seed, n_cp, vol_vol_samples,
               vol_surf_samples, short_vrls, phase_kind, uv_steps):
    out = vrl_sum_hetero_clustered_diff(
        ray_pack, vrl_tables, tile_slice, med_pack, cp_pack, dens_scale,
        tri_flat, seed, n_cp, vol_vol_samples, vol_surf_samples,
        short_vrls, phase_kind, uv_steps)
    return out, (ray_pack, vrl_tables, tile_slice, med_pack, cp_pack,
                 dens_scale, tri_flat, seed)


def _vshcd_bwd(n_cp, vol_vol_samples, vol_surf_samples, short_vrls,
               phase_kind, uv_steps, res, gbar):
    (ray_pack, vrl_tables, tile_slice, med_pack, cp_pack, dens_scale,
     tri_flat, seed) = res
    cp_eff = cp_pack.at[:n_cp].multiply(dens_scale)
    ray_pack_g = ray_pack.at[:, _GBAR:_GBAR + 3].set(gbar.T)
    d_pw_t, d_par, d_tau, d_eod, d_vod_t, d_fac = \
        vrl_sum_pallas_hetero_clustered_bwd(
            ray_pack_g, vrl_tables, tile_slice, tri_flat, med_pack,
            cp_eff, seed, n_cp=n_cp,
            vol_vol_samples=vol_vol_samples,
            vol_surf_samples=vol_surf_samples,
            short_vrls=short_vrls, phase_kind=phase_kind,
            uv_steps=uv_steps)
    d_tables = (jnp.zeros_like(vrl_tables)
                .at[tile_slice, _VP:_VP + 3, :].add(d_pw_t)
                .at[tile_slice, _VOD:_VOD + NQ + 1, :].add(d_vod_t))
    d_ray = (jnp.zeros_like(ray_pack)
             .at[:, _TAU:_TAU + 3].set(d_tau.T)
             .at[:, _EOD:_EOD + NQ + 1].set(d_eod.T))
    d_med = (jnp.zeros_like(med_pack)
             .at[0, 0:3].set(d_par[0:3])
             .at[0, 3:6].set(d_par[3:6])
             .at[0, 6].set(d_par[6])
             .at[0, 7].set(d_par[7]))
    # round 5: exact per-entry CP cotangents (see _vshd_bwd)
    d_cp = d_fac.at[:n_cp].multiply(dens_scale)
    d_scale = jnp.sum(d_fac[:n_cp] * cp_pack[:n_cp])
    return (d_ray, d_tables, None, d_med, d_cp,
            d_scale, jnp.zeros_like(tri_flat), None)


vrl_sum_hetero_clustered_diff.defvjp(_vshcd_fwd, _vshcd_bwd)
