"""CP (CANDECOMP/PARAFAC) factorization of density grids for the
heterogeneous Pallas render kernel.

TPU rationale: Mosaic's per-lane gather (tpu.dynamic_gather) addresses
at most a 128-entry table per O(1) vector op, so a 95^3 supersampled
grid cannot be randomly gathered at VPU speed inside a kernel. A
rank-K separable decomposition

    density[z, y, x] ~= sum_k A[k, z] * B[k, y] * C[k, x]

turns every density lookup into 3K O(1) lane-gathers from 128-entry
1D factor tables (each axis of the 2x-supersampled grid has 2*res-1
<= 128 entries for res <= 64). Measured on the config-4 benchmark
plume (48^3): rank 48 fits the supersampled field to 3.6e-4 relative
RMS — under the <5e-4 bias budget the kernel targets vs the XLA path
(which reads the same supersampled grid through nearest lookups,
media/heterogeneous.py lookup_density_nn).

The fit runs ONCE per density grid on the host (ALS, numpy) and is
cached by content digest. `fit_error` is returned so callers can gate:
fields that do not compress (fit error above threshold) fall back to
the XLA render path.
"""

from __future__ import annotations

import hashlib

import numpy as np

_CACHE: dict = {}

MAX_AXIS = 128  # lane-gather table capacity


def _als(T, rank, iters=60, seed=0, init=None):
    rs = np.random.default_rng(seed)
    nz, ny, nx = T.shape
    if init is not None:
        A, B, C = (np.array(f, np.float64) for f in init)
    else:
        A = rs.uniform(0.1, 1.0, (nz, rank))
        B = rs.uniform(0.1, 1.0, (ny, rank))
        C = rs.uniform(0.1, 1.0, (nx, rank))
    T0 = T.reshape(nz, -1)
    T1 = np.moveaxis(T, 1, 0).reshape(ny, -1)
    T2 = np.moveaxis(T, 2, 0).reshape(nx, -1)
    for _ in range(iters):
        KR = np.einsum("yk,xk->yxk", B, C).reshape(-1, rank)
        A = T0 @ KR @ np.linalg.pinv((B.T @ B) * (C.T @ C))
        KR = np.einsum("zk,xk->zxk", A, C).reshape(-1, rank)
        B = T1 @ KR @ np.linalg.pinv((A.T @ A) * (C.T @ C))
        KR = np.einsum("zk,yk->zyk", A, B).reshape(-1, rank)
        C = T2 @ KR @ np.linalg.pinv((A.T @ A) * (B.T @ B))
    return A, B, C


def reconstruct(A, B, C):
    return np.einsum("zk,yk,xk->zyx", A, B, C)


def fit_density(density_ss: np.ndarray, rank: int = 48, iters: int = 60):
    """Fit the (2Z-1, 2Y-1, 2X-1) supersampled density. Returns
    (factors (3, rank, 128) float32 — z/y/x axis tables, zero-padded
    beyond each axis length — and the relative RMS fit error).
    Cached by grid content."""
    density_ss = np.asarray(density_ss, np.float32)
    if max(density_ss.shape) > MAX_AXIS:
        raise ValueError(
            f"axis lengths {density_ss.shape} exceed the lane-gather "
            f"table capacity {MAX_AXIS} (grid res > 64)")
    key = (hashlib.sha1(density_ss.tobytes()).hexdigest(), rank)
    if key in _CACHE:
        return _CACHE[key]
    A, B, C = _als(density_ss.astype(np.float64), rank, iters=iters)
    R = reconstruct(A, B, C)
    denom = max(float(np.sqrt((density_ss ** 2).mean())), 1e-12)
    err = float(np.sqrt(((R - density_ss) ** 2).mean())) / denom
    out = np.zeros((3, rank, MAX_AXIS), np.float32)
    out[0, :, : A.shape[0]] = A.T
    out[1, :, : B.shape[0]] = B.T
    out[2, :, : C.shape[0]] = C.T
    _CACHE[key] = (out, err)
    return out, err


def fit_medium(med, rank: int = 48):
    """fit_density of a GridMedium's supersampled grid (concrete
    arrays only — host-side, outside jit). Scale folded into the
    factors so the kernel reads scaled density directly."""
    import numpy as _np

    from alvrl_tpu.media import heterogeneous as gmed

    ss = _np.asarray(gmed._upsample2(med.density))
    factors, err = fit_density(ss, rank=rank)
    f2 = factors.copy()
    f2[0] *= float(_np.cbrt(float(med.scale)))
    f2[1] *= float(_np.cbrt(float(med.scale)))
    f2[2] *= float(_np.cbrt(float(med.scale)))
    return f2, err


# ---------------------------------------------------------------------------
# Implicit VJP of the CP fit (round 5, VERDICT r04 next-round item 1).
#
# The kernel's backward pass returns EXACT cotangents g = (gA, gB, gC)
# of the factor tables. The factors came from the least-squares fit
#     theta(ss) = argmin_theta || ss - M(theta) ||_F^2,
#     M(A,B,C) = sum_k A_k (x) B_k (x) C_k,
# so the chain to the fit's target tensor is the implicit derivative of
# the argmin: at the optimum (residual ~ 0 on the fields the render
# path accepts — fit_error gates the kernel path), J^T(ss - M) = 0
# differentiates to  d theta = H^+ J^T d ss  with H = J^T J, giving
#     d_ss = J H^+ g.
# H has Khatri-Rao structure: its matvec needs only KxK Gram matrices
# (no 18k^2 materialization), so a plain CG solves it in milliseconds.
# The render is gauge-invariant along the CP scaling indeterminacy, so
# g lies in range(H) and CG from 0 stays there; a tiny ridge guards f32
# kernel noise. d_ss is then the gradient wrt the supersampled grid,
# which chains to raw voxels through _upsample2's linear VJP
# (fit_medium_vjp below).
# ---------------------------------------------------------------------------


def _up1_np(a, axis):
    """numpy twin of media.heterogeneous._up1 (same arithmetic)."""
    a = np.moveaxis(np.asarray(a), axis, 0)
    n = a.shape[0]
    out = np.zeros((2 * n - 1,) + a.shape[1:], a.dtype)
    out[::2] = a
    out[1::2] = 0.5 * (a[:-1] + a[1:])
    return np.moveaxis(out, 0, axis)


def _upsample2_np(d):
    return _up1_np(_up1_np(_up1_np(d, 0), 1), 2)


def _up1_T(dy, axis):
    """numpy adjoint of media.heterogeneous._up1 (midpoint insertion,
    n -> 2n-1): dx[i] = dy[2i] + 0.5 dy[2i-1] + 0.5 dy[2i+1]. Kept in
    numpy so the host-side gradient chain never dispatches through the
    (high-latency, tunnel-attached) accelerator."""
    dy = np.moveaxis(np.asarray(dy), axis, 0)
    n = (dy.shape[0] + 1) // 2
    dx = np.zeros((n,) + dy.shape[1:], dy.dtype)
    dx += 0.0
    dx[:] = dy[::2]
    mid = dy[1::2]
    dx[:-1] += 0.5 * mid
    dx[1:] += 0.5 * mid
    return np.moveaxis(dx, 0, axis)


def _upsample2_T(d_ss):
    """Adjoint of _upsample2 ((2Z-1,2Y-1,2X-1) cotangent -> (Z,Y,X))."""
    return _up1_T(_up1_T(_up1_T(d_ss, 2), 1), 0)


def _cp_fit_vjp_dense(A, B, C, gA, gB, gC, cg_iters=400, tol=1e-10,
                      ridge_rel=1e-12):
    """d_ss = J_M H^+ g at the fit (A (Z,K), B (Y,K), C (X,K), f64).
    Returns (d_ss (Z,Y,X) f64, cg_residual_rel)."""
    A, B, C = (np.asarray(f, np.float64) for f in (A, B, C))
    g = (np.asarray(gA, np.float64), np.asarray(gB, np.float64),
         np.asarray(gC, np.float64))
    GA, GB, GC = A.T @ A, B.T @ B, C.T @ C
    lam = ridge_rel * (np.trace(GB * GC) + np.trace(GA * GC)
                       + np.trace(GA * GB)) / max(A.shape[1], 1)

    def matvec(x):
        xA, xB, xC = x
        hA = xA @ (GB * GC) + A @ ((xB.T @ B) * GC + GB * (xC.T @ C))
        hB = xB @ (GA * GC) + B @ ((xA.T @ A) * GC + GA * (xC.T @ C))
        hC = xC @ (GA * GB) + C @ ((xA.T @ A) * GB + GA * (xB.T @ B))
        return (hA + lam * xA, hB + lam * xB, hC + lam * xC)

    def dot(u, v):
        return sum(float(np.sum(a * b)) for a, b in zip(u, v))

    x = tuple(np.zeros_like(gi) for gi in g)
    r = g
    p = tuple(ri.copy() for ri in r)
    rs = dot(r, r)
    g_norm = max(np.sqrt(rs), 1e-300)
    for _ in range(cg_iters):
        hp = matvec(p)
        alpha = rs / max(dot(p, hp), 1e-300)
        x = tuple(xi + alpha * pi for xi, pi in zip(x, p))
        r = tuple(ri - alpha * hi for ri, hi in zip(r, hp))
        rs_new = dot(r, r)
        if np.sqrt(rs_new) < tol * g_norm:
            rs = rs_new
            break
        p = tuple(ri + (rs_new / rs) * pi for ri, pi in zip(r, p))
        rs = rs_new
    xA, xB, xC = x
    d_ss = (np.einsum("zk,yk,xk->zyx", xA, B, C)
            + np.einsum("zk,yk,xk->zyx", A, xB, C)
            + np.einsum("zk,yk,xk->zyx", A, B, xC))
    return d_ss, float(np.sqrt(rs) / g_norm)


def fit_medium_vjp(med, rank: int = 48):
    """fit_medium plus the VJP closure to the raw density voxels.

    Returns (cp_pack (3*rank, 128) f32, fit_error,
             vjp(d_cp) -> (d_density (Z,Y,X) f32, d_scale float)):
    d_cp is the (3*rank, 128) factor cotangent from the backward
    kernel (vrl_sum_pallas_hetero_bwd's d_fac, already chained through
    any dens_scale multiplier). The closure runs the implicit CG solve
    in f64 on the host, then maps the supersampled-grid cotangent to
    voxels through _upsample2's linear VJP and splits off d_scale
    (the factors carry scale^(1/3) each, i.e. the fit target is
    ss_scaled = scale * upsample2(density))."""
    factors, err = fit_medium(med, rank)
    density = np.asarray(med.density, np.float32)
    scale = float(med.scale)
    nz, ny, nx = (2 * s - 1 for s in density.shape)
    cp_pack = np.asarray(factors, np.float32).reshape(3 * rank, MAX_AXIS)

    def vjp(d_cp):
        d_cp = np.asarray(d_cp, np.float64).reshape(3, rank, MAX_AXIS)
        A = factors[0, :, :nz].T
        B = factors[1, :, :ny].T
        C = factors[2, :, :nx].T
        gA = d_cp[0, :, :nz].T
        gB = d_cp[1, :, :ny].T
        gC = d_cp[2, :, :nx].T
        d_ss_scaled, _res = _cp_fit_vjp_dense(A, B, C, gA, gB, gC)
        ss = _upsample2_np(density).astype(np.float64)
        d_scale = float(np.sum(d_ss_scaled * ss))
        d_density = _upsample2_T(d_ss_scaled * scale)
        return np.asarray(d_density, np.float32), d_scale

    return cp_pack, err, vjp


class WarmCPFitter:
    """Per-step CP machinery for density-optimization loops.

    Each optimizer step changes the density, so the factors must be
    refit; cold ALS every step is wasteful and (worse) can hop between
    CP gauge branches, making consecutive gradients inconsistent.
    This fitter warm-starts ALS from the previous step's factors (the
    continuous argmin branch the implicit VJP differentiates) and
    returns the same (cp_pack, err, vjp) contract as fit_medium_vjp.
    """

    def __init__(self, rank: int = 48, iters_cold: int = 120,
                 iters_warm: int = 25, cg_iters: int = 600,
                 ridge_rel: float = 1e-10):
        self.rank = rank
        self.iters_cold = iters_cold
        self.iters_warm = iters_warm
        self.cg_iters = cg_iters
        self.ridge_rel = ridge_rel
        self._factors = None  # (A (Z,K), B (Y,K), C (X,K)) of scaled ss

    @staticmethod
    def _reseed_dead(factors, tgt_rms, rng):
        """Revive numerically dead ranks: a column that reaches ~0 in
        any factor can never grow back under multiplicative ALS
        updates, so a fit warm-started from a low-rank field (e.g. the
        constant init of an optimization loop) would stay stuck while
        the target grows structure. Dead columns are reseeded with
        small random values so ALS can recruit them when needed."""
        A, B, C = factors
        prod = (np.linalg.norm(A, axis=0) * np.linalg.norm(B, axis=0)
                * np.linalg.norm(C, axis=0))
        dead = prod < 1e-10 * max(prod.max(), 1e-30)
        if dead.any():
            s = max(tgt_rms, 1e-6) ** (1.0 / 3.0) * 1e-2
            for F in (A, B, C):
                F[:, dead] = s * rng.uniform(0.5, 1.0,
                                             (F.shape[0],
                                              int(dead.sum())))
        return A, B, C

    def fit(self, density, scale=1.0):
        """density: (Z,Y,X) concrete array. Returns (cp_pack
        (3*rank, 128) f32 — scale folded, err, vjp(d_cp) ->
        (d_density, d_scale))."""
        density = np.asarray(density, np.float32)
        scale = float(scale)
        ss = _upsample2_np(density).astype(np.float64)
        ss_scaled = scale * ss
        if max(ss.shape) > MAX_AXIS:
            raise ValueError(f"axis {ss.shape} > {MAX_AXIS}")
        rng = np.random.default_rng(0)
        tgt_rms = float(np.sqrt((ss_scaled ** 2).mean()))
        if self._factors is None:
            A, B, C = _als(ss_scaled, self.rank, iters=self.iters_cold,
                           seed=0)
        else:
            init = self._reseed_dead(
                tuple(np.array(f) for f in self._factors), tgt_rms, rng)
            A, B, C = _als(ss_scaled, self.rank, iters=self.iters_warm,
                           init=init)

        def rel_err(A_, B_, C_):
            R = reconstruct(A_, B_, C_)
            return float(np.sqrt(((R - ss_scaled) ** 2).mean())) \
                / max(tgt_rms, 1e-12)

        err = rel_err(A, B, C)
        if self._factors is not None and err > 0.02:
            # warm branch lost the field (e.g. dead-rank recruitment
            # too slow for a fast-changing target): cold refit
            A2, B2, C2 = _als(ss_scaled, self.rank,
                              iters=self.iters_cold, seed=0)
            err2 = rel_err(A2, B2, C2)
            if err2 < err:
                A, B, C, err = A2, B2, C2, err2
        self._factors = (A, B, C)
        nz, ny, nx = ss.shape
        pack = np.zeros((3, self.rank, MAX_AXIS), np.float32)
        pack[0, :, :nz] = A.T
        pack[1, :, :ny] = B.T
        pack[2, :, :nx] = C.T
        cp_pack = pack.reshape(3 * self.rank, MAX_AXIS)

        def vjp(d_cp):
            d_cp = np.asarray(d_cp, np.float64).reshape(
                3, self.rank, MAX_AXIS)
            d_ss_scaled, _res = _cp_fit_vjp_dense(
                A, B, C, d_cp[0, :, :nz].T, d_cp[1, :, :ny].T,
                d_cp[2, :, :nx].T, cg_iters=self.cg_iters,
                ridge_rel=self.ridge_rel)
            d_scale = float(np.sum(d_ss_scaled * ss))
            d_density = _upsample2_T(d_ss_scaled * scale)
            return np.asarray(d_density, np.float32), d_scale

        return cp_pack, err, vjp
