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


def _als(T, rank, iters=60, seed=0):
    rs = np.random.default_rng(seed)
    nz, ny, nx = T.shape
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
