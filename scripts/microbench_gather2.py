"""Follow-up: exact render gather patterns — 3D advanced indexing vs
flattened 1D gather, with indices computed from float coords as in
lookup_density_nn, returning the full gathered array."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp


def bench(label, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    return dt


def main():
    Z = Y = X = 95
    grid3 = jax.random.uniform(jax.random.key(0), (Z, Y, X), jnp.float32)
    gflat = grid3.reshape(-1)
    N = 1 << 22
    p = jax.random.uniform(jax.random.key(1), (N, 3), jnp.float32)

    def idx3(p):
        ix = jnp.clip(jnp.round(p[..., 0] * (X - 1)).astype(jnp.int32), 0, X - 1)
        iy = jnp.clip(jnp.round(p[..., 1] * (Y - 1)).astype(jnp.int32), 0, Y - 1)
        iz = jnp.clip(jnp.round(p[..., 2] * (Z - 1)).astype(jnp.int32), 0, Z - 1)
        return iz, iy, ix

    @jax.jit
    def adv3(g, p):
        iz, iy, ix = idx3(p)
        return g[iz, iy, ix]

    @jax.jit
    def flat(g, p):
        iz, iy, ix = idx3(p)
        return g[(iz * Y + iy) * X + ix]

    @jax.jit
    def flat_sorted_shape(g, p):  # flat but 2D-shaped (as in render tiles)
        q = p.reshape(2048, 2048, 3)
        iz, iy, ix = idx3(q)
        return g[(iz * Y + iy) * X + ix]

    for label, fn, g in (("3d-advanced-index", adv3, grid3),
                         ("flat-1d", flat, gflat),
                         ("flat-1d (2d-shaped)", flat_sorted_shape, gflat)):
        dt = bench(label, fn, g, p)
        print(f"{label:28s} {dt*1e3:8.3f} ms  {N/dt/1e6:10.1f} M/s")

    # and the real function from the codebase on realistic tile shapes
    from alvrl_tpu.media.heterogeneous import make_grid_medium, lookup_density_nn, lookup_density
    med = make_grid_medium(jax.random.uniform(jax.random.key(3), (48, 48, 48)),
                           (1.0, 1.0, 1.0), (0.9, 0.9, 0.9))
    pts = jax.random.uniform(jax.random.key(4), (1024, 64, 4, 3),
                             jnp.float32) * 2 - 1

    f_nn = jax.jit(lookup_density_nn)
    f_tri = jax.jit(lookup_density)
    n_pts = pts.size // 3
    dt = bench("lookup_density_nn (tile)", f_nn, med, pts)
    print(f"{'lookup_density_nn (tile)':28s} {dt*1e3:8.3f} ms  {n_pts/dt/1e6:10.1f} M/s")
    dt = bench("lookup_density trilinear", f_tri, med, pts)
    print(f"{'lookup_density trilinear':28s} {dt*1e3:8.3f} ms  {n_pts/dt/1e6:10.1f} M/s")


if __name__ == "__main__":
    main()
