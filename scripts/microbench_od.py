"""Microbench optical_depth in render-like context: fori_loop vs
unrolled accumulation, inside a lax.map over tiles (as the clustered
render runs it)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.media import heterogeneous as gmed
from alvrl_tpu.media import api as mapi


def bench(label, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return dt


def od_unrolled(med, p0, p1, n_steps=4):
    delta = p1 - p0
    dist = jnp.linalg.norm(delta, axis=-1)
    acc = jnp.zeros(jnp.shape(dist), jnp.float32)
    for i in range(n_steps):
        t = (i + 0.5) / n_steps
        acc = acc + gmed._lookup_quad(med, p0 + t * delta)
    return acc * dist / n_steps


def od_stacked(med, p0, p1, n_steps=4):
    # materialize (batch, n_steps) sample points; one big gather
    delta = p1 - p0
    dist = jnp.linalg.norm(delta, axis=-1)
    t = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
    p = p0[..., None, :] + t[:, None] * delta[..., None, :]
    dens = gmed._lookup_quad(med, p)
    return jnp.sum(dens, axis=-1) * dist / n_steps


def main():
    med = gmed.make_grid_medium(
        np.random.default_rng(0).random((48, 48, 48), np.float32),
        (1.0, 1.0, 1.0), (0.9, 0.9, 0.9))
    med = mapi.prepare(med)

    n_tiles, tile, cmax, S = 8, 1024, 64, 4
    key = jax.random.key(0)
    p0 = jax.random.uniform(key, (n_tiles, tile, cmax, S, 3)) * 2 - 1
    p1 = jax.random.uniform(jax.random.key(1), (n_tiles, tile, cmax, S, 3)) * 2 - 1
    npts = n_tiles * tile * cmax * S * 4  # 4 quadrature steps
    print(f"total lookups per call: {npts/1e6:.1f} M")

    def run(od_fn):
        @jax.jit
        def f(p0, p1):
            def tile_fn(args):
                a, b = args
                return od_fn(med, a, b)
            return jax.lax.map(tile_fn, (p0, p1))
        return f

    dt = bench("fori_loop (current)", run(gmed.optical_depth), p0, p1)
    print(f"  -> {npts/dt/1e6:10.1f} M lookups/s")
    dt = bench("unrolled", run(od_unrolled), p0, p1)
    print(f"  -> {npts/dt/1e6:10.1f} M lookups/s")
    dt = bench("stacked big-gather", run(od_stacked), p0, p1)
    print(f"  -> {npts/dt/1e6:10.1f} M lookups/s")


if __name__ == "__main__":
    main()
