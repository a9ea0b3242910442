"""Microbenchmark of density-lookup (gather) strategies on TPU.

The config-4 hetero render is gather-bound: each VRL pair-sample does
~6 scattered reads of a (2Z-1,2Y-1,2X-1) supersampled density grid
(4 U<->V quadrature midpoints + sigma_s at U and V). This measures the
candidate primitives at render-relevant sizes so the kernel redesign is
driven by data:

  1. xla-gather:        d = grid_flat[idx]               (current path)
  2. onehot-mxu:        one-hot(idx_small) @ coarse_table (MXU gather)
  3. slab-then-onehot:  factorized 2-level one-hot
  4. pallas scalar loop (if feasible): per-element loads

Run on the real chip: python scripts/microbench_gather.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    return label, dt, out


def main():
    key = jax.random.key(0)
    Z = Y = X = 95  # supersampled 48^3 grid
    M = Z * Y * X
    grid = jax.random.uniform(key, (M,), jnp.float32)
    N = 1 << 22  # ~4.2M lookups per call
    idx = jax.random.randint(jax.random.key(1), (N,), 0, M, jnp.int32)

    @jax.jit
    def xla_gather(g, i):
        return jnp.sum(g[i])

    label, dt, _ = bench("xla-gather (4.2M from 857k)", xla_gather, grid, idx)
    print(f"{label:42s} {dt*1e3:8.2f} ms  {N/dt/1e6:9.1f} M/s")

    # one-hot MXU gather into small tables of varying size
    for Msmall in (512, 2048, 8192):
        tab = grid[:Msmall]
        idx_s = idx % Msmall
        NB = 1 << 16  # block size for the one-hot
        nblocks = N // NB

        @jax.jit
        def onehot_gather(tab, idx_s):
            def body(c, ib):
                oh = (ib[:, None] == jnp.arange(Msmall)[None, :]).astype(
                    jnp.float32)
                return c + jnp.sum(oh @ tab[:, None]), None
            c, _ = jax.lax.scan(body, 0.0, idx_s.reshape(nblocks, NB))
            return c

        label, dt, _ = bench(f"onehot-mxu (table {Msmall})", onehot_gather,
                             tab, idx_s, n=5)
        print(f"{label:42s} {dt*1e3:8.2f} ms  {N/dt/1e6:9.1f} M/s")

    # take_along_axis batched gather as XLA sees it in the render
    # (per-row tables): (B, K) table rows, (B, S) indices
    B, K, S = 1 << 14, 17, 256
    tabs = jax.random.uniform(key, (B, K), jnp.float32)
    idx2 = jax.random.randint(jax.random.key(2), (B, S), 0, K, jnp.int32)

    @jax.jit
    def taa(t, i):
        return jnp.sum(jnp.take_along_axis(t, i, axis=-1))

    label, dt, _ = bench("take_along_axis (B=16k,K=17,S=256)", taa, tabs,
                         idx2)
    tot = B * S
    print(f"{label:42s} {dt*1e3:8.2f} ms  {tot/dt/1e6:9.1f} M/s")

    # interp-style gather via one-hot against K=17 (tiny last axis):
    @jax.jit
    def taa_onehot(t, i):
        oh = (i[..., None] == jnp.arange(K)).astype(jnp.float32)
        return jnp.sum(oh * t[:, None, :])

    label, dt, _ = bench("onehot-vpu (B=16k,K=17,S=256)", taa_onehot, tabs,
                         idx2)
    print(f"{label:42s} {dt*1e3:8.2f} ms  {tot/dt/1e6:9.1f} M/s")


if __name__ == "__main__":
    main()
