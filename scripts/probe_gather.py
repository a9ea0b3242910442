"""Probe: does Mosaic's tpu.dynamic_gather (jnp.take_along_axis on 2D)
work inside Pallas on this TPU, and how fast is it?

Validates the two building blocks of the heterogeneous render kernel:
  * axis=1 lane gather from a sublane-replicated 128-entry table
    (CP-factor lookups),
  * axis=0 cross-sublane gather (per-VRL tau-table interpolation).
Run standalone on the TPU (nothing else attached)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_axis1(tbl_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(tbl_ref[:, :], idx_ref[:, :], axis=1)


def kernel_axis0(tbl_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(tbl_ref[:, :], idx_ref[:, :], axis=0)


def kernel_many(tbl_ref, idx_ref, out_ref, *, reps: int):
    acc = jnp.zeros_like(idx_ref[:, :], dtype=jnp.float32)
    idx = idx_ref[:, :]
    t = tbl_ref[:, :]
    for k in range(reps):
        acc = acc + jnp.take_along_axis(t, (idx + k) % 128, axis=1)
    out_ref[:, :] = acc


def main():
    rs = np.random.default_rng(0)
    table_1d = jnp.asarray(rs.uniform(0, 1, 128).astype(np.float32))
    tbl = jnp.broadcast_to(table_1d, (128, 128))  # sublane-replicated
    idx = jnp.asarray(rs.integers(0, 128, (128, 128)).astype(np.int32))

    out = pl.pallas_call(
        kernel_axis1,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)
    ref = np.asarray(table_1d)[np.asarray(idx)]
    ok1 = np.allclose(np.asarray(out), ref)
    print("axis1 lane gather correct:", ok1)

    # axis-0 gather across >8 sublanes is NOT supported (Mosaic:
    # "Multiple source vregs along gather dimension") — the kernel
    # transposes and uses axis-1 instead. Probe the transposed form:
    def kernel_t(tbl_ref, idx_ref, out_ref):
        xt = tbl_ref[:, :].T
        it = idx_ref[:, :].T
        out_ref[:, :] = jnp.take_along_axis(xt, it, axis=1).T

    tbl0 = jnp.asarray(rs.uniform(0, 1, (128, 128)).astype(np.float32))
    idx0 = jnp.asarray(rs.integers(0, 128, (128, 128)).astype(np.int32))
    out0 = pl.pallas_call(
        kernel_t,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl0, idx0)
    # out[i,j] = tbl[idx[i,j], j] via the transposed lane gather
    ref0 = np.asarray(tbl0)[np.asarray(idx0),
                            np.arange(128)[None, :].repeat(128, 0)]
    ok0 = np.allclose(np.asarray(out0), ref0)
    print("transposed axis0-equivalent gather correct:", ok0)

    # throughput: many gathers per element
    reps = 256
    from functools import partial
    f = jax.jit(lambda t, i: pl.pallas_call(
        partial(kernel_many, reps=reps),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    f(tbl, idx).block_until_ready()
    n_iter = 50
    t0 = time.time()
    for _ in range(n_iter):
        r = f(tbl, idx)
    r.block_until_ready()
    dt = time.time() - t0
    total = 128 * 128 * reps * n_iter
    print(f"lane-gather throughput: {total/dt:.3e} gathers/s "
          f"({dt/n_iter*1e6:.1f} us per {128*128*reps} gathers)")


if __name__ == "__main__":
    main()
