"""Gradient-pass benchmark: config-4-shape heterogeneous render,
kernel VJP (seed-replay backward Pallas, ops/vrl_pallas_bwd) vs XLA AD
through the unclustered XLA estimator (render_with_vrls).

NEXT.md round-5 item 2: the FD validation of the hetero backward
kernel is small-shape; this measures the production-scale gradient
throughput and the kernel-vs-XLA-AD speedup on the attached device.

Both arms compute d(mean image)/d(sigma_s multiplier, g) on the same
scene + VRL set (geometry detached in both, per the detached-sampling
contract). The arms use different sample streams, so the *values* are
not compared here (that is tests/test_pallas_bwd.py's FD job under
matched streams); this script times the passes.

Usage: python scripts/bench_grad_hetero.py [size_ab] [size_kernel]
  size_ab:     frame size for the kernel-vs-XLA A/B (default 128)
  size_kernel: frame size for the kernel-only timing (default 512)

Reference lineage for what is being differentiated:
/root/reference/src/medium/heterogeneous.cpp:589-663 (grid lookup +
ratio-tracked transmittance) driven by vrlIntegrator.cpp:603-785.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp

from alvrl_tpu.integrators.vrl import integrator, tracer, vrl as vrl_mod
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.ops import pack as pk
from alvrl_tpu.scene import presets

N_VRLS = 512
N_PARTICLES = 128


def _timed(fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return out, (time.time() - t0) / n


def _setup(size):
    scene = presets.cornell_grid_smoke(width=size, height=size)
    raw = tracer.trace(scene, jax.random.key(0), N_PARTICLES,
                       tracer.TracerConfig(max_depth=10))
    vrls = vrl_mod.compact(raw, N_VRLS, slots_per_particle=8)
    return scene, vrls


def _evals(size, cfg):
    # pair-sample evals per pass: rays x vrls x (vv + vs samples)
    return size * size * N_VRLS * (cfg.vol_vol_samples
                                   + cfg.vol_surf_samples)


def bench_kernel(size, cfg):
    scene, vrls = _setup(size)
    cp_pack, cp_err = pk.pack_cp(scene.medium,
                                 rank=integrator.CP_RANK)

    @jax.jit
    def loss(s_mult, g):
        med = scene.medium.replace(
            albedo=scene.medium.albedo * s_mult, g=g)
        sc = scene.replace(medium=med)
        img = integrator.render_with_vrls_pallas_hetero_diff(
            sc, vrls, jax.random.key(1), cp_pack, jnp.float32(1.0), cfg)
        return img.mean()

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    args = (jnp.ones((3,)), jnp.float32(0.3))
    (_, fwd_dt) = _timed(lambda: jax.jit(loss)(*args))
    (out, dt) = _timed(lambda: grad_fn(*args))
    return fwd_dt, dt, out


def bench_xla(size, cfg):
    scene, vrls = _setup(size)

    @jax.jit
    def loss(s_mult, g):
        med = scene.medium.replace(
            albedo=scene.medium.albedo * s_mult, g=g)
        sc = scene.replace(medium=med)
        img = integrator.render_with_vrls(
            sc, vrls, jax.random.key(1), cfg, ray_tile=2048)
        return img.mean()

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    args = (jnp.ones((3,)), jnp.float32(0.3))
    (_, fwd_dt) = _timed(lambda: jax.jit(loss)(*args))
    (out, dt) = _timed(lambda: grad_fn(*args))
    return fwd_dt, dt, out


def main():
    size_ab = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size_k = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = VRLConfig()

    kf, kg, _ = bench_kernel(size_ab, cfg)
    xf, xg, _ = bench_xla(size_ab, cfg)
    ev = _evals(size_ab, cfg)
    print(json.dumps({
        "bench": "grad_hetero_ab", "size": size_ab, "vrls": N_VRLS,
        "kernel_fwd_s": round(kf, 4), "kernel_grad_s": round(kg, 4),
        "xla_fwd_s": round(xf, 4), "xla_grad_s": round(xg, 4),
        "grad_speedup_kernel_vs_xla": round(xg / kg, 2),
        "kernel_grad_evals_per_s": round(ev / kg),
        "kernel_grad_over_fwd": round(kg / kf, 2),
        "xla_grad_over_fwd": round(xg / xf, 2),
    }))

    kf2, kg2, _ = bench_kernel(size_k, cfg)
    ev2 = _evals(size_k, cfg)
    print(json.dumps({
        "bench": "grad_hetero_kernel_only", "size": size_k,
        "vrls": N_VRLS, "kernel_fwd_s": round(kf2, 4),
        "kernel_grad_s": round(kg2, 4),
        "kernel_grad_evals_per_s": round(ev2 / kg2),
        "kernel_grad_over_fwd": round(kg2 / kf2, 2),
    }))


if __name__ == "__main__":
    main()
