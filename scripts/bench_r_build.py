"""R-build timing: XLA build_R vs Pallas build_R_pallas (VERDICT r03
next-round item 4). Heterogeneous benchmark medium, representative-ray
counts matching the crossover configs.

Usage: python scripts/bench_r_build.py [n_reps] [n_vrls] [W]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators.vrl import integrator, tracer, vrl as vrl_mod
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.scene import presets
from alvrl_tpu.sensors import perspective


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_vrls = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    scene = presets.cornell_grid_smoke(width=w, height=w)
    cfg = VRLConfig(vrl_chunk=128)
    depth = 10
    raw = tracer.trace(scene, jax.random.key(1), max(n_vrls // 4, 48),
                       tracer.TracerConfig(max_depth=depth))
    vrls = vrl_mod.compact(raw, n_vrls, slots_per_particle=depth)

    rs = np.random.default_rng(0)
    rows = rs.choice(w * w, size=n_reps, replace=False)
    px = jnp.asarray(rows % w, jnp.int32)
    py = jnp.asarray(rows // w, jnp.int32)
    ray_o, ray_d = perspective.sample_ray(scene.camera, px, py)
    key = jax.random.key(7)

    def timed(name, fn, reps=3):
        out = jax.block_until_ready(fn())  # compile
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt * 1e3:.1f} ms/build")
        return out, dt

    (mx, vx), t_xla = timed(
        "build_R (XLA)",
        lambda: integrator.build_R(scene, ray_o, ray_d, vrls, key, cfg))
    (mk, vk), t_pal = timed(
        "build_R_pallas",
        lambda: integrator.build_R_pallas(scene, ray_o, ray_d, vrls, key,
                                          cfg))
    mx, mk = np.asarray(mx), np.asarray(mk)
    # different RNG streams: compare totals (both unbiased)
    print(f"mean-sum ratio pallas/xla: {mk.sum() / max(mx.sum(), 1e-9):.4f}")
    print(f"speedup: {t_xla / t_pal:.2f}x")


if __name__ == "__main__":
    main()
