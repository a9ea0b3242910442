"""Benchmark entry point (run by the driver on real TPU hardware).

Renders BASELINE config 1 (Cornell box + homogeneous isotropic medium,
point emitter, unclustered VRL multiple scatter, 128x128) and reports the
core throughput metric: VRL-pair-sample evaluations per second per chip
(pairs x (volVolSamples + volSurfSamples) / wall second), the direct
counterpart of the reference's per-pass VRL-evaluation counters
(vrlIntegrator.cpp:119-122,357-364).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
ratio is against a documented estimate of the reference CPU build's
throughput on a contemporary 8-core machine: ~4e6 pair-sample evals/s
(each eval = Kulla sampling + kd-tree shadow ray + transmittance/phase
product; ~2 us/core in optimized C++).
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_PAIR_EVALS_PER_S = 4.0e6


def main():
    import jax

    # persistent compilation cache: cold remote compiles take minutes
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from alvrl_tpu.integrators.vrl import tracer, vrl as vrl_mod
    from alvrl_tpu.integrators.vrl.integrate import VRLConfig
    from alvrl_tpu.integrators.vrl.integrator import render_with_vrls_pallas
    from alvrl_tpu.scene import presets

    width = height = 128
    n_vrls = 512
    cfg = VRLConfig(vol_vol_samples=2, vol_surf_samples=2, vrl_chunk=128)

    scene = presets.cornell_smoke(width=width, height=height)

    # VRL set: pre-traced and checked in (the reference's vrlFile
    # decoupling, vrlIntegrator.cpp:243-252) so the benchmark measures
    # the render kernel without paying the tracer's compile on a cold
    # cache. Regenerate with: python -c "see data/README".
    import os
    t0 = time.time()
    vrl_path = os.path.join(os.path.dirname(__file__), "data",
                            "bench_vrls.txt")
    if os.path.exists(vrl_path):
        vrls = vrl_mod.load_ascii(vrl_path, particle_count=78.0)
        vrls = vrl_mod.compact(vrls, n_vrls)
        print(f"loaded {int(vrls.valid.sum())} VRLs", file=sys.stderr)
    else:
        key = jax.random.key(0)
        raw = tracer.trace(scene, key, 128,
                           tracer.TracerConfig(max_depth=12))
        raw.valid.block_until_ready()
        vrls = vrl_mod.compact(raw, n_vrls, slots_per_particle=12)
        print(f"traced {int(raw.valid.sum())} VRLs in {time.time()-t0:.1f}s",
              file=sys.stderr)

    render = lambda k: render_with_vrls_pallas(scene, vrls, k, cfg)

    # warmup / compile
    t0 = time.time()
    img = render(jax.random.key(1))
    img.block_until_ready()
    print(f"compile+first pass: {time.time()-t0:.1f}s", file=sys.stderr)

    # timed passes
    n_pass = 3
    t0 = time.time()
    for i in range(n_pass):
        img = render(jax.random.key(2 + i))
    img.block_until_ready()
    dt = (time.time() - t0) / n_pass
    n_rays = width * height
    pair_evals = n_rays * n_vrls * (cfg.vol_vol_samples + cfg.vol_surf_samples)
    evals_per_s = pair_evals / dt
    rays_per_s = n_rays / dt
    print(
        f"pass: {dt:.3f}s  rays/s: {rays_per_s:.3g}  "
        f"pair-sample evals/s: {evals_per_s:.3g}",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "vrl_pair_sample_evals_per_s_per_chip",
        "value": evals_per_s,
        "unit": "evals/s/chip",
        "vs_baseline": evals_per_s / BASELINE_PAIR_EVALS_PER_S,
    }))


if __name__ == "__main__":
    main()
