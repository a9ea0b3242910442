"""Roofline / utilization analysis for the VRL pair kernel (VERDICT r03
"what's weak" #2: '1.1e9 evals/s could be 80% of achievable or 8%').

Methodology: the Pallas kernel is opaque to XLA cost analysis, but the
pure-XLA path (integrator.vrl_sum -> integrate.pair_contribution)
computes the *same estimator* — same Kulla sampling, same occlusion
sweep, same transmittance/phase products (validated to 1e-6 median
agreement, tests/test_hetero_pallas.py). So we take XLA's own FLOP
count of that computation on BASELINE config-1 shapes as the
work-per-pair-sample budget, and divide the measured Pallas throughput
by VPU fp32 peak to get a utilization number.

Run on CPU (cost analysis is platform-independent for flop counting):
    JAX_PLATFORMS=cpu python scripts/roofline.py
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    from alvrl_tpu.integrators.vrl import vrl as vrl_mod
    from alvrl_tpu.integrators.vrl.integrate import VRLConfig
    from alvrl_tpu.integrators.vrl import integrator as vint
    from alvrl_tpu.media import api as mapi
    from alvrl_tpu.scene import presets
    from alvrl_tpu.sensors import perspective

    width = height = 128
    n_vrls = 512
    cfg = VRLConfig(vol_vol_samples=2, vol_surf_samples=2, vrl_chunk=128)
    scene = mapi.prepare_scene(
        presets.cornell_smoke(width=width, height=height))

    import os
    vrl_path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "bench_vrls.txt")
    vrls = vrl_mod.load_ascii(vrl_path, particle_count=78.0)
    vrls = vrl_mod.compact(vrls, n_vrls)

    key = jax.random.key(1)
    px, py = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
    ray_o, ray_d = perspective.sample_ray(
        scene.camera, px.reshape(-1), py.reshape(-1))

    fn = jax.jit(
        lambda s, o, d, v, k: vint.li_unclustered(s, o, d, v, k, cfg)
    )
    lowered = fn.lower(scene, ray_o, ray_d, vrls, key)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_hbm = float(cost.get("bytes accessed", 0.0))
    # transcendentals are counted by XLA as 1 flop but cost more on VPU
    trans = float(cost.get("transcendentals", 0.0))

    n_rays = width * height
    pair_samples = n_rays * n_vrls * (cfg.vol_vol_samples
                                      + cfg.vol_surf_samples)
    f_per_eval = flops / pair_samples
    t_per_eval = trans / pair_samples
    b_per_eval = bytes_hbm / pair_samples

    # measured Pallas throughput (bench.py, de-noised best block)
    MEASURED_EVALS_PER_S = 1.43e9
    # v5e-class chip: VPU = 4x (8,128) fp32 ALUs/core @ ~0.94 GHz,
    # 2 flop/FMA -> ~7.7e12 fp32 FLOP/s; HBM ~819 GB/s
    VPU_PEAK = 7.7e12
    HBM_BW = 819e9

    sustained = MEASURED_EVALS_PER_S * f_per_eval
    util = sustained / VPU_PEAK
    hbm_frac = MEASURED_EVALS_PER_S * b_per_eval / HBM_BW

    out = {
        "flops_per_pair_sample": f_per_eval,
        "transcendentals_per_pair_sample": t_per_eval,
        "hbm_bytes_per_pair_sample_xla_path": b_per_eval,
        "measured_evals_per_s": MEASURED_EVALS_PER_S,
        "sustained_fp32_flops": sustained,
        "vpu_peak_fp32_flops": VPU_PEAK,
        "vpu_utilization": util,
        "hbm_bw_fraction_xla_path": hbm_frac,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
