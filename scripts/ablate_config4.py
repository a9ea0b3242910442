"""Ablation micro-bench for the config-4 clustered hetero render.

Measures one band of the clustered render with pieces toggled to find
where the 13 s render stage goes: table width (padding waste), the
U<->V tau quadrature, the occlusion test, sigma_s gathers.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators.vrl import alvrl, cluster as cl
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.integrators.vrl.integrator import render_clustered
from alvrl_tpu.integrators.vrl.tracer import TracerConfig, trace
from alvrl_tpu.integrators.vrl.vrl import compact
from alvrl_tpu.scene import presets


def main():
    scene = presets.cornell_grid_smoke(width=512, height=512)
    params = alvrl.ALVRLParams(
        vrl_target_num=512, num_particles=192,
        cluster=cl.ClusterParams(target_num_slices=128,
                                 target_pixel_undersampling=128.0),
    )
    cfg = VRLConfig(vrl_chunk=128)
    key = jax.random.key(0)
    k_trace, k_r, k_render = jax.random.split(key, 3)
    si = alvrl.build_slice_info(scene, params)
    raw = trace(scene, k_trace, 192, TracerConfig(max_depth=10))
    vrls = compact(raw, 512, slots_per_particle=10)
    sop, tv, tw, info = alvrl.prepare_clustering(
        scene, vrls, k_r, params, cfg, slice_info=si)

    tvn = np.asarray(tv)
    twn = np.asarray(tw)
    reps = (twn > 0).sum(axis=1)
    s = len(info.slice_weights)
    print(f"table shape {tvn.shape}; slices={s}")
    print(f"reps/slice: mean {reps[:s].mean():.1f} max {reps[:s].max()}"
          f" | fallback row reps: {reps[s] if s < len(reps) else 0}")

    # how wide would slice-only tables be?
    cmax_slices = int(reps[:s].max())
    print(f"slice-only width (unpadded): {cmax_slices}, "
          f"padded32: {-(-cmax_slices // 32) * 32}")

    def run(label, tv_, tw_, cfg_, bands=32):
        def go():
            return render_clustered(scene, vrls, sop, tv_, tw_, k_render,
                                    cfg_, ray_tile=1024, host_bands=bands)
        img = go()
        jax.block_until_ready(img)
        t0 = time.time()
        img = go()
        jax.block_until_ready(img)
        dt = time.time() - t0
        print(f"{label:44s} {dt:8.2f} s  (mean {float(np.asarray(img).mean()):.5f})")
        return dt

    run("full (128-wide tables)", tv, tw, cfg)

    # narrow tables: clip to padded32 slice-only width (fallback row
    # entries beyond that are dropped -- measurement only)
    wnar = -(-cmax_slices // 32) * 32
    run(f"narrow tables ({wnar}-wide)", tv[:, :wnar], tw[:, :wnar], cfg)

    # tau quadrature cost: 1-step uv tau
    run("uv_tau_steps=1", tv[:, :wnar], tw[:, :wnar],
        VRLConfig(vrl_chunk=128, uv_tau_steps=1))

    # 8 steps for reference
    run("uv_tau_steps=8", tv[:, :wnar], tw[:, :wnar],
        VRLConfig(vrl_chunk=128, uv_tau_steps=8))


if __name__ == "__main__":
    main()
