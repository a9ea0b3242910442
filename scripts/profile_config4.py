"""Stage-level profile of BASELINE config 4 (hetero 512x512 clustered).

Prints per-stage warm timings: trace / compact / R build / host
clustering / clustered render, plus a sub-profile of the render bands.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import numpy as np

from alvrl_tpu.core import rng
from alvrl_tpu.integrators.vrl import alvrl, cluster as cl
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.integrators.vrl.integrator import build_R, render_clustered
from alvrl_tpu.integrators.vrl.tracer import TracerConfig, trace
from alvrl_tpu.integrators.vrl.vrl import compact
from alvrl_tpu.scene import presets
from alvrl_tpu.sensors import perspective
import jax.numpy as jnp


def t(label, fn, n=1):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label:28s} {dt*1000:10.1f} ms")
    return out, dt


def main():
    scene = presets.cornell_grid_smoke(width=512, height=512)
    params = alvrl.ALVRLParams(
        vrl_target_num=512, num_particles=192,
        cluster=cl.ClusterParams(target_num_slices=128,
                                 target_pixel_undersampling=128.0),
    )
    cfg = VRLConfig(vrl_chunk=128)
    tcfg = TracerConfig(max_depth=10)
    key = jax.random.key(0)
    k_trace, k_r, k_render = jax.random.split(key, 3)

    t0 = time.time()
    si = alvrl.build_slice_info(scene, params)
    print(f"{'slice_info (once/scene)':28s} {(time.time()-t0)*1000:10.1f} ms")

    raw, _ = t("trace", lambda: trace(scene, k_trace, 192, tcfg))
    vrls, _ = t("compact", lambda: compact(raw, 512, slots_per_particle=10))

    # R build
    p = params.cluster
    w, h = scene.camera.width, scene.camera.height
    all_rows = np.concatenate(si.repr_rows)
    px = jnp.asarray(all_rows % w, jnp.int32)
    py = jnp.asarray(all_rows // w, jnp.int32)
    ray_o, ray_d = perspective.sample_ray(scene.camera, px, py)
    (r_mean, r_var), _ = t("build_R (device)", lambda: build_R(
        scene, ray_o, ray_d, vrls, rng.fold(jax.random.key(0), 11), cfg))

    def host_cluster():
        rm = np.asarray(r_mean, np.float64)
        rv = np.asarray(r_var, np.float64)
        rows_per_slice = []
        off = 0
        for rr in si.repr_rows:
            rows_per_slice.append(np.arange(off, off + len(rr)))
            off += len(rr)
        host_rng = np.random.default_rng(13)
        return cl.build_clusters(rm, rv, rows_per_slice, si.slice_u,
                                 si.global_pu, si.localities, p, host_rng)

    _, _ = t("host clustering", host_cluster, n=1)

    sop, tv, tw, info = alvrl.prepare_clustering(
        scene, vrls, k_r, params, cfg, slice_info=si)
    print(f"tables: {tv.shape}, reps/slice="
          f"{float((tw > 0).sum(axis=1).mean()):.1f}")

    for bands in (32,):
        _, dt = t(f"render_clustered ({bands} bands)", lambda: render_clustered(
            scene, vrls, sop, tv, tw, k_render, cfg, ray_tile=1024,
            host_bands=bands))
        reps = float((tw > 0).sum(axis=1).mean())
        evals = 512 * 512 * reps * (cfg.vol_vol_samples + cfg.vol_surf_samples)
        print(f"  -> pair-sample evals/s: {evals/dt:.3e}")


if __name__ == "__main__":
    main()
