"""Finer ablation of the config-4 clustered hetero render: isolates
occlusion, table interpolation, sigma_s gathers, and the U<->V tau
quadrature by monkeypatching the pieces. Warm timings, 32 bands."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.geometry import intersect
from alvrl_tpu.integrators.vrl import alvrl, cluster as cl
from alvrl_tpu.integrators.vrl import integrate as integ
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.integrators.vrl import integrator as intg
from alvrl_tpu.integrators.vrl.tracer import TracerConfig, trace
from alvrl_tpu.integrators.vrl.vrl import compact
from alvrl_tpu.media import api as mapi
from alvrl_tpu.media import heterogeneous as gmed
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
    tv, tw = tv[:, :64], tw[:, :64]

    def run(label):
        intg._render_clustered_rows.clear_cache()

        def go():
            return intg.render_clustered(scene, vrls, sop, tv, tw, k_render,
                                         cfg, ray_tile=1024, host_bands=32)
        img = go()
        jax.block_until_ready(img)
        t0 = time.time()
        img = go()
        jax.block_until_ready(img)
        dt = time.time() - t0
        print(f"{label:40s} {dt:8.2f} s  "
              f"(mean {float(np.asarray(img).mean()):.5f})", flush=True)
        return dt

    run("full")

    # (a) occlusion off
    orig_occluded = intersect.occluded
    intersect.occluded = lambda p0, p1, v, f, of: jnp.zeros(
        jnp.broadcast_shapes(p0.shape[:-1], p1.shape[:-1]), bool)
    run("no occlusion")
    intersect.occluded = orig_occluded

    # (b) uv tau = 1 (keeps occlusion)
    orig_etb = integ.eval_transmittance_between
    def etb_no_tau(scene_, p0, p1, n_tau_steps=None):
        blocked = intersect.occluded(
            p0, p1, scene_.vertices, scene_.faces, scene_.opaque_faces())
        return jnp.where(blocked[..., None], 0.0,
                         jnp.ones(p0.shape[:-1] + (3,)))
    integ.eval_transmittance_between = etb_no_tau
    run("uv tau = 1 (occl kept)")
    integ.eval_transmittance_between = orig_etb

    # (c) sigma_s constant (no 3D gathers at U, V)
    orig_ss = mapi.sigma_s_at
    mapi.sigma_s_at = lambda med, p: jnp.broadcast_to(
        med.sigma_s_color * 0.5, jnp.shape(p))
    run("sigma_s constant")
    mapi.sigma_s_at = orig_ss

    # (d) eye/vrl OD tables -> zeros (kills interp_od gathers' effect;
    # shapes kept, so isolates take_along_axis + the [ids] row gather)
    orig_interp = gmed.interp_od
    gmed.interp_od = lambda cum, frac, n_steps=gmed.N_TAU_STEPS: (
        jnp.zeros(jnp.broadcast_shapes(cum.shape[:-1], jnp.shape(frac))))
    run("interp_od -> 0 (gathers remain)")
    gmed.interp_od = orig_interp


if __name__ == "__main__":
    main()
