"""Two-level BVH occlusion kernel, phase-2 benchmark (VERDICT r03
item 5): a cull-friendly >=16k-triangle scene where the SMEM triangle
sweep cannot run (scalar-prefetch cap ~500 tris) and XLA brute-force
occlusion is memory-bound, comparing:

  * vrl_sum_pallas_bvh (register-carry Wald sweep + per-ray-group AABB
    culling + double-buffered cluster DMA, Morton-sorted VRLs)
  * the XLA path (li_unclustered with small vrl chunks — its occluded()
    materializes (rays x vrls x samples x tris) intermediates, so the
    chunk size is capped by HBM)

plus a small-scene sanity A/B: at Cornell scale (<500 tris) the BVH
kernel must reproduce the SMEM kernel bit-for-bit (same seed, same
estimator, different occlusion plumbing).

Usage: python scripts/bench_bvh_large.py [W] [n_cubes_axis]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.geometry import shapes as shp
from alvrl_tpu.integrators.vrl import tracer, vrl as vrl_mod
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.integrators.vrl import integrator as vint
from alvrl_tpu.media import api as mapi
from alvrl_tpu.ops import pack as pk
from alvrl_tpu.ops import vrl_pallas as vp
from alvrl_tpu.scene import presets
from alvrl_tpu.scene.scene import DIFFUSE, Scene, make_materials
from alvrl_tpu.sensors import perspective


def cube_field_scene(width=64, height=64, n_axis=11):
    """A (n x n x n) grid of separated small cubes inside a Cornell-box
    shell — 12 * n^3 + 36 tris of cull-friendly geometry."""
    base = presets.cornell_smoke(width=width, height=height,
                                 with_blocker=False)
    verts = [np.asarray(base.vertices)]
    faces = [np.asarray(base.faces)]
    mats = [np.asarray(base.material)]
    nv = verts[0].shape[0]
    cube_v, cube_f = shp.cube()
    cube_v = np.asarray(cube_v) * 0.028   # small, well separated
    cube_f = np.asarray(cube_f)
    for iz in range(n_axis):
        for iy in range(n_axis):
            for ix in range(n_axis):
                c = (np.array([ix, iy, iz]) / (n_axis - 1) * 1.4 - 0.7)
                verts.append(cube_v + c)
                faces.append(cube_f + nv)
                mats.append(np.zeros(12, np.int32))
                nv += cube_v.shape[0]
    v = jnp.asarray(np.concatenate(verts), jnp.float32)
    f = jnp.asarray(np.concatenate(faces), jnp.int32)
    m = jnp.asarray(np.concatenate(mats), jnp.int32)
    return base.replace(
        vertices=v, faces=f, material=m,
        face_emitter=jnp.full((f.shape[0],), -1, jnp.int32),
        face_shape=jnp.zeros((f.shape[0],), jnp.int32),
    )


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_axis = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    cfg = VRLConfig(vol_vol_samples=2, vol_surf_samples=2, vrl_chunk=4)

    # ---- sanity A/B at Cornell scale -------------------------------
    sc0 = mapi.prepare_scene(presets.cornell_smoke(width=32, height=32))
    vr0 = vrl_mod.compact(
        tracer.trace(sc0, jax.random.key(0), 32,
                     tracer.TracerConfig(max_depth=8)),
        128, slots_per_particle=8)
    px, py = jnp.meshgrid(jnp.arange(32), jnp.arange(32))
    ro, rd = perspective.sample_ray(sc0.camera, px.reshape(-1),
                                    py.reshape(-1))
    hit0 = vint.trace_eye_rays(sc0, ro, rd)
    rp0 = pk.pack_rays(sc0, ro, rd, hit0)
    vp0 = pk.pack_vrls(vr0)
    med0 = pk.pack_medium(sc0)
    tf0 = pk.pack_tris(sc0)
    seed = jnp.asarray([11], jnp.int32)
    out_smem = vp.vrl_sum_pallas(rp0, vp0, tf0, med0, seed)
    clb0, blocks0, c0 = vp.pack_tri_clusters(
        np.asarray(sc0.vertices), np.asarray(sc0.faces),
        np.asarray(sc0.opaque_faces()))
    out_bvh = vp.vrl_sum_pallas_bvh(
        rp0, vp0, clb0, blocks0, med0, seed, n_clusters=c0)
    a, b = np.asarray(out_smem), np.asarray(out_bvh)
    nz = a > 1e-9
    rel = np.abs(a - b)[nz] / a[nz]
    print(f"sanity A/B (36 tris, same seed): median rel "
          f"{np.median(rel):.2e}, max {rel.max():.2e}", file=sys.stderr)
    assert np.median(rel) < 1e-5, np.median(rel)

    # ---- large cull-friendly scene ---------------------------------
    scene = mapi.prepare_scene(
        cube_field_scene(width=W, height=W, n_axis=n_axis))
    n_tris = int(scene.faces.shape[0])
    print(f"scene: {n_tris} triangles", file=sys.stderr)
    vrls = vrl_mod.compact(
        tracer.trace(scene, jax.random.key(1), 64,
                     tracer.TracerConfig(max_depth=8)),
        256, slots_per_particle=8)
    vrls = vp.sort_vrls_morton(vrls)
    px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(W))
    ro, rd = perspective.sample_ray(scene.camera, px.reshape(-1),
                                    py.reshape(-1))
    hit = vint.trace_eye_rays(scene, ro, rd)
    ray_pack = pk.pack_rays(scene, ro, rd, hit)
    vrl_pack = pk.pack_vrls(vrls)
    med_pack = pk.pack_medium(scene)
    clb, blocks, n_cl = vp.pack_tri_clusters(
        np.asarray(scene.vertices), np.asarray(scene.faces),
        np.asarray(scene.opaque_faces()))
    print(f"{n_cl} clusters of {vp.K_CLUSTER}", file=sys.stderr)

    def timed(name, fn, reps=3):
        out = jax.block_until_ready(fn())
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt:.3f} s/pass", file=sys.stderr)
        return np.asarray(out), dt

    out_k, t_k = timed(
        "BVH kernel",
        lambda: vp.vrl_sum_pallas_bvh(
            ray_pack, vrl_pack, clb, blocks, med_pack, seed,
            n_clusters=n_cl))

    # XLA arm: the chunked estimator (vrl_chunk caps the occlusion
    # intermediates); same sampling counts, its own RNG stream
    def xla_pass():
        li = vint.li_unclustered(scene, ro, rd, vrls,
                                 jax.random.key(5), cfg)
        return li

    out_x, t_x = timed("XLA chunked", xla_pass, reps=1)

    # kernel output is an unnormalized (3, B) sum; li_unclustered is
    # per-ray radiance (particle-normalized, invalid-hit masked)
    li_k = (out_k.T / float(vrls.particle_count)
            * np.asarray(hit.valid)[:, None])
    li_x = out_x * np.asarray(hit.valid)[:, None]
    ratio_means = li_k.sum() / max(li_x.sum(), 1e-9)
    print(f"mean-sum ratio kernel/xla: {ratio_means:.3f} "
          f"(independent RNG)", file=sys.stderr)
    print(f"speedup kernel vs XLA-chunked: {t_x / t_k:.2f}x",
          file=sys.stderr)


if __name__ == "__main__":
    main()
