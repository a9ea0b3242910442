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
    clb0, sclb0, blocks0, c0 = vp.pack_tri_clusters(
        np.asarray(sc0.vertices), np.asarray(sc0.faces),
        np.asarray(sc0.opaque_faces()))
    out_bvh = vp.vrl_sum_pallas_bvh(
        rp0, vp0, clb0, sclb0, blocks0, med0, seed, n_clusters=c0)
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
    clb, sclb, blocks, n_cl = vp.pack_tri_clusters(
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
            ray_pack, vrl_pack, clb, sclb, blocks, med_pack, seed,
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


def blob_scene(width=64, height=64, n_theta=64):
    """A displaced high-tessellation sphere occupying ~15% of the box
    — the REPRESENTATIVE large-mesh case (a dense statue/dragon-like
    object in a sub-volume), vs cube_field_scene's adversarial
    volume-filling layout. tris = 2 * n_theta * 2*n_theta."""
    base = presets.cornell_smoke(width=width, height=height,
                                 with_blocker=False)
    v, f = shp.sphere(center=(0, 0, 0), radius=1.0, n_theta=n_theta,
                      n_phi=2 * n_theta)
    v = np.asarray(v, np.float32)
    f = np.asarray(f)
    # radial displacement -> crinkly surface (non-trivial occluder)
    r = np.linalg.norm(v, axis=1, keepdims=True)
    disp = (0.18 * np.sin(9 * v[:, 0:1]) * np.cos(7 * v[:, 1:2])
            + 0.12 * np.sin(13 * v[:, 2:3]))
    v = v * (1.0 + disp) * 0.35 / np.maximum(r, 1e-9)
    v = v + np.array([0.25, -0.35, 0.3], np.float32)
    nv = np.asarray(base.vertices).shape[0]
    verts = np.concatenate([np.asarray(base.vertices), v])
    faces = np.concatenate([np.asarray(base.faces), f + nv])
    mats = np.concatenate(
        [np.asarray(base.material), np.zeros(len(f), np.int32)])
    return base.replace(vertices=jnp.asarray(verts),
                        faces=jnp.asarray(faces),
                        material=jnp.asarray(mats))


def scaling_sweep(W=64, axes=(11, 16, 22), scene_kind="cubes"):
    """Kernel-only triangle-count scaling (VERDICT r04 item 3's
    'Done =' clause): pass time at 16k -> 49k -> 128k triangles must
    grow SUBLINEARLY (the super-cluster level culls whole subtrees'
    DMAs and leaf tests), reported with ABSOLUTE pair-sample eval
    rates (not a ratio against a handicapped arm)."""
    import json

    cfg = VRLConfig()
    seed = jnp.asarray([11], jnp.int32)
    rows = []
    for n_axis in axes:
        if scene_kind == "blob":
            scene = mapi.prepare_scene(
                blob_scene(width=W, height=W, n_theta=n_axis))
        else:
            scene = mapi.prepare_scene(
                cube_field_scene(width=W, height=W, n_axis=n_axis))
        n_tris = int(scene.faces.shape[0])
        vrls = vrl_mod.compact(
            tracer.trace(scene, jax.random.key(1), 64,
                         tracer.TracerConfig(max_depth=8)),
            256, slots_per_particle=8)
        vrls = vp.sort_vrls_morton(vrls)
        px, py = jnp.meshgrid(jnp.arange(W), jnp.arange(W))
        ro, rd = perspective.sample_ray(scene.camera, px.reshape(-1),
                                        py.reshape(-1))
        # chunked eye tracing: the brute-force intersect materializes
        # (rays x tris) intermediates — at 128k tris a whole-frame
        # batch OOMs the chip; 256-ray chunks keep it at ~130 MB
        packs = []
        for c0 in range(0, ro.shape[0], 256):
            h = vint.trace_eye_rays(scene, ro[c0:c0 + 256],
                                    rd[c0:c0 + 256])
            packs.append(pk.pack_rays(scene, ro[c0:c0 + 256],
                                      rd[c0:c0 + 256], h))
        ray_pack = jnp.concatenate(packs, axis=0)
        vrl_pack = pk.pack_vrls(vrls)
        med_pack = pk.pack_medium(scene)
        clb, sclb, blocks, n_cl = vp.pack_tri_clusters(
            np.asarray(scene.vertices), np.asarray(scene.faces),
            np.asarray(scene.opaque_faces()))

        def run():
            return vp.vrl_sum_pallas_bvh(
                ray_pack, vrl_pack, clb, sclb, blocks, med_pack, seed,
                n_clusters=n_cl)

        out = jax.block_until_ready(run())
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        evals = W * W * vrls.capacity * (cfg.vol_vol_samples
                                         + cfg.vol_surf_samples)
        rows.append(dict(n_tris=n_tris, n_clusters=n_cl,
                         s_per_pass=dt, pair_evals_per_s=evals / dt))
        print(f"{n_tris:7d} tris  {n_cl:5d} clusters  "
              f"{dt:7.3f} s/pass  {evals / dt:.3g} pair-evals/s",
              file=sys.stderr)
    for a, b in zip(rows, rows[1:]):
        tri_ratio = b["n_tris"] / a["n_tris"]
        t_ratio = b["s_per_pass"] / a["s_per_pass"]
        print(f"tris x{tri_ratio:.2f} -> time x{t_ratio:.2f} "
              f"({'SUBLINEAR' if t_ratio < tri_ratio else 'linear+'})",
              file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "scale":
        scaling_sweep(W=int(sys.argv[2]) if len(sys.argv) > 2 else 64)
    elif len(sys.argv) > 1 and sys.argv[1] == "scale-blob":
        # n_theta 64/112/180 -> 16k/50k/129k tris
        scaling_sweep(W=int(sys.argv[2]) if len(sys.argv) > 2 else 64,
                      axes=(64, 112, 180), scene_kind="blob")
    else:
        main()
