"""VRL integrator: per-pixel radiance as a sum of VRL x eye-ray integrals.

Counterpart of the `vrl` plugin (src/integrators/vrl/vrlIntegrator.cpp):
  * unclustered path = getVRLContributions (vrlIntegrator.cpp:792-825):
    every eye ray integrates against every VRL, normalized by the
    traced-particle count;
  * clustered path = getClusteredVrlContributions (:542-599): each pixel
    looks up its slice's representative VRLs + weights (see
    alvrl_tpu.integrators.vrl.cluster).

TPU mapping: eye rays are processed in tiles (sharded over the device
mesh by alvrl_tpu.parallel), VRLs in chunks via lax.scan — a
(ray-tile x vrl-chunk) blocked dense product, which is exactly the
transfer-matrix shape the clustering stage needs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import math as m
from alvrl_tpu.core import rng
from alvrl_tpu.film import film as film_mod
from alvrl_tpu.geometry import intersect
from alvrl_tpu.integrators.vrl.integrate import VRLConfig, pair_contribution
from alvrl_tpu.integrators.vrl.tracer import TracerConfig, trace
from alvrl_tpu.integrators.vrl.vrl import VRLs
from alvrl_tpu.scene.scene import Scene
from alvrl_tpu.sensors import perspective


def _chunk_uniforms(key, chunk_idx, shape_vv, shape_vs):
    k = rng.fold(key, chunk_idx)
    u_vv = rng.uniform(rng.fold(k, rng.P_VOLVOL), shape_vv)
    u_vs = rng.uniform(rng.fold(k, rng.P_VOLSURF), shape_vs)
    return u_vv, u_vs


def vrl_sum(scene: Scene, ray_o, ray_d, hit, vrls: VRLs, key, cfg: VRLConfig,
            weight=None):
    """Sum_i integrateVRL(ray, vrl_i) / particleCount for a ray batch.

    ray_o/ray_d: (B, 3); hit: Hit for those rays; weight: optional (B, 3)
    path weight (specular chains). Scans the VRL buffer in chunks of
    cfg.vrl_chunk. Returns (B, 3) radiance."""
    b = ray_o.shape[0]
    c = cfg.vrl_chunk
    n = vrls.capacity
    n_chunks = -(-n // c)
    pad = n_chunks * c - n

    def padded(a, fill=0):
        if pad == 0:
            return a
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, width, constant_values=fill)

    v_start = padded(vrls.start).reshape(n_chunks, c, 3)
    v_end = padded(vrls.end).reshape(n_chunks, c, 3)
    v_power = padded(vrls.power).reshape(n_chunks, c, 3)
    v_valid = padded(vrls.valid).reshape(n_chunks, c)

    expand = lambda a: a[:, None] if a.ndim == 1 else a[:, None, :]

    # grid media: per-ray and per-VRL cumulative-OD tables, built once
    # (the integrand interpolates instead of re-integrating)
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.media import heterogeneous as gmed_

    use_tables = not mapi_.is_homogeneous(scene.medium)
    if use_tables:
        nq = gmed_.N_TAU_STEPS
        eye_od = gmed_.cumulative_od(scene.medium, ray_o, hit.p)
        v_od = padded(
            gmed_.cumulative_od(scene.medium, vrls.start, vrls.end)
        ).reshape(n_chunks, c, nq + 1)
    else:
        eye_od = None
        v_od = jnp.zeros((n_chunks, 1, 1))

    def body(acc, inp):
        ci, vs, ve, vp, vv, vod = inp
        u_vv, u_vs = _chunk_uniforms(
            key, ci, (b, c, cfg.vol_vol_samples, 2), (b, c, cfg.vol_surf_samples)
        )
        total, _, _ = pair_contribution(
            scene,
            expand(ray_o),
            expand(ray_d),
            expand(hit.p),
            expand(hit.valid),
            expand(hit.ng),
            expand(hit.mat),
            vs[None],
            ve[None],
            vp[None],
            vv[None],
            u_vv,
            u_vs,
            cfg,
            weight=None if weight is None else expand(weight),
            eye_od=None if not use_tables else eye_od[:, None, :],
            vrl_od=None if not use_tables else vod[None],
        )
        return acc + jnp.sum(total, axis=1), None

    init = jnp.zeros((b, 3), jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        init,
        (jnp.arange(n_chunks), v_start, v_end, v_power, v_valid, v_od),
    )
    return acc / jnp.maximum(vrls.particle_count, 1.0)


class HitInfo:
    """Lightweight view bundling a Hit with material ids."""

    def __init__(self, hit, mat):
        self.p = hit.p
        self.valid = hit.valid
        self.ng = hit.ng
        self.ng_raw = hit.ng_raw
        self.t = hit.t
        self.prim = hit.prim
        self.mat = mat


def trace_eye_rays(scene: Scene, ray_o, ray_d) -> HitInfo:
    """Closest-hit + per-hit material id, packaged for the integrand."""
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices, scene.faces)
    # sanitize misses so masked arithmetic stays finite
    hit = hit._replace(p=jnp.where(hit.valid[..., None], hit.p, ray_o))
    mat = scene.material[jnp.maximum(hit.prim, 0)]
    return HitInfo(hit=hit, mat=mat)


def li_unclustered(scene: Scene, ray_o, ray_d, vrls: VRLs, key, cfg: VRLConfig):
    """Li for a batch of eye rays, unclustered (all VRLs).

    Eye rays escaping to infinity contribute 0, matching the reference's
    dropped-infinite-ray quirk (vrlIntegrator.cpp:418-423)."""
    hit = trace_eye_rays(scene, ray_o, ray_d)
    li = vrl_sum(scene, ray_o, ray_d, hit, vrls, key, cfg)
    return jnp.where(hit.valid[..., None], li, 0.0)


def li_unclustered_spec(
    scene: Scene, ray_o, ray_d, vrls: VRLs, key, cfg: VRLConfig,
    spec_cfg=None,
):
    """Unclustered Li including specular chains (LiInternal recursion,
    vrlIntegrator.cpp:445-511, as a bounded loop)."""
    from alvrl_tpu.integrators.vrl.specular import (
        SpecularConfig,
        li_specular_chain,
    )

    if spec_cfg is None:
        spec_cfg = SpecularConfig()

    def li_at_hit(o, d, hit, k, weight):
        return vrl_sum(scene, o, d, hit, vrls, k, cfg, weight=weight)

    return li_specular_chain(
        scene, ray_o, ray_d, li_at_hit, trace_eye_rays, key, spec_cfg
    )


# ---------------------------------------------------------------------------
# Pallas fast path (forward rendering / benchmark)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def render_with_vrls_pallas(scene: Scene, vrls: VRLs, key, cfg: VRLConfig = VRLConfig()):
    """Full-frame unclustered render through the Pallas (ray x vrl) tile
    kernel (alvrl_tpu.ops.vrl_pallas) — same estimator as
    render_with_vrls, VMEM-resident hot loop."""
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    cam = scene.camera
    w, h = cam.width, cam.height
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices, scene.faces)

    ray_pack = pk.pack_rays(scene, ray_o, ray_d, hit)
    vrl_pack = pk.pack_vrls(vrls)
    tri_flat = pk.pack_tris(scene)
    med_pack = pk.pack_medium(scene)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    out = vp.vrl_sum_pallas(
        ray_pack, vrl_pack, tri_flat, med_pack, seed,
        vol_vol_samples=cfg.vol_vol_samples,
        vol_surf_samples=cfg.vol_surf_samples,
        short_vrls=cfg.short_vrls,
        phase_kind=scene.medium.phase_kind,
    )
    n = px.shape[0]
    li = out.T[:n] / jnp.maximum(vrls.particle_count, 1.0)
    li = jnp.where(hit.valid[..., None], li, 0.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


def render_with_vrls_pallas_spec(scene: Scene, vrls: VRLs, key,
                                 cfg: VRLConfig = VRLConfig(),
                                 spec_cfg=None):
    """Unclustered Pallas render WITH specular chains: the bounded
    delta-BSDF recursion (vrlIntegrator.cpp:445-511) runs on the XLA
    side producing per-depth weighted eye segments; each depth's gather
    is one launch of the SAME pair-tile kernel (the chain weight
    multiplies the kernel's per-ray output — linearity folds it in
    without touching the kernel)."""
    from alvrl_tpu.integrators.vrl.specular import (
        SpecularConfig,
        li_specular_chain,
    )
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    if spec_cfg is None:
        spec_cfg = SpecularConfig()
    cam = scene.camera
    w, h = cam.width, cam.height
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    n = px.shape[0]

    vrl_pack = pk.pack_vrls(vrls)
    tri_flat = pk.pack_tris(scene)
    med_pack = pk.pack_medium(scene)

    def li_at_hit(o, d, hit, k, weight):
        ray_pack = pk.pack_rays(scene, o, d, hit)
        seed = jax.random.randint(k, (1,), 0, 2**31 - 1, dtype=jnp.int32)
        out = vp.vrl_sum_pallas(
            ray_pack, vrl_pack, tri_flat, med_pack, seed,
            vol_vol_samples=cfg.vol_vol_samples,
            vol_surf_samples=cfg.vol_surf_samples,
            short_vrls=cfg.short_vrls,
            phase_kind=scene.medium.phase_kind,
        )
        return out.T[:n] * weight

    li = li_specular_chain(
        scene, ray_o, ray_d, li_at_hit, trace_eye_rays, key, spec_cfg
    )
    li = li / jnp.maximum(vrls.particle_count, 1.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


def render_with_vrls_pallas_bvh(scene: Scene, vrls: VRLs, key,
                                cfg: VRLConfig = VRLConfig(),
                                leaf_size: int = None):
    """Large-mesh unclustered Pallas render: the two-level occlusion
    kernel streams BVH-leaf triangle clusters from HBM (no SMEM
    triangle cap; ops.vrl_pallas.vrl_sum_pallas_bvh). Primary hits
    traverse the device BVH; the VRL buffer is Morton-sorted so each
    kernel tile's segment-union AABB culls distant clusters."""
    from alvrl_tpu.geometry import bvh as bvh_mod
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    cam = scene.camera
    w, h = cam.width, cam.height
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)

    # primary hits through the BVH, in ray chunks (the TPU lowering of
    # the vmapped traversal materializes a per-lane copy of the
    # triangle table; chunking bounds it)
    b = bvh_mod.build(scene.vertices, scene.faces)
    chunk = 512
    n_rays = ray_o.shape[0]
    n_ch = -(-n_rays // chunk)
    pad_n = n_ch * chunk - n_rays
    o_p = jnp.pad(ray_o, ((0, pad_n), (0, 0)))
    d_p = jnp.pad(ray_d, ((0, pad_n), (0, 0)), constant_values=1.0)

    # one device dispatch per chunk: a single fused traversal over the
    # whole frame runs long enough to trip the device watchdog
    hits_one = jax.jit(jax.vmap(lambda o, d: bvh_mod.intersect(b, o, d)))
    parts = [hits_one(o_p[i * chunk:(i + 1) * chunk],
                      d_p[i * chunk:(i + 1) * chunk])
             for i in range(n_ch)]
    t = jnp.concatenate([p[0] for p in parts])[:n_rays]
    prim = jnp.concatenate([p[1] for p in parts])[:n_rays]
    valid = jnp.concatenate([p[2] for p in parts])[:n_rays]
    p = jnp.where(valid[:, None], ray_o + t[:, None] * ray_d, ray_o)
    f = scene.faces[jnp.maximum(prim, 0)]
    va, vb, vc = (scene.vertices[f[:, 0]], scene.vertices[f[:, 1]],
                  scene.vertices[f[:, 2]])
    ng_raw = m.normalize(jnp.cross(vb - va, vc - va))
    ng = jnp.where(m.dot(ng_raw, ray_d)[:, None] > 0, -ng_raw, ng_raw)
    hit = intersect.Hit(t=t, prim=prim, valid=valid, p=p, ng=ng,
                        ng_raw=ng_raw,
                        uv=jnp.zeros((px.shape[0], 2), jnp.float32))

    vrls_s = vp.sort_vrls_morton(vrls)
    ray_pack = pk.pack_rays(scene, ray_o, ray_d, hit)
    vrl_pack = pk.pack_vrls(vrls_s)
    clb, sclb, blocks, n_clusters = vp.pack_tri_clusters(
        scene.vertices, scene.faces, np.asarray(scene.opaque_faces()))
    med_pack = pk.pack_medium(scene)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    out = vp.vrl_sum_pallas_bvh(
        ray_pack, vrl_pack, clb, sclb, blocks, med_pack, seed,
        n_clusters=n_clusters,
        vol_vol_samples=cfg.vol_vol_samples,
        vol_surf_samples=cfg.vol_surf_samples,
        short_vrls=cfg.short_vrls,
        phase_kind=scene.medium.phase_kind,
    )
    n = px.shape[0]
    li = out.T[:n] / jnp.maximum(vrls.particle_count, 1.0)
    li = jnp.where(hit.valid[..., None], li, 0.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


def render_clustered_pallas(
    scene: Scene,
    vrls: VRLs,
    slice_of_pixel,   # (H*W,) int32 rows into the tables (host or device)
    table_vrls,       # (S, Cmax) int32, Cmax <= 128
    table_weights,    # (S, Cmax) f32
    key,
    cfg: VRLConfig = VRLConfig(),
):
    """Clustered render through the Pallas gather-DMA kernel: pixels are
    grouped by slice on the host, each 128-ray tile streams its slice's
    representative table into VMEM (ops.vrl_pallas.vrl_sum_pallas_clustered).
    Falls back to render_clustered when a slice has > 128 representatives.
    Grid media dispatch to the heterogeneous kernel (CP density factors;
    ops.vrl_pallas.vrl_sum_pallas_hetero_clustered)."""
    import numpy as np

    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    if not mapi_.is_homogeneous(scene.medium):
        return render_clustered_pallas_hetero(
            scene, vrls, slice_of_pixel, table_vrls, table_weights, key,
            cfg,
        )

    cmax = int(table_vrls.shape[1])
    # tables wider than one 128-lane tile run as ceil(cmax/128) chunked
    # kernel launches whose outputs sum (representative contributions
    # are additive) — adaptive refinement routinely widens past 128 at
    # large VRL counts and the old whole-pass XLA fallback cost ~20x
    cmax2 = -(-cmax // vp.VRL_TILE) * vp.VRL_TILE

    cam = scene.camera
    w, h = cam.width, cam.height
    sop = np.asarray(slice_of_pixel)
    n = sop.shape[0]

    # host: group pixel indices by slice, pad each group to the ray tile
    order = np.argsort(sop, kind="stable")
    sop_sorted = sop[order]
    groups = []
    tile_slices = []
    start = 0
    for end in np.flatnonzero(np.diff(sop_sorted)).tolist() + [n - 1]:
        end = end + 1
        idx = order[start:end]
        s_id = int(sop_sorted[start])
        pad = (-len(idx)) % vp.RAY_TILE
        idx_p = np.concatenate([idx, np.full(pad, -1, np.int64)])
        groups.append(idx_p)
        tile_slices += [s_id] * (len(idx_p) // vp.RAY_TILE)
        start = end
    perm = np.concatenate(groups)           # (B_padded,) -1 = dummy
    tile_slice = jnp.asarray(np.asarray(tile_slices, np.int32))

    # device: rays + hits for real pixels, packed then permuted
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices, scene.faces)
    ray_pack = pk.pack_rays(scene, ray_o, ray_d, hit)[:n]
    perm_j = jnp.asarray(np.where(perm < 0, 0, perm))
    dummy = jnp.asarray(perm < 0)
    ray_pack_p = jnp.where(
        dummy[:, None], 0.0, ray_pack[perm_j]
    )

    # per-slice representative tables, weights folded into power
    tv = jnp.asarray(table_vrls)
    tw = jnp.asarray(table_weights)
    s_rows = tv.shape[0]
    pad_c = cmax2 - cmax
    idx = tv  # (S, Cmax)
    valid = vrls.valid[idx] & (tw > 0)
    tables = jnp.zeros((s_rows, vp.VRL_ROWS, cmax2), jnp.float32)
    def put(rowbase, arr):  # arr (S, Cmax, 3)
        nonlocal tables
        a = jnp.pad(arr, ((0, 0), (0, pad_c), (0, 0)))
        tables = tables.at[:, rowbase:rowbase + 3, :].set(
            jnp.moveaxis(a, -1, 1)
        )
    put(vp._VS, vrls.start[idx])
    put(vp._VE, vrls.end[idx])
    put(vp._VP, vrls.power[idx] * tw[..., None])
    tables = tables.at[:, vp._VVALID, :].set(
        jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, pad_c)))
    )

    tri_flat = pk.pack_tris(scene)
    med_pack = pk.pack_medium(scene)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    out = 0.0
    for j in range(cmax2 // vp.VRL_TILE):
        out = out + vp.vrl_sum_pallas_clustered(
            ray_pack_p,
            tables[:, :, j * vp.VRL_TILE:(j + 1) * vp.VRL_TILE],
            tile_slice, tri_flat, med_pack, seed + 7919 * j,
            vol_vol_samples=cfg.vol_vol_samples,
            vol_surf_samples=cfg.vol_surf_samples,
            short_vrls=cfg.short_vrls,
            phase_kind=scene.medium.phase_kind,
        )
    li_perm = out.T  # (B_padded, 3)
    # scatter back to pixel order
    li = jnp.zeros((n, 3), jnp.float32)
    li = li.at[perm_j].add(jnp.where(dummy[:, None], 0.0, li_perm))
    li = li / jnp.maximum(vrls.particle_count, 1.0)
    li = jnp.where(hit.valid[..., None], li, 0.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


CP_RANK = 48          # CP density rank (ops.cp: 3.6e-4 rel RMS on the
                      # config-4 plume; bias budget <5e-4 vs the XLA path)
CP_ERR_FALLBACK = 7e-3  # fields that do not compress fall back to XLA


@partial(jax.jit, static_argnames=())
def _hetero_pack_rays(scene: Scene, ray_o, ray_d, hit):
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk

    return pk.pack_rays_hetero(mapi_.prepare_scene(scene), ray_o, ray_d,
                               hit)


@partial(jax.jit, static_argnames=("pad_c",))
def _hetero_tables(scene: Scene, vrls: VRLs, table_vrls, table_weights,
                   pad_c: int):
    """Per-slice representative tables for the hetero clustered kernel:
    (S, H_VRL_ROWS, 128) with weights folded into power and the per-rep
    cumulative-OD rows."""
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.media import heterogeneous as gmed_
    from alvrl_tpu.ops import vrl_pallas as vp

    scene = mapi_.prepare_scene(scene)
    vrl_od_full = gmed_.cumulative_od(scene.medium, vrls.start, vrls.end)
    tv = jnp.asarray(table_vrls)
    tw = jnp.asarray(table_weights)
    s_rows = tv.shape[0]
    idx = tv
    valid = vrls.valid[idx] & (tw > 0)
    width = tv.shape[1] + pad_c   # a 128 multiple (chunked launches)
    tables = jnp.zeros((s_rows, vp.H_VRL_ROWS, width), jnp.float32)

    def put(rowbase, arr):
        nonlocal tables
        a = jnp.pad(arr, ((0, 0), (0, pad_c), (0, 0)))
        tables = tables.at[:, rowbase:rowbase + a.shape[-1], :].set(
            jnp.moveaxis(a, -1, 1)
        )

    put(vp._VS, vrls.start[idx])
    put(vp._VE, vrls.end[idx])
    put(vp._VP, vrls.power[idx] * tw[..., None])
    put(vp._VOD, vrl_od_full[idx])
    tables = tables.at[:, vp._VVALID, :].set(
        jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, pad_c)))
    )
    return tables


def render_clustered_pallas_hetero(
    scene: Scene,
    vrls: VRLs,
    slice_of_pixel,
    table_vrls,
    table_weights,
    key,
    cfg: VRLConfig = VRLConfig(),
    cp_rank: int = CP_RANK,
):
    """Grid-medium clustered render through the Pallas hetero kernel.
    CP density factors are fitted once per density grid on the host
    (cached); non-compressible fields fall back to the XLA path."""
    import numpy as np

    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    cmax = int(table_vrls.shape[1])
    # wide tables (cmax > 128) run as chunked kernel launches, as in
    # the homogeneous path
    cmax2 = -(-cmax // vp.VRL_TILE) * vp.VRL_TILE
    cp_pack, cp_err = pk.pack_cp(scene.medium, rank=cp_rank)
    if cp_err > CP_ERR_FALLBACK:
        from alvrl_tpu.core.logging import get_logger

        get_logger("vrl").warning(
            "CP fit error %.2e exceeds %.0e: falling back to the XLA "
            "clustered render", cp_err, CP_ERR_FALLBACK)
        return render_clustered(
            scene, vrls, slice_of_pixel, table_vrls, table_weights, key, cfg
        )

    cam = scene.camera
    w, h = cam.width, cam.height
    sop = np.asarray(slice_of_pixel)
    n = sop.shape[0]

    # host: group pixel indices by slice, pad each group to the ray tile
    order = np.argsort(sop, kind="stable")
    sop_sorted = sop[order]
    groups = []
    tile_slices = []
    start = 0
    for end in np.flatnonzero(np.diff(sop_sorted)).tolist() + [n - 1]:
        end = end + 1
        idx = order[start:end]
        s_id = int(sop_sorted[start])
        pad = (-len(idx)) % vp.RAY_TILE
        idx_p = np.concatenate([idx, np.full(pad, -1, np.int64)])
        groups.append(idx_p)
        tile_slices += [s_id] * (len(idx_p) // vp.RAY_TILE)
        start = end
    perm = np.concatenate(groups)
    tile_slice = jnp.asarray(np.asarray(tile_slices, np.int32))

    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices, scene.faces)
    ray_pack = _hetero_pack_rays(scene, ray_o, ray_d, hit)[:n]
    perm_j = jnp.asarray(np.where(perm < 0, 0, perm))
    dummy = jnp.asarray(perm < 0)
    ray_pack_p = jnp.where(dummy[:, None], 0.0, ray_pack[perm_j])

    tables = _hetero_tables(scene, vrls, table_vrls, table_weights,
                            cmax2 - cmax)

    tri_flat = pk.pack_tris(scene)
    med_pack = pk.pack_medium_hetero(scene.medium)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    out = 0.0
    for j in range(cmax2 // vp.VRL_TILE):
        out = out + vp.vrl_sum_pallas_hetero_clustered(
            ray_pack_p,
            tables[:, :, j * vp.VRL_TILE:(j + 1) * vp.VRL_TILE],
            tile_slice, tri_flat, med_pack, cp_pack, seed + 7919 * j,
            n_cp=cp_rank,
            vol_vol_samples=cfg.vol_vol_samples,
            vol_surf_samples=cfg.vol_surf_samples,
            short_vrls=cfg.short_vrls,
            phase_kind=scene.medium.phase_kind,
            uv_steps=cfg.uv_tau_steps,
        )
    li_perm = out.T
    li = jnp.zeros((n, 3), jnp.float32)
    li = li.at[perm_j].add(jnp.where(dummy[:, None], 0.0, li_perm))
    li = li / jnp.maximum(vrls.particle_count, 1.0)
    li = jnp.where(hit.valid[..., None], li, 0.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


def render_with_vrls_pallas_hetero(scene: Scene, vrls: VRLs, key,
                                   cfg: VRLConfig = VRLConfig(),
                                   cp_rank: int = CP_RANK):
    """Full-frame UNCLUSTERED grid-medium render through the hetero
    Pallas kernel — the brute-force (rays x vrls) product for grid
    media (the regime where the XLA path pays per-pair quadrature
    gathers)."""
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    cp_pack, cp_err = pk.pack_cp(scene.medium, rank=cp_rank)
    if cp_err > CP_ERR_FALLBACK:
        return render_with_vrls(scene, vrls, key, cfg)

    cam = scene.camera
    w, h = cam.width, cam.height
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices, scene.faces)

    ray_pack = _hetero_pack_rays(scene, ray_o, ray_d, hit)
    vrl_pack = _hetero_pack_vrls(scene, vrls)
    tri_flat = pk.pack_tris(scene)
    med_pack = pk.pack_medium_hetero(scene.medium)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    out = vp.vrl_sum_pallas_hetero(
        ray_pack, vrl_pack, tri_flat, med_pack, cp_pack, seed,
        n_cp=cp_rank,
        vol_vol_samples=cfg.vol_vol_samples,
        vol_surf_samples=cfg.vol_surf_samples,
        short_vrls=cfg.short_vrls,
        phase_kind=scene.medium.phase_kind,
        uv_steps=cfg.uv_tau_steps,
    )
    n = px.shape[0]
    li = out.T[:n] / jnp.maximum(vrls.particle_count, 1.0)
    li = jnp.where(hit.valid[..., None], li, 0.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


@partial(jax.jit, static_argnames=())
def _hetero_pack_vrls(scene: Scene, vrls: VRLs):
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk

    return pk.pack_vrls_hetero(vrls, mapi_.prepare_scene(scene).medium)


@partial(jax.jit, static_argnames=("cfg",))
def render_with_vrls_pallas_diff(scene: Scene, vrls: VRLs, key,
                                 cfg: VRLConfig = VRLConfig()):
    """Differentiable unclustered Pallas render: same image as
    render_with_vrls_pallas, but gradients flow to scene.medium
    (sigma_a/sigma_s/g), emitter-scaled VRL powers, and the pack-side
    eye-surface transmittance via the seed-replay backward kernel
    (ops.vrl_pallas_bwd.vrl_sum_diff). Geometry stays detached (the
    detached-sampling contract)."""
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_diff

    cam = scene.camera
    w, h = cam.width, cam.height
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices, scene.faces)

    ray_pack = pk.pack_rays(scene, ray_o, ray_d, hit)
    vrl_pack = pk.pack_vrls(vrls)
    tri_flat = pk.pack_tris(scene)
    med_pack = pk.pack_medium(scene)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    out = vrl_sum_diff(
        ray_pack, vrl_pack, med_pack, tri_flat, seed,
        cfg.vol_vol_samples, cfg.vol_surf_samples, cfg.short_vrls,
        scene.medium.phase_kind,
    )
    n = px.shape[0]
    li = out.T[:n] / jnp.maximum(vrls.particle_count, 1.0)
    li = jnp.where(hit.valid[..., None], li, 0.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


@partial(jax.jit, static_argnames=("cfg", "n_cp"))
def render_with_vrls_pallas_hetero_diff(
    scene: Scene, vrls: VRLs, key, cp_pack, dens_scale,
    cfg: VRLConfig = VRLConfig(), n_cp: int = CP_RANK,
):
    """Differentiable grid-medium unclustered Pallas render: gradients
    flow to scene.medium (sigma_t_color / sigma_s_color / g / the
    density voxels and med.scale through the cumulative-OD table
    cotangents), emitter-scaled VRL powers, an explicit dens_scale
    multiplier, and (round 5) cp_pack itself: the kernel returns EXACT
    per-entry CP factor cotangents, so jax.grad w.r.t. cp_pack is real
    and chains to the density voxels through ops.cp.fit_medium_vjp's
    implicit fit VJP — the full per-voxel route at kernel speed (see
    ops/vrl_pallas_bwd module docstring and
    scripts/recover_density.py)."""
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_hetero_diff

    scene_p = mapi_.prepare_scene(scene)
    cam = scene.camera
    w, h = cam.width, cam.height
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px = px.reshape(-1)
    py = py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)

    ray_pack = pk.pack_rays_hetero(scene_p, ray_o, ray_d, hit)
    vrl_pack = pk.pack_vrls_hetero(vrls, scene_p.medium)
    tri_flat = pk.pack_tris(scene_p)
    med_pack = pk.pack_medium_hetero(scene_p.medium)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    out = vrl_sum_hetero_diff(
        ray_pack, vrl_pack, med_pack, cp_pack, dens_scale, tri_flat,
        seed, n_cp, cfg.vol_vol_samples, cfg.vol_surf_samples,
        cfg.short_vrls, scene.medium.phase_kind, cfg.uv_tau_steps,
    )
    n = px.shape[0]
    li = out.T[:n] / jnp.maximum(vrls.particle_count, 1.0)
    li = jnp.where(hit.valid[..., None], li, 0.0)
    img, wgt = film_mod.splat_box(w, h, px, py, li)
    return film_mod.develop(img, wgt)


# ---------------------------------------------------------------------------
# Clustered path (Adaptive LightSlice)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def build_R(scene: Scene, ray_o, ray_d, vrls: VRLs, key, cfg: VRLConfig):
    """Transfer matrix R over representative rays: per (ray, vrl)
    luminance mean and variance-of-mean of the unclustered estimator
    (getLiLuminanceVrlContributions, vrlIntegrator.cpp:527-539).
    Returns (mean (P, N), var (P, N)) — the clustering's input."""
    from alvrl_tpu.media import api as mapi_

    scene = mapi_.prepare_scene(scene)
    b = ray_o.shape[0]
    hit = trace_eye_rays(scene, ray_o, ray_d)
    c = cfg.vrl_chunk
    n = vrls.capacity
    n_chunks = -(-n // c)
    pad = n_chunks * c - n

    def padded(a):
        if pad == 0:
            return a
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    v_start = padded(vrls.start).reshape(n_chunks, c, 3)
    v_end = padded(vrls.end).reshape(n_chunks, c, 3)
    v_power = padded(vrls.power).reshape(n_chunks, c, 3)
    v_valid = padded(vrls.valid).reshape(n_chunks, c)

    expand = lambda a: a[:, None] if a.ndim == 1 else a[:, None, :]
    norm = 1.0 / jnp.maximum(vrls.particle_count, 1.0)

    # grid media: the same cumulative-OD tables the render path uses
    # (without them every R entry paid a fresh 16-step quadrature —
    # the R build dominated the config-4 warm pass)
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.media import heterogeneous as gmed_

    use_tables = not mapi_.is_homogeneous(scene.medium)
    if use_tables:
        nq = gmed_.N_TAU_STEPS
        eye_od = gmed_.cumulative_od(scene.medium, ray_o, hit.p)
        v_od = padded(
            gmed_.cumulative_od(scene.medium, vrls.start, vrls.end)
        ).reshape(n_chunks, c, nq + 1)
    else:
        eye_od = None
        v_od = jnp.zeros((n_chunks, 1, 1))

    def body(_, inp):
        ci, vs, ve, vp, vv, vod = inp
        u_vv, u_vs = _chunk_uniforms(
            key, ci, (b, c, cfg.vol_vol_samples, 2), (b, c, cfg.vol_surf_samples)
        )
        _, lum_mean, lum_var = pair_contribution(
            scene,
            expand(ray_o), expand(ray_d),
            expand(hit.p), expand(hit.valid), expand(hit.ng), expand(hit.mat),
            vs[None], ve[None], vp[None], vv[None],
            u_vv, u_vs, cfg,
            eye_od=None if not use_tables else eye_od[:, None, :],
            vrl_od=None if not use_tables else vod[None],
        )
        # normalization as accumulated into vrlContributions
        # (getVRLContributions, :810-813): mean * norm, var * norm^2
        return None, (lum_mean * norm, lum_var * norm * norm)

    _, (means, variances) = jax.lax.scan(
        body, None,
        (jnp.arange(n_chunks), v_start, v_end, v_power, v_valid, v_od),
    )
    # (n_chunks, B, c) -> (B, N)
    means = jnp.moveaxis(means, 0, 1).reshape(b, n_chunks * c)[:, :n]
    variances = jnp.moveaxis(variances, 0, 1).reshape(b, n_chunks * c)[:, :n]
    return means, variances


@partial(jax.jit, static_argnames=("cfg",))
def _build_r_pallas_jit(scene: Scene, ray_o, ray_d, vrls: VRLs, seed,
                        cfg: VRLConfig):
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    scene = mapi_.prepare_scene(scene)
    hit = trace_eye_rays(scene, ray_o, ray_d)
    ray_pack = pk.pack_rays(scene, ray_o, ray_d, hit)
    vrl_pack = pk.pack_vrls(vrls)
    return vp.vrl_r_pallas(
        ray_pack, vrl_pack, pk.pack_tris(scene), pk.pack_medium(scene),
        seed, cfg.vol_vol_samples, cfg.vol_surf_samples, cfg.short_vrls,
        scene.medium.phase_kind)


@partial(jax.jit, static_argnames=("cfg", "n_cp"))
def _build_r_pallas_hetero_jit(scene: Scene, ray_o, ray_d, vrls: VRLs,
                               cp_pack, seed, cfg: VRLConfig, n_cp: int):
    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp

    scene = mapi_.prepare_scene(scene)
    hit = trace_eye_rays(scene, ray_o, ray_d)
    ray_pack = pk.pack_rays_hetero(scene, ray_o, ray_d, hit)
    vrl_pack = pk.pack_vrls_hetero(vrls, scene.medium)
    return vp.vrl_r_pallas_hetero(
        ray_pack, vrl_pack, pk.pack_tris(scene),
        pk.pack_medium_hetero(scene.medium), cp_pack, seed, n_cp,
        cfg.vol_vol_samples, cfg.vol_surf_samples, cfg.short_vrls,
        scene.medium.phase_kind, cfg.uv_tau_steps)


def build_R_pallas(scene: Scene, ray_o, ray_d, vrls: VRLs, key,
                   cfg: VRLConfig):
    """build_R through the Pallas pair-tile kernel in R mode
    (ops.vrl_pallas.vrl_r_pallas[_hetero]): same luminance mean /
    variance-of-mean semantics, at kernel speed instead of the XLA
    AD-graph estimator — the R build dominated the clustered pass at
    large VRL counts (VERDICT r03 next-round item 4; reference
    counterpart: Rbuilder threads, vrlIntegrator.cpp:1038-1083).
    Falls back to build_R for grid media whose density does not
    CP-compress. The RNG stream differs from build_R's (both are
    unbiased estimates of the same transfer matrix)."""
    from alvrl_tpu.media import api as mapi_

    b = ray_o.shape[0]
    n = vrls.capacity
    seed = jax.random.randint(key, (1,), 0, 2 ** 31 - 1, dtype=jnp.int32)
    if mapi_.is_homogeneous(scene.medium):
        out = _build_r_pallas_jit(scene, ray_o, ray_d, vrls, seed, cfg)
    else:
        from alvrl_tpu.ops import pack as pk

        cp_pack, cp_err = pk.pack_cp(scene.medium, rank=CP_RANK)
        if cp_err > CP_ERR_FALLBACK:
            return build_R(scene, ray_o, ray_d, vrls, key, cfg)
        out = _build_r_pallas_hetero_jit(
            scene, ray_o, ray_d, vrls, cp_pack, seed, cfg, CP_RANK)
    norm = 1.0 / jnp.maximum(vrls.particle_count, 1.0)
    mean = out[0, :b, :n] * norm
    var = out[1, :b, :n] * (norm * norm)
    return mean, var


@partial(jax.jit, static_argnames=("cfg", "ray_tile", "band_h"))
def _render_clustered_rows(
    scene: Scene, vrls: VRLs, slice_rows, table_vrls, table_weights,
    key, y_off, band_h: int, cfg: VRLConfig, ray_tile: int,
):
    """Clustered li for scanline rows [y_off, y_off+band_h);
    slice_rows: (band_h * W,) table rows for those pixels."""
    from alvrl_tpu.media import api as mapi_

    scene = mapi_.prepare_scene(scene)
    cam = scene.camera
    w = cam.width
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(band_h))
    px = px.reshape(-1)
    py = py.reshape(-1) + y_off
    return _clustered_li(
        scene, vrls, slice_rows, table_vrls, table_weights,
        rng.fold(key, y_off), px, py, cfg, ray_tile,
    ).reshape(band_h, w, 3)


def render_clustered(
    scene: Scene,
    vrls: VRLs,
    slice_of_pixel,   # (H*W,) int32 row into the tables (fallback row appended)
    table_vrls,       # (S+1, Cmax) int32
    table_weights,    # (S+1, Cmax) f32; 0 padding
    key,
    cfg: VRLConfig = VRLConfig(),
    ray_tile: int = 2048,
    host_bands: int = 1,
):
    """Clustered render: pixel -> slice -> representative VRLs+weights
    (getClusteredVrlContributions, vrlIntegrator.cpp:542-599).
    `host_bands` splits the frame into separate device calls (see
    render_with_vrls)."""
    w, h = scene.camera.width, scene.camera.height
    assert h % host_bands == 0
    band_h = h // host_bands
    sop = slice_of_pixel.reshape(h, w)
    rows = [
        _render_clustered_rows(
            scene, vrls, sop[b * band_h:(b + 1) * band_h].reshape(-1),
            table_vrls, table_weights, key, jnp.int32(b * band_h),
            band_h, cfg, ray_tile,
        )
        for b in range(host_bands)
    ]
    img = jnp.concatenate(rows, axis=0)
    return img


_clustered_li_jit = None  # set below (jit over the function that follows)


def _clustered_li(
    scene: Scene, vrls: VRLs, slice_of_pixel, table_vrls, table_weights,
    key, px, py, cfg: VRLConfig, ray_tile: int,
):
    ray_o, ray_d = perspective.sample_ray(scene.camera, px, py)
    n = px.shape[0]
    cmax = table_vrls.shape[1]

    n_tiles = -(-n // ray_tile)
    pad = n_tiles * ray_tile - n
    if pad:
        ray_o = jnp.pad(ray_o, ((0, pad), (0, 0)))
        ray_d = jnp.pad(ray_d, ((0, pad), (0, 0)), constant_values=1.0)
        slice_of_pixel = jnp.pad(slice_of_pixel, (0, pad))

    norm = 1.0 / jnp.maximum(vrls.particle_count, 1.0)

    from alvrl_tpu.media import api as mapi_
    from alvrl_tpu.media import heterogeneous as gmed_

    use_tables = not mapi_.is_homogeneous(scene.medium)
    if use_tables:
        vrl_od_full = gmed_.cumulative_od(
            scene.medium, vrls.start, vrls.end
        )  # (N, n+1), built once per frame

    def tile_fn(args):
        i, o_t, d_t, sl_t = args
        b = o_t.shape[0]
        hit = trace_eye_rays(scene, o_t, d_t)
        ids = table_vrls[sl_t]          # (b, Cmax)
        wgt = table_weights[sl_t]       # (b, Cmax)
        k = rng.fold(key, i, rng.P_CLUSTER)
        u_vv = rng.uniform(
            rng.fold(k, rng.P_VOLVOL), (b, cmax, cfg.vol_vol_samples, 2)
        )
        u_vs = rng.uniform(
            rng.fold(k, rng.P_VOLSURF), (b, cmax, cfg.vol_surf_samples)
        )
        expand = lambda a: a[:, None] if a.ndim == 1 else a[:, None, :]
        if use_tables:
            eye_od_t = gmed_.cumulative_od(scene.medium, o_t, hit.p)
            eye_od_kw = eye_od_t[:, None, :]
            vrl_od_kw = vrl_od_full[ids]
        else:
            eye_od_kw = None
            vrl_od_kw = None
        total, _, _ = pair_contribution(
            scene,
            expand(o_t), expand(d_t),
            expand(hit.p), expand(hit.valid), expand(hit.ng), expand(hit.mat),
            vrls.start[ids], vrls.end[ids], vrls.power[ids],
            vrls.valid[ids] & (wgt > 0),
            u_vv, u_vs, cfg,
            eye_od=eye_od_kw, vrl_od=vrl_od_kw,
        )
        li = jnp.sum(total * wgt[..., None], axis=1) * norm
        return jnp.where(hit.valid[..., None], li, 0.0)

    li = jax.lax.map(
        tile_fn,
        (
            jnp.arange(n_tiles),
            ray_o.reshape(n_tiles, ray_tile, 3),
            ray_d.reshape(n_tiles, ray_tile, 3),
            slice_of_pixel.reshape(n_tiles, ray_tile),
        ),
    )
    return li.reshape(-1, 3)[:n]


_clustered_li_jit = partial(
    jax.jit, static_argnames=("cfg", "ray_tile")
)(_clustered_li)


@partial(jax.jit, static_argnames=("cfg", "tracer_cfg", "num_particles", "ray_tile"))
def render_unclustered(
    scene: Scene,
    key,
    num_particles: int = 64,
    cfg: VRLConfig = VRLConfig(),
    tracer_cfg: TracerConfig = TracerConfig(),
    ray_tile: int = 2048,
):
    """One progressive pass: trace VRLs, integrate every pixel against
    them, return (image (H, W, 3), vrls). Pixel centers, one eye ray per
    pixel (the reference renders 1 spp per pass and accumulates passes,
    integrator.cpp:380-440)."""
    k_trace, k_render = jax.random.split(key)
    vrls = trace(scene, k_trace, num_particles, tracer_cfg)
    img = render_with_vrls(scene, vrls, k_render, cfg, ray_tile)
    return img, vrls


@partial(jax.jit, static_argnames=("cfg", "ray_tile", "band_h", "antialias"))
def _render_rows(scene: Scene, vrls: VRLs, key, y_off, band_h: int,
                 cfg: VRLConfig, ray_tile: int, antialias: bool = False):
    """Unclustered li for scanline rows [y_off, y_off + band_h)."""
    from alvrl_tpu.media import api as mapi_

    scene = mapi_.prepare_scene(scene)
    cam = scene.camera
    w = cam.width
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(band_h))
    px = px.reshape(-1)
    py = py.reshape(-1) + y_off
    jitter = None
    if antialias:
        # sub-pixel jitter per pass (the reference draws a fresh film
        # sample each progressive pass, integrator.cpp renderBlock)
        jitter = rng.uniform(
            rng.fold(key, rng.P_PIXEL, 1), (px.shape[0], 2)
        )
    ray_o, ray_d = perspective.sample_ray(cam, px, py, jitter=jitter)

    n = px.shape[0]
    n_tiles = -(-n // ray_tile)
    pad = n_tiles * ray_tile - n
    if pad:
        ray_o = jnp.pad(ray_o, ((0, pad), (0, 0)))
        ray_d = jnp.pad(ray_d, ((0, pad), (0, 0)), constant_values=1.0)

    def tile_fn(args):
        i, o_t, d_t = args
        k = rng.fold(key, i, rng.P_PIXEL)
        return li_unclustered(scene, o_t, d_t, vrls, rng.fold(k, y_off), cfg)

    li = jax.lax.map(
        tile_fn,
        (
            jnp.arange(n_tiles),
            ray_o.reshape(n_tiles, ray_tile, 3),
            ray_d.reshape(n_tiles, ray_tile, 3),
        ),
    )
    return li.reshape(-1, 3)[:n].reshape(band_h, w, 3)


def render_with_vrls(
    scene: Scene, vrls: VRLs, key, cfg: VRLConfig = VRLConfig(),
    ray_tile: int = 2048, host_bands: int = 1, antialias: bool = False,
):
    """Full-frame unclustered render. `host_bands` > 1 splits the frame
    into scanline bands issued as separate device calls — required for
    very large frame x VRL workloads where a single execution would
    exceed the runtime's per-call limits (one compile: the row offset is
    a dynamic scalar)."""
    h = scene.camera.height
    assert h % host_bands == 0, (h, host_bands)
    band_h = h // host_bands
    rows = [
        _render_rows(scene, vrls, key, jnp.int32(b * band_h), band_h,
                     cfg, ray_tile, antialias)
        for b in range(host_bands)
    ]
    return jnp.concatenate(rows, axis=0)
