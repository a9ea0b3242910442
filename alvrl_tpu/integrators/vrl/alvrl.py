"""The full ALVRL pipeline: trace -> slice -> transfer matrix -> cluster
-> clustered render.

Counterpart of vrlIntegrator::{preprocess,prepass} + the clustered render
(vrlIntegrator.cpp:237-356, 542-599), orchestrating device kernels
(tracing, R build, clustered integration) around the host-side
clustering of alvrl_tpu.integrators.vrl.cluster.

Pixel indexing convention: row-major (y * W + x). (The reference uses
column-major `y + H*x`, vrlIntegrator.cpp:560 — an internal layout
choice with no observable effect.)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import rng
from alvrl_tpu.geometry import intersect
from alvrl_tpu.integrators.vrl import cluster as cl
from alvrl_tpu.integrators.vrl.integrate import VRLConfig
from alvrl_tpu.integrators.vrl.integrator import (
    build_R,
    build_R_pallas,
    render_clustered,
    trace_eye_rays,
)
from alvrl_tpu.integrators.vrl.tracer import TracerConfig, trace
from alvrl_tpu.integrators.vrl.vrl import VRLs, compact
from alvrl_tpu.scene.scene import Scene
from alvrl_tpu.sensors import perspective


@dataclass
class ALVRLParams:
    vrl_target_num: int = 500
    num_particles: int = 128
    cluster: cl.ClusterParams = None
    seed: int = 0
    # Cast R to bfloat16 on-device before the host transfer (halves the
    # device->host bytes; the transfer is ~1/3 of the clustered path's
    # per-pass host cost on the remote tunnel — see VALIDATION.md's
    # clustered-economics bound). bf16 keeps f32's range, and the
    # clustering cost model (relative luminance comparisons,
    # Preprocessor.cpp:133-197) only needs ~2-3 significant digits;
    # the pixel->slice map stays identical and >99% of table entries
    # match the f32 transfer bit-for-bit, with the remainder being
    # cluster-boundary shifts the estimator is unbiased under
    # (tests/test_render.py::test_r_half_transfer).
    #
    # BEHAVIOR CHANGE (round 4, ADVICE r04 #2): this defaults to True,
    # so clustered renders are NOT bit-identical to rounds <= 3 —
    # cluster boundaries can shift under bf16 rounding (the estimator
    # stays unbiased; only which representative a pixel sums over may
    # differ). Set r_transfer_half=False to reproduce the old tables
    # exactly.
    r_transfer_half: bool = True

    def __post_init__(self):
        if self.cluster is None:
            self.cluster = cl.ClusterParams()


def gather_points(scene: Scene):
    """One center ray per pixel -> (positions, scaled normals, valid).
    Counterpart of buildSlices' gather pass (Preprocessor.cpp:1140-1179);
    the direction scale is scene-diagonal/8 * sliceCurvatureFactor
    (:1137, after Multidimensional Lightcuts)."""
    cam = scene.camera
    w, h = cam.width, cam.height
    px, py = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices, scene.faces)
    lo, hi = scene.aabb()
    diag = jnp.linalg.norm(hi - lo)
    return hit.p, hit.ng, hit.valid, diag


class SliceInfo:
    """Per-scene slicing state, reusable across progressive passes
    (the reference builds slices once in Integrator::preprocess,
    vrlIntegrator.cpp:237-267, and reuses them every prepass)."""

    def __init__(self, slices, repr_rows, slice_u, global_pu, localities):
        self.slices = slices
        self.repr_rows = repr_rows
        self.slice_u = slice_u
        self.global_pu = global_pu
        self.localities = localities


def build_slice_info(scene: Scene, params: ALVRLParams) -> SliceInfo:
    """Gather pass + 6D slicing + representative pixels + localities —
    VRL-independent, compute once per scene/camera."""
    p = params.cluster
    pos, ng, valid, diag = gather_points(scene)
    dir_scale = float(diag) / 8.0 * p.slice_curvature_factor
    slices = cl.build_slices(
        np.asarray(pos), np.asarray(ng) * dir_scale, np.asarray(valid),
        p.target_num_slices,
    )
    host_rng = np.random.default_rng(params.seed + 7)
    repr_rows, slice_u, global_pu = cl.sample_representative_pixels(
        slices, p.target_pixel_undersampling, host_rng
    )
    localities = cl.build_localities(slices, p.neighbour_count)
    return SliceInfo(slices, repr_rows, slice_u, global_pu, localities)


def build_R_device(
    scene: Scene,
    vrls: VRLs,
    params: ALVRLParams,
    cfg: VRLConfig,
    slice_info: SliceInfo,
    use_pallas: bool = False,
    r_key=None,
):
    """DEVICE stage of the clustered prepass: the transfer matrix over
    the representative pixels. Returns (r_mean, r_var) as device
    arrays (bf16 when r_transfer_half) WITHOUT blocking — the caller
    decides when to pay the device->host transfer, which is what the
    pipelined multi-pass driver overlaps with the previous pass's
    render (VERDICT r04 item 6)."""
    cam = scene.camera
    w = cam.width
    repr_rows = slice_info.repr_rows
    all_rows = (np.concatenate(repr_rows) if repr_rows
                else np.zeros((0,), np.int64))
    px = jnp.asarray(all_rows % w, jnp.int32)
    py = jnp.asarray(all_rows // w, jnp.int32)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    r_builder = build_R_pallas if use_pallas else build_R
    if r_key is None:
        r_key = rng.fold(jax.random.key(params.seed), 11)
    r_mean, r_var = r_builder(scene, ray_o, ray_d, vrls, r_key, cfg)
    if params.r_transfer_half:
        # on-device downcast -> half the transfer bytes; upcast on host
        r_mean = r_mean.astype(jnp.bfloat16)
        r_var = r_var.astype(jnp.bfloat16)
    return r_mean, r_var


def cluster_from_R(
    r_mean_host: np.ndarray,
    r_var_host: np.ndarray,
    params: ALVRLParams,
    slice_info: SliceInfo,
    host_rng=None,
    use_pallas: bool = False,
):
    """HOST stage of the clustered prepass: adaptive refinement on the
    transferred R. Pure host compute (numpy + the native refiner) —
    safe to run concurrently with enqueued device work."""
    p = params.cluster
    repr_rows = slice_info.repr_rows
    if host_rng is None:
        host_rng = np.random.default_rng(params.seed + 13)

    rows_per_slice = []
    off = 0
    for rr in repr_rows:
        rows_per_slice.append(np.arange(off, off + len(rr)))
        off += len(rr)

    slice_ids, slice_ws, fb_ids, fb_w, gc_ids, gc_w = cl.build_clusters(
        r_mean_host, r_var_host, rows_per_slice, slice_info.slice_u,
        slice_info.global_pu, slice_info.localities, p, host_rng,
    )
    return _pack_tables(slice_info, slice_ids, slice_ws, fb_ids, fb_w,
                        gc_ids, gc_w, use_pallas)


def prepare_clustering(
    scene: Scene,
    vrls: VRLs,
    key,
    params: ALVRLParams,
    cfg: VRLConfig,
    slice_info: SliceInfo = None,
    use_pallas: bool = False,
):
    """Host+device prepass: slices, representative pixels, R, clusters.
    Returns (slice_of_pixel (H*W,) int32 row ids, table_vrls, table_weights)
    as device arrays (fallback appended as the last table row).
    Pass a cached `slice_info` to skip the per-pass slicing.
    use_pallas builds R through the pair kernel's R mode
    (integrator.build_R_pallas).

    This serial convenience wrapper = build_R_device -> transfer ->
    cluster_from_R; the pipelined driver (render_alvrl_progressive)
    calls the stages directly to overlap them across passes."""
    if slice_info is None:
        slice_info = build_slice_info(scene, params)

    r_mean, r_var = build_R_device(scene, vrls, params, cfg, slice_info,
                                   use_pallas=use_pallas)
    r_mean = np.asarray(r_mean).astype(np.float64)
    r_var = np.asarray(r_var).astype(np.float64)
    return cluster_from_R(r_mean, r_var, params, slice_info,
                          use_pallas=use_pallas)


def _pack_tables(slice_info, slice_ids, slice_ws, fb_ids, fb_w,
                 gc_ids, gc_w, use_pallas):
    slices = slice_info.slices
    info = cl.pack_cluster_info(
        slices.pixel_to_slice, slice_ids, slice_ws, fb_ids, fb_w, gc_ids, gc_w
    )

    # Table width = the SLICE width only (bucket-padded to 32 so repeated
    # passes reuse the compiled clustered-render kernel). The fall-back
    # set is usually much wider (numVrls/fallBackUndersampling reps,
    # Preprocessor.cpp:176-185) and typically serves ZERO pixels (only
    # pixels whose center ray missed all geometry) — padding every slice
    # row to its width doubled the dense render work. Fall-back pixels
    # map to an all-zero last row here and are rendered separately
    # (render_alvrl's fb launch) when any exist.
    s, cmax = info.slice_vrls.shape
    # Width bucketing trades padding work against COMPILE reuse: the
    # adaptive refinement's cluster count drifts pass to pass, and a
    # changed table width recompiles the whole clustered render
    # (measured ~34 s per recompile on the remote TPU at config-4
    # scale vs a 0.4 s warm render). The Pallas kernel pads its
    # slice tables to the 128-lane tile anyway, so bucket to 128 there
    # (zero extra kernel work); the XLA path keeps the finer 32 bucket
    # (its dense render cost scales with the padded width).
    bucket = 128 if use_pallas else 32
    cmax2 = int(-(-cmax // bucket) * bucket)
    rows = int(-(-(s + 1) // 32) * 32)
    tv = np.zeros((rows, cmax2), np.int32)
    tw = np.zeros((rows, cmax2), np.float32)
    tv[:s, :cmax] = info.slice_vrls
    tw[:s, :cmax] = info.slice_weights
    sop = np.where(info.pixel_to_slice < 0, s, info.pixel_to_slice).astype(np.int32)
    return jnp.asarray(sop), jnp.asarray(tv), jnp.asarray(tw), info


def render_alvrl(
    scene: Scene,
    key=None,
    params: ALVRLParams = None,
    cfg: VRLConfig = VRLConfig(),
    tracer_cfg: TracerConfig = TracerConfig(),
    ray_tile: int = 2048,
    use_pallas: bool = False,
    host_bands: int = 1,
    slice_info: "SliceInfo" = None,
):
    """One full clustered progressive pass. Returns (image, vrls, info)."""
    if params is None:
        params = ALVRLParams()
    if key is None:
        key = jax.random.key(params.seed)
    k_trace, k_r, k_render = jax.random.split(key, 3)

    raw = trace(scene, k_trace, params.num_particles, tracer_cfg)
    vrls = compact(raw, params.vrl_target_num,
                   slots_per_particle=tracer_cfg.max_depth)

    sop, tv, tw, info = prepare_clustering(
        scene, vrls, k_r, params, cfg, slice_info=slice_info,
        use_pallas=use_pallas,
    )
    if use_pallas:
        from alvrl_tpu.integrators.vrl.integrator import (
            render_clustered_pallas,
        )

        img = render_clustered_pallas(
            scene, vrls, sop, tv, tw, k_render, cfg
        )
    else:
        img = render_clustered(
            scene, vrls, sop, tv, tw, k_render, cfg, ray_tile=ray_tile,
            host_bands=host_bands,
        )

    # Fall-back pixels (center ray missed all geometry at slice-build
    # time; UINT32_MAX slices, vrlIntegrator.cpp:560,587): the main
    # launch gave them the zero row; integrate them against the (wide)
    # fall-back representative set in a small second launch. Usually
    # there are none (enclosed scenes).
    fb_mask = np.asarray(info.pixel_to_slice) < 0
    if fb_mask.any() and len(info.fallback_vrls):
        from alvrl_tpu.integrators.vrl.integrator import _clustered_li_jit

        w = scene.camera.width
        pix = np.flatnonzero(fb_mask)
        px = jnp.asarray(pix % w, jnp.int32)
        py = jnp.asarray(pix // w, jnp.int32)
        fb_tv = jnp.asarray(info.fallback_vrls[None, :].astype(np.int32))
        fb_tw = jnp.asarray(info.fallback_weights[None, :].astype(np.float32))
        # jitted: the eager per-op dispatch of this small launch cost
        # more than the whole main render over the remote TPU tunnel
        li_fb = _clustered_li_jit(
            scene, vrls, jnp.zeros((len(pix),), jnp.int32), fb_tv, fb_tw,
            rng.fold(k_render, 977), px, py, cfg,
            ray_tile=min(ray_tile, max(256, len(pix))),
        )
        img = img.reshape(-1, 3).at[jnp.asarray(pix)].set(li_fb).reshape(
            img.shape
        )
    return img, vrls, info


def render_alvrl_progressive(
    scene: Scene,
    n_passes: int,
    key=None,
    params: ALVRLParams = None,
    cfg: VRLConfig = VRLConfig(),
    tracer_cfg: TracerConfig = TracerConfig(),
    ray_tile: int = 2048,
    use_pallas: bool = False,
    host_bands: int = 1,
    timings: dict = None,
):
    """Multi-pass clustered render with the host stage PIPELINED
    against the device (VERDICT r04 next-round item 6).

    The serial per-pass chain is trace -> R build -> R transfer ->
    host clustering -> clustered render; on a weak host the transfer +
    native refinement alone can exceed a whole unclustered pass
    (VALIDATION.md "measured bound"). The passes are independent given
    the retrace, so this driver software-pipelines them: each
    iteration first ENQUEUES pass k+1's trace + R build and pass k's
    render (device, in-order), then transfers R_{k+1} (completes
    before the render does) and runs the host clustering for pass k+1
    while the device renders pass k. Steady-state wall per pass ~
    max(device stages, host stages) instead of their sum. Slicing /
    representative pixels / localities are computed ONCE (amortized
    across passes; the reference rebuilds slices per pass only because
    its prepass is monolithic — the gather geometry does not change).

    Returns (mean image over passes, last vrls, last info).
    `timings`, if a dict, receives per-stage wall sums.
    """
    import time as _time

    if params is None:
        params = ALVRLParams()
    if key is None:
        key = jax.random.key(params.seed)

    if use_pallas:
        from alvrl_tpu.integrators.vrl.integrator import (
            render_clustered_pallas,
        )

    t = dict(slice=0.0, device_enqueue=0.0, transfer=0.0, cluster=0.0,
             wall=0.0)
    t_all = _time.time()

    t0 = _time.time()
    slice_info = build_slice_info(scene, params)
    t["slice"] = _time.time() - t0

    from alvrl_tpu.integrators.vrl.vrl import compact_device

    def trace_pass(k):
        kp = rng.fold(key, 2 * k)
        raw = trace(scene, kp, params.num_particles, tracer_cfg)
        # device-side compaction: the host `compact`'s np.nonzero syncs
        # on the fresh trace, which would stall this pipeline (the host
        # must not block before enqueueing the render)
        v = compact_device(raw, params.vrl_target_num,
                           tracer_cfg.max_depth)
        r = build_R_device(scene, v, params, cfg, slice_info,
                           use_pallas=use_pallas,
                           r_key=rng.fold(key, 2 * k + 1))
        return v, r

    # prologue: pass 0's VRLs + R + tables (serial)
    vrls_k, (rm, rv) = trace_pass(0)
    rm_h = np.asarray(rm).astype(np.float64)
    rv_h = np.asarray(rv).astype(np.float64)
    tables_k = cluster_from_R(rm_h, rv_h, params, slice_info,
                              use_pallas=use_pallas)

    acc = None
    info = None
    import sys as _sys
    for k in range(n_passes):
        t_pass = _time.time()
        # 1. enqueue pass k+1's device work FIRST (trace + R build)
        nxt = None
        t0 = _time.time()
        if k + 1 < n_passes:
            nxt = trace_pass(k + 1)

        # 2. enqueue pass k's render (runs after R_{k+1} on-device;
        #    the host never blocks on it inside the loop)
        sop, tv, tw, info = tables_k
        k_render = rng.fold(key, 100000 + k)
        if use_pallas:
            img = render_clustered_pallas(scene, vrls_k, sop, tv, tw,
                                          k_render, cfg)
        else:
            img = render_clustered(scene, vrls_k, sop, tv, tw,
                                   k_render, cfg, ray_tile=ray_tile,
                                   host_bands=host_bands)
        acc = img if acc is None else acc + img
        t["device_enqueue"] += _time.time() - t0

        # 3. transfer R_{k+1} (ready before the render finishes) and
        #    run the host clustering WHILE the device renders pass k
        if nxt is not None:
            vrls_next, (rm, rv) = nxt
            t0 = _time.time()
            # bf16 -> f32 -> f64: the two-step cast is much cheaper on
            # host than ml_dtypes' direct bf16 -> f64
            rm_h = np.asarray(rm).astype(np.float32).astype(np.float64)
            rv_h = np.asarray(rv).astype(np.float32).astype(np.float64)
            t["transfer"] += _time.time() - t0
            t0 = _time.time()
            tables_k = cluster_from_R(rm_h, rv_h, params, slice_info,
                                      use_pallas=use_pallas)
            t["cluster"] += _time.time() - t0
            vrls_k = vrls_next
        if timings is not None and timings.get("verbose"):
            print(f"  pipelined pass {k}: {_time.time() - t_pass:.2f}s "
                  f"(tables {tables_k[1].shape})", file=_sys.stderr)

    img = np.asarray(acc) / n_passes
    t["wall"] = _time.time() - t_all
    if timings is not None:
        timings.update(t)
    return jnp.asarray(img), vrls_k, info
