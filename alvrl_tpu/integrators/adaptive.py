"""Adaptive (error-controlled) meta-integrator.

Counterpart of the `adaptive` plugin (src/integrators/misc/adaptive.cpp):
repeatedly invokes a sub-integrator per pixel until the luminance sample
mean satisfies a relative-error bound with a given confidence (Z-test),
or a maximum sample factor is reached. Semantics preserved:

  * preprocess estimates the average image-plane luminance with random
    samples (adaptive.cpp:131-160, nSamples=10000);
  * quantile = Phi^-1(1 - pValue/2) (adaptive.cpp:162-163);
  * per pixel, after every `base_spp` samples: stop when
      quantile * sqrt(var/n) <= maxError * max(mean, 0.01 * avgLum)
    (adaptive.cpp:252-270), hard cap at maxSampleFactor * base_spp;
  * per-pixel mean/variance by Knuth online update (adaptive.cpp:245-248)
    — here the batched Welford-merge equivalent.

TPU-native design: instead of a per-pixel while-loop (divergent,
scalar), sampling proceeds in ROUNDS of base_spp samples for the set of
still-unconverged pixels. Each round compacts the active pixel indices
host-side into a dense ray batch (padded to a power-of-two bucket to
bound recompiles) so device work shrinks with the active set — the
vector-machine version of "pixels that pass the Z-test stop sampling".
"""

from __future__ import annotations

from functools import partial
from statistics import NormalDist

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import rng
from alvrl_tpu.core import spectrum as spec
from alvrl_tpu.scene.scene import Scene
from alvrl_tpu.sensors import perspective


def _default_li(scene, o, d, key):
    from alvrl_tpu.integrators.volpath import VolpathConfig, li_volpath

    return li_volpath(scene, o, d, key, VolpathConfig(max_depth=8))


_LI_TILE = 2048


def _li_tiled(scene: Scene, li_fn, key, o, d):
    """Evaluate li_fn over a flat ray batch in fixed-size tiles
    (explicit pad+reshape; per-ray keys derived from (tile, lane))."""
    n = o.shape[0]
    tile = min(_LI_TILE, n)
    n_t = -(-n // tile)
    pad = n_t * tile - n
    op = jnp.pad(o, ((0, pad), (0, 0)))
    dp = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)

    def tile_fn(args):
        t_idx, o_t, d_t = args
        keys = jax.vmap(lambda j: rng.fold(key, t_idx, j))(
            jnp.arange(tile))
        return jax.vmap(lambda oo, dd, kk: li_fn(scene, oo, dd, kk))(
            o_t, d_t, keys)

    li = jax.lax.map(
        tile_fn,
        (jnp.arange(n_t), op.reshape(n_t, tile, 3),
         dp.reshape(n_t, tile, 3)),
    )
    return li.reshape(-1, 3)[:n]


def _avg_luminance(scene: Scene, key, li_fn, n_samples: int = 10240):
    """Average image-plane luminance (adaptive.cpp preprocess,
    nSamples=10000 random positions). Implemented through the same
    jit-compiled sampling round as the main loop (random pixels x
    base_spp sub-pixel jitters == uniform image-plane positions)."""
    n_pix = min(2048, n_samples)
    spp = -(-n_samples // n_pix)
    k1, k2 = jax.random.split(jnp.asarray(key))
    u = jax.random.uniform(k1, (n_pix, 2))
    px = jnp.floor(u[:, 0] * scene.camera.width).astype(jnp.int32)
    py = jnp.floor(u[:, 1] * scene.camera.height).astype(jnp.int32)
    _, sum_lum, _ = _round(scene, px, py, k2, li_fn, spp)
    return jnp.sum(sum_lum) / (n_pix * spp)


# keep_unused: with argument DCE on, the second same-signature dispatch
# of this function trips a pruned-argument-count mismatch in the C++
# fastpath (jax 0.9.0: "Execution supplied 53 buffers but compiled
# program expected 86"); keeping unused scene leaves makes the python
# and fastpath argument sets identical.
@partial(jax.jit, static_argnames=("li_fn", "base_spp"),
         keep_unused=True)
def _round(scene: Scene, px, py, key, li_fn, base_spp: int):
    """base_spp jittered samples for the given pixel list; returns
    (sum_rgb (N,3), sum_lum (N,), sum_lum2 (N,))."""
    n = px.shape[0]

    def one_spp(i):
        k = rng.fold(key, i)
        jit_u = jax.random.uniform(rng.fold(k, 1), (n, 2))
        o, d = perspective.sample_ray(scene.camera, px, py, jitter=jit_u)
        li = _li_tiled(scene, li_fn, rng.fold(k, 2), o, d)
        lum = spec.luminance(li)
        return li, lum, lum * lum

    li, lum, lum2 = jax.lax.map(one_spp, jnp.arange(base_spp))
    return li.sum(0), lum.sum(0), lum2.sum(0)


def render_adaptive(
    scene: Scene,
    key,
    li_fn=None,
    base_spp: int = 8,
    max_error: float = 0.05,
    p_value: float = 0.05,
    max_sample_factor: int = 32,
    avg_luminance: float | None = None,
    verbose: bool = False,
):
    """Adaptive render -> (image (H, W, 3), spp_map (H, W) int32).

    li_fn(scene, o, d, key) -> (3,) radiance; defaults to the
    volumetric path tracer. base_spp is the reference's
    sampler.sampleCount (>= 8 there); max_sample_factor < 0 means
    unbounded (here: 256 rounds)."""
    if li_fn is None:
        li_fn = _default_li
    cam = scene.camera
    w, h = cam.width, cam.height
    n_pix = w * h
    quantile = NormalDist().inv_cdf(1.0 - p_value / 2.0)
    if avg_luminance is None:
        avg_luminance = float(_avg_luminance(scene, rng.fold(key, 999),
                                             li_fn))
    max_rounds = max_sample_factor if max_sample_factor >= 0 else 256

    px_all, py_all = np.meshgrid(np.arange(w), np.arange(h))
    px_all = px_all.reshape(-1).astype(np.int32)
    py_all = py_all.reshape(-1).astype(np.int32)

    sum_rgb = np.zeros((n_pix, 3), np.float32)
    sum_lum = np.zeros((n_pix,), np.float32)
    sum_lum2 = np.zeros((n_pix,), np.float32)
    counts = np.zeros((n_pix,), np.int64)
    active = np.arange(n_pix)

    for rnd in range(max_rounds):
        if active.size == 0:
            break
        # pad the active set to a power-of-two bucket (bounded number of
        # distinct compiled shapes)
        bucket = 1 << max(8, int(np.ceil(np.log2(active.size))))
        pad = bucket - active.size
        idx = np.concatenate([active, np.zeros(pad, active.dtype)])
        r_rgb, r_lum, r_lum2 = _round(
            scene, jnp.asarray(px_all[idx]), jnp.asarray(py_all[idx]),
            rng.fold(key, rnd), li_fn, base_spp)
        r_rgb = np.asarray(r_rgb)[: active.size]
        r_lum = np.asarray(r_lum)[: active.size]
        r_lum2 = np.asarray(r_lum2)[: active.size]

        sum_rgb[active] += r_rgb
        sum_lum[active] += r_lum
        sum_lum2[active] += r_lum2
        counts[active] += base_spp

        n = counts[active].astype(np.float64)
        mean = sum_lum[active] / n
        # unbiased sample variance from raw moments
        var = np.maximum(
            (sum_lum2[active] - n * mean * mean) / np.maximum(n - 1, 1),
            0.0)
        ci_width = quantile * np.sqrt(var / n)
        base = np.maximum(mean, avg_luminance * 0.01)
        converged = ci_width <= max_error * base
        if verbose:
            print(f"round {rnd}: active {active.size}, "
                  f"converged {int(converged.sum())}")
        active = active[~converged]

    img = sum_rgb / np.maximum(counts[:, None], 1)
    return (img.reshape(h, w, 3).astype(np.float32),
            counts.reshape(h, w).astype(np.int32))
