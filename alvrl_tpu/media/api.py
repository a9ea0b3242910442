"""Medium dispatch: one functional interface over homogeneous and grid
media.

Replaces the reference's `Medium` virtual interface
(include/mitsuba/render/medium.h) — dispatch is static (resolved at
trace time from the pytree type), so XLA sees only the branch taken.
All segment queries take endpoints, which heterogeneous media need.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alvrl_tpu.core import math as m
from alvrl_tpu.media import heterogeneous as gmed
from alvrl_tpu.media import homogeneous as hmed


class DistanceSample(NamedTuple):
    """Unified free-flight sample along a ray segment.

    w_scatter: spectral throughput factor for a medium event
               (= tau * sigma_s / pdfSuccess);
    w_pass:    spectral factor for passing to the surface
               (= tau / pdfFailure)."""

    success: jax.Array
    t: jax.Array
    p: jax.Array
    w_scatter: jax.Array
    w_pass: jax.Array


def is_homogeneous(med) -> bool:
    return isinstance(med, hmed.HomogeneousMedium)


def prepare(med):
    """Materialize per-medium lookup caches (grid media: the 2x
    supersampled density). Call ONCE at the top of each jitted render
    entry point — the lazy property is re-traced inside
    fori_loop/lax.map bodies and XLA does not hoist it (measured: the
    recompute, not the gathers, dominated the hetero render).

    Gradient caveat: call prepare INSIDE the traced/differentiated
    function (as every entry point here does). Preparing a concrete
    medium outside jit and differentiating w.r.t. `density` later gives
    ZERO voxel gradients through the NN-lookup path — the cache is then
    a constant, not a function of density. with_cache recomputes from
    the current density on every call, so re-preparing inside the trace
    is both safe and free (XLA CSE)."""
    if is_homogeneous(med):
        return med
    return gmed.with_cache(med)


def prepare_scene(scene):
    """Scene with prepared media (see prepare)."""
    med = scene.medium
    pmed = prepare(med)
    if pmed is med:
        return scene
    return scene.replace(medium=pmed)


def phase_g(med):
    return med.g


def transmittance(med, p0, p1):
    """Spectral tau along the open segment (no occlusion test)."""
    if is_homogeneous(med):
        return hmed.eval_transmittance(med, m.distance(p0, p1))
    return gmed.eval_transmittance(med, p0, p1)


def eval_ray_seg(med, p0, p1):
    """(tau, pdf_success, pdf_failure) over the segment (Medium::eval)."""
    if is_homogeneous(med):
        return hmed.eval_ray(med, m.distance(p0, p1))
    return gmed.eval_ray(med, p0, p1)


def sigma_s_at(med, p):
    if is_homogeneous(med):
        return jnp.broadcast_to(med.sigma_s, jnp.shape(p))
    if med.fast_tau:
        # supersampled-NN lookup (1 gather vs 8 trilinear corners) —
        # same documented approximation as the tau quadrature path;
        # voxel gradients flow through the supersampled grid
        d = gmed.lookup_density_nn(med, p)
    else:
        d = gmed.lookup_density(med, p)
    return d[..., None] * med.sigma_s_color


def sample_distance_seg(med, key, ray_o, ray_d, dist_surf) -> DistanceSample:
    """Free-flight sampling along ray_o + t*ray_d, t in [0, dist_surf].
    Scalar-lane version (vmap externally for grid media)."""
    if is_homogeneous(med):
        ms = hmed.sample_distance(med, key, dist_surf)
        return _homog_to_distance_sample(ms, ray_o, ray_d)
    gs = gmed.sample_distance(med, key, ray_o, ray_d, dist_surf)
    w_scatter = jnp.where(gs.success, gs.weight, 0.0)
    w_pass = jnp.where(gs.success, 0.0, gs.weight)
    return DistanceSample(
        success=gs.success, t=gs.t, p=gs.p,
        w_scatter=w_scatter, w_pass=w_pass,
    )


def sample_distance_seg_u(med, u2, ray_o, ray_d, dist_surf) -> DistanceSample:
    """Explicit-uniform free-flight sampling (primary-sample-space
    integrators own the uniforms). Homogeneous media only: Woodcock
    tracking consumes a data-dependent number of uniforms and has no
    fixed-dimension primary-sample mapping."""
    if not is_homogeneous(med):
        raise NotImplementedError(
            "primary-sample-space distance sampling requires a "
            "homogeneous medium (delta tracking has unbounded dims)"
        )
    ms = hmed.sample_distance_u(med, u2, dist_surf)
    return _homog_to_distance_sample(ms, ray_o, ray_d)


def _homog_to_distance_sample(ms, ray_o, ray_d) -> DistanceSample:
    p = ray_o + ms.t[..., None] * ray_d
    # DETACHED-sampling gradients: the sampled location t is detached
    # (pathwise dt/dsigma chains explode over multi-bounce walks) and
    # the importance pdf DENOMINATORS are detached too — for any
    # estimator f*tau/p with t ~ p, d/dtheta E[f tau / sg(p)] =
    # int f d(tau)/dtheta dt, the TRUE expectation gradient (the score
    # term of the moving density cancels exactly against the
    # differentiated denominator). The numerator factors (tau, sigma_s)
    # stay differentiable. This is the tracer-side gradient estimator
    # the round-1 pathwise attempt could not provide.
    w_scatter = ms.transmittance * ms.sigma_s / jax.lax.stop_gradient(
        jnp.maximum(ms.pdf_success, 1e-30)
    )[..., None]
    w_pass = ms.transmittance / jax.lax.stop_gradient(
        jnp.maximum(ms.pdf_failure, 1e-30)
    )[..., None]
    return DistanceSample(
        success=ms.success, t=ms.t, p=p,
        w_scatter=w_scatter, w_pass=w_pass,
    )
