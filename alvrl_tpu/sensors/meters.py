"""Measurement sensors: radiancemeter / irradiancemeter / fluencemeter.

Counterpart of src/sensors/{radiancemeter,irradiancemeter,
fluencemeter}.cpp. In the reference these are Sensor plugins whose
"film" is a 1x1 pixel; in this framework they are direct Monte-Carlo
queries over the volumetric path tracer's radiance estimator — the
idiomatic form of "a sensor that integrates incident radiance at a
point" on a machine where the estimator is already a pure function.

These are the numeric hooks the reference's scene-level consistency
fixtures use (e.g. data/tests/test_bidir_0.xml measures flux between
two disks with ptracer + irradiancemeter + mfilm).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from alvrl_tpu.core import math as m
from alvrl_tpu.core import warp
from alvrl_tpu.integrators import volpath
from alvrl_tpu.scene.scene import Scene


def radiance(scene: Scene, p, d, key, spp: int = 64,
             cfg: volpath.VolpathConfig = None):
    """Incident radiance at point p from direction of travel d
    (radiancemeter.cpp: a single-ray sensor). Returns (3,)."""
    cfg = cfg or volpath.VolpathConfig(max_depth=8, only_vrl_paths=False)
    keys = jax.random.split(key, spp)
    li = jax.vmap(
        lambda k: volpath.li_volpath(scene, jnp.asarray(p, jnp.float32),
                                     m.normalize(jnp.asarray(d, jnp.float32)),
                                     k, cfg)
    )(keys)
    return jnp.mean(li, axis=0)


def _delta_direct(scene: Scene, p):
    """Deterministic direct contribution of DELTA emitters (point/
    spot/directional) at p: (E, 3) per-emitter radiance-equivalents and
    (E, 3) arrival directions. Hemisphere/sphere sampling can never hit
    a delta emitter, so the meters add this term explicitly (the
    reference's sensors get it through NEE connections)."""
    from alvrl_tpu.emitters.emitters import (
        DIRECTIONAL, POINT, SPOT, _spot_falloff,
    )
    from alvrl_tpu.integrators.vrl.integrate import (
        eval_transmittance_between,
    )

    em = scene.emitters
    lo, hi = scene.aabb()
    radius = 0.5 * jnp.linalg.norm(hi - lo)
    n_em = em.kind.shape[0]

    delta_vec = em.position - p                      # (E, 3)
    d2 = jnp.maximum(jnp.sum(delta_vec ** 2, axis=-1), 1e-12)
    dirn = delta_vec / jnp.sqrt(d2)[..., None]
    v_point = em.intensity / d2[..., None]
    idxs = jnp.arange(n_em)
    fall = jax.vmap(lambda i: _spot_falloff(em, i, -dirn[i]))(idxs)
    v_spot = v_point * fall[..., None]
    d_dir = -em.direction
    endpoint = jnp.where(
        (em.kind == DIRECTIONAL)[..., None],
        p + d_dir * (2.0 * radius), em.position,
    )
    arrive = jnp.where((em.kind == DIRECTIONAL)[..., None], d_dir, dirn)
    tau = jax.vmap(
        lambda e: eval_transmittance_between(scene, p, e))(endpoint)
    val = jnp.where(
        (em.kind == POINT)[..., None], v_point,
        jnp.where((em.kind == SPOT)[..., None], v_spot,
                  jnp.where((em.kind == DIRECTIONAL)[..., None],
                            em.intensity, 0.0)),
    )
    return val * tau, arrive


@partial(jax.jit, static_argnames=("spp", "cfg"))
def irradiance(scene: Scene, p, n, key, spp: int = 256,
               cfg: volpath.VolpathConfig = None):
    """Irradiance E = int L(p, w) cos(w, n) dw over the hemisphere
    about n (irradiancemeter.cpp semantics): cosine-weighted MC, so
    E = pi * mean(L)."""
    cfg = cfg or volpath.VolpathConfig(max_depth=8, only_vrl_paths=False)
    n = m.normalize(jnp.asarray(n, jnp.float32))
    p = jnp.asarray(p, jnp.float32)
    k_dir, k_li = jax.random.split(key)
    u = jax.random.uniform(k_dir, (spp, 2))
    local = jax.vmap(warp.square_to_cosine_hemisphere)(u)
    s_f, t_f = m.build_frame(n)
    dirs = jax.vmap(lambda l: m.frame_to_world(s_f, t_f, n, l))(local)
    li = jax.vmap(
        lambda d, k: volpath.li_volpath(scene, p, d, k, cfg)
    )(dirs, jax.random.split(k_li, spp))
    val, arrive = _delta_direct(scene, p)
    cos = jnp.maximum(jnp.sum(arrive * n, axis=-1), 0.0)
    return jnp.pi * jnp.mean(li, axis=0) + jnp.sum(
        val * cos[..., None], axis=0)


@partial(jax.jit, static_argnames=("spp", "cfg"))
def fluence(scene: Scene, p, key, spp: int = 256,
            cfg: volpath.VolpathConfig = None):
    """Fluence phi = int_{S^2} L(p, w) dw (fluencemeter.cpp): uniform
    sphere MC, phi = 4 pi * mean(L)."""
    cfg = cfg or volpath.VolpathConfig(max_depth=8, only_vrl_paths=False)
    p = jnp.asarray(p, jnp.float32)
    k_dir, k_li = jax.random.split(key)
    u = jax.random.uniform(k_dir, (spp, 2))
    dirs = jax.vmap(warp.square_to_uniform_sphere)(u)
    li = jax.vmap(
        lambda d, k: volpath.li_volpath(scene, p, d, k, cfg)
    )(dirs, jax.random.split(k_li, spp))
    val, _ = _delta_direct(scene, p)
    return 4.0 * jnp.pi * jnp.mean(li, axis=0) + jnp.sum(val, axis=0)
