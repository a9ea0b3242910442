"""Sensors: ray generation + film-position inverse.

Counterpart of src/sensors/{perspective,thinlens,orthographic,
spherical,radiancemeter}.cpp. Dispatch on Camera.kind is static
(compile-time), so XLA sees only the chosen model:

  * PERSPECTIVE — pinhole (perspective.cpp:247);
  * THINLENS — concentric-free disk aperture + focus plane
    (thinlens.cpp); lens sample from `lens_uv`;
  * ORTHOGRAPHIC — parallel rays, film half-width `ortho_scale`
    (orthographic.cpp);
  * SPHERICAL — equirectangular latitude-longitude (spherical.cpp).

A radiancemeter (single-ray sensor, radiancemeter.cpp) is just a 1x1
perspective camera or a direct li_* query — no separate code needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.core import math as m
from alvrl_tpu.scene.scene import (
    ORTHOGRAPHIC,
    PERSPECTIVE,
    PERSPECTIVE_RDIST,
    SPHERICAL,
    TELECENTRIC,
    THINLENS,
    Camera,
)


def _tan_half(cam: Camera):
    return jnp.tan(jnp.deg2rad(cam.fov_x_deg) * 0.5)


def _ndc(cam: Camera, px, py, jitter):
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    x = (px + jx) / cam.width * 2.0 - 1.0
    y = 1.0 - (py + jy) / cam.height * 2.0
    return x, y


def sample_ray(cam: Camera, px, py, jitter=None, lens_uv=None):
    """Pixel coords -> world rays (origin, direction). Film y grows
    downward; camera space looks down +z with y up."""
    ndc_x, ndc_y = _ndc(cam, px, py, jitter)
    aspect = cam.height / cam.width
    rot = cam.to_world[:3, :3]
    cam_o = cam.to_world[:3, 3]

    if cam.kind in (PERSPECTIVE, THINLENS, PERSPECTIVE_RDIST):
        th = _tan_half(cam)
        if cam.kind == PERSPECTIVE_RDIST:
            # polynomial radial distortion (perspective_rdist.cpp):
            # the stored kc describe the lens; ray generation applies
            # the forward model to the ideal film position
            r2 = ndc_x * ndc_x + ndc_y * ndc_y
            factor = 1.0 + cam.kc0 * r2 + cam.kc1 * r2 * r2
            ndc_x = ndc_x * factor
            ndc_y = ndc_y * factor
        d_cam = jnp.stack(
            [ndc_x * th, ndc_y * th * aspect, jnp.ones_like(ndc_x)],
            axis=-1,
        )
        if cam.kind == THINLENS:
            if lens_uv is None:
                lu = lv = 0.5
            else:
                lu, lv = lens_uv[..., 0], lens_uv[..., 1]
            r = jnp.sqrt(lu) * cam.aperture_radius
            phi = 2.0 * jnp.pi * lv
            lens = jnp.stack(
                [r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r)],
                axis=-1,
            )
            focus_p = d_cam * cam.focus_distance  # z=1 plane scaled
            d_cam = focus_p - lens
            o_cam = lens
        else:
            o_cam = jnp.zeros_like(d_cam)
        d = m.normalize(d_cam @ rot.T)
        o = cam_o + o_cam @ rot.T
        o = jnp.broadcast_to(o, d.shape)
        return o, d

    if cam.kind in (ORTHOGRAPHIC, TELECENTRIC):
        o_cam = jnp.stack(
            [
                ndc_x * cam.ortho_scale,
                ndc_y * cam.ortho_scale * aspect,
                jnp.zeros_like(ndc_x),
            ],
            axis=-1,
        )
        if cam.kind == TELECENTRIC:
            # parallel chief rays + a finite aperture focused at
            # focus_distance (telecentric.cpp)
            if lens_uv is None:
                lu = lv = 0.5
            else:
                lu, lv = lens_uv[..., 0], lens_uv[..., 1]
            r = jnp.sqrt(lu) * cam.aperture_radius
            phi = 2.0 * jnp.pi * lv
            lens = jnp.stack(
                [r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r)],
                axis=-1,
            )
            focus_p = o_cam + jnp.asarray([0.0, 0.0, 1.0]) \
                * cam.focus_distance
            o_cam = o_cam + lens
            d_cam = m.normalize(focus_p - o_cam)
            d = m.normalize(d_cam @ rot.T)
            o = cam_o + o_cam @ rot.T
            return o, d
        d = jnp.broadcast_to(rot[:, 2], o_cam.shape)
        o = cam_o + o_cam @ rot.T
        return o, m.normalize(d)

    if cam.kind == SPHERICAL:
        # equirectangular: x -> azimuth [0, 2pi), y -> polar [0, pi]
        phi = (1.0 + ndc_x) * jnp.pi
        theta = (1.0 - ndc_y) * 0.5 * jnp.pi
        d_cam = jnp.stack(
            [
                jnp.sin(theta) * jnp.sin(phi),
                jnp.cos(theta),
                -jnp.sin(theta) * jnp.cos(phi),
            ],
            axis=-1,
        )
        d = m.normalize(d_cam @ rot.T)
        o = jnp.broadcast_to(cam_o, d.shape)
        return o, d

    raise ValueError(f"unknown sensor kind {cam.kind}")


def sample_position(cam: Camera, d_world):
    """World direction -> continuous film position (x, y): the inverse
    of sample_ray for pinhole-like sensors, used by the clustering
    pixel lookup (getSamplePosition, vrlIntegrator.cpp:551-560)."""
    rot = cam.to_world[:3, :3]
    d_cam = d_world @ rot  # rot^T @ d
    aspect = cam.height / cam.width
    if cam.kind in (PERSPECTIVE, THINLENS):
        z = jnp.maximum(d_cam[..., 2], 1e-12)
        th = _tan_half(cam)
        ndc_x = d_cam[..., 0] / z / th
        ndc_y = d_cam[..., 1] / z / (th * aspect)
    elif cam.kind == SPHERICAL:
        phi = jnp.arctan2(d_cam[..., 0], -d_cam[..., 2])
        theta = jnp.arccos(jnp.clip(d_cam[..., 1], -1.0, 1.0))
        ndc_x = phi / jnp.pi - 1.0
        ndc_y = 1.0 - 2.0 * theta / jnp.pi
    else:
        raise ValueError("sample_position: unsupported sensor kind")
    x = (ndc_x + 1.0) * 0.5 * cam.width
    y = (1.0 - ndc_y) * 0.5 * cam.height
    return x, y
