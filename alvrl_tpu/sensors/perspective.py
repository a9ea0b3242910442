"""Perspective pinhole sensor.

Counterpart of PerspectiveCamera::sampleRay
(src/sensors/perspective.cpp:247) and getSamplePosition (its inverse,
used by the clustering path to map a camera ray back to its pixel,
vrlIntegrator.cpp:551-560). Vectorized over pixel batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.core import math as m
from alvrl_tpu.scene.scene import Camera


def _tan_half(cam: Camera):
    return jnp.tan(jnp.deg2rad(cam.fov_x_deg) * 0.5)


def sample_ray(cam: Camera, px, py, jitter=None):
    """Pixel coords (px, py) [+ optional jitter in [0,1)^2] -> world rays.

    px, py are integer-valued arrays; returns (origin, direction) with
    origin broadcast to the batch shape. Film y increases downward,
    camera space looks down +z with y up.
    """
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    w, h = cam.width, cam.height
    aspect = h / w
    th = _tan_half(cam)
    ndc_x = (px + jx) / w * 2.0 - 1.0
    ndc_y = 1.0 - (py + jy) / h * 2.0
    d_cam = jnp.stack(
        [
            ndc_x * th,
            ndc_y * th * aspect,
            jnp.ones_like(ndc_x),
        ],
        axis=-1,
    )
    rot = cam.to_world[:3, :3]
    o = cam.to_world[:3, 3]
    d = m.normalize(d_cam @ rot.T)
    o = jnp.broadcast_to(o, d.shape)
    return o, d


def sample_position(cam: Camera, d_world):
    """World direction -> continuous film position (x, y).

    Inverse of sample_ray for the pixel lookup of
    getClusteredVrlContributions (vrlIntegrator.cpp:551-560)."""
    rot = cam.to_world[:3, :3]
    d_cam = d_world @ rot  # rot^T @ d, as rows
    z = jnp.maximum(d_cam[..., 2], 1e-12)
    th = _tan_half(cam)
    aspect = cam.height / cam.width
    ndc_x = d_cam[..., 0] / z / th
    ndc_y = d_cam[..., 1] / z / (th * aspect)
    x = (ndc_x + 1.0) * 0.5 * cam.width
    y = (1.0 - ndc_y) * 0.5 * cam.height
    return x, y
