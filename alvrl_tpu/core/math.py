"""Vector math utilities shared by all kernels.

Everything operates on trailing-dim-3 float32 arrays and is shape-agnostic
(broadcasts over leading batch dims), so the same code runs inside vmap,
scan, shard_map and Pallas kernels.

Counterpart of the reference's libcore math layer
(include/mitsuba/core/{vector,point,frame,transform}.h) — rebuilt as pure
array functions instead of classes.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-4  # matches mitsuba's Epsilon (include/mitsuba/core/constants.h)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def length_sq(v, keepdims=False):
    return dot(v, v, keepdims=keepdims)


def normalize(v):
    return v / jnp.maximum(length(v, keepdims=True), 1e-20)


def normalize_with_length(v):
    l = length(v, keepdims=True)
    return v / jnp.maximum(l, 1e-20), l[..., 0]


def cross(a, b):
    return jnp.cross(a, b)


def distance(a, b):
    return length(b - a)


def distance_sq(a, b):
    return length_sq(b - a)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_divide(num, den, fallback=0.0):
    """num/den where den==0 yields `fallback` (gradient-safe)."""
    den_ok = den != 0.0
    den_safe = jnp.where(den_ok, den, 1.0)
    return jnp.where(den_ok, num / den_safe, fallback)


def build_frame(n):
    """Build an orthonormal frame (s, t, n) around unit normal n.

    Branchless Duff et al. 2017 construction; counterpart of
    mitsuba's Frame/coordinateSystem (include/mitsuba/core/frame.h).
    Returns (s, t) with s x t = n.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    s = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    t = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return s, t


def frame_to_world(s, t, n, v_local):
    """Local (x,y,z) -> world using frame (s,t,n)."""
    return (
        v_local[..., 0:1] * s
        + v_local[..., 1:2] * t
        + v_local[..., 2:3] * n
    )


def frame_to_local(s, t, n, v_world):
    return jnp.stack(
        [dot(v_world, s), dot(v_world, t), dot(v_world, n)], axis=-1
    )


def spherical_direction(cos_theta, phi):
    """(cos_theta, phi) -> unit vector in local frame (z = pole)."""
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )
