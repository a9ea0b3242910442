"""Sample warping: unit square -> distributions on spheres/hemispheres.

Counterpart of include/mitsuba/core/warp.h, as pure functions over
uniform samples in [0,1)^k.
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.core import math as m


def square_to_uniform_sphere(u):
    """u in [0,1)^2 -> uniform direction on S^2. pdf = 1/(4 pi)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_cosine_hemisphere(u):
    """u in [0,1)^2 -> cosine-weighted hemisphere (z up).

    pdf = cos_theta / pi. Concentric-free (polar) mapping; matches the
    distribution (not the low-discrepancy layout) of warp.h.
    """
    cos_theta = m.safe_sqrt(1.0 - u[..., 0])
    sin_theta = m.safe_sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )


def square_to_uniform_sphere_pdf():
    return m.INV_FOURPI


def square_to_cosine_hemisphere_pdf(v_local):
    return jnp.maximum(v_local[..., 2], 0.0) / jnp.pi
