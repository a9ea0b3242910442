"""Film accumulation.

Replaces ImageBlock::put filter splatting under a mutex
(include/mitsuba/render/imageblock.h:124-144, renderproc.cpp:142-149)
with pure functional scatter-adds — race-free by construction and
differentiable. A box filter is an exact match of per-pixel accumulation;
wider reconstruction filters splat into a neighborhood.
"""

from __future__ import annotations

import jax.numpy as jnp


def splat_box(width, height, px, py, values, weights=None):
    """Accumulate (N, 3) sample values at integer pixels into an image.

    Returns (image (H, W, 3), weight (H, W)). Develop with `develop`.
    """
    if weights is None:
        weights = jnp.ones(px.shape, values.dtype)
    img = jnp.zeros((height, width, 3), values.dtype)
    wgt = jnp.zeros((height, width), values.dtype)
    img = img.at[py, px].add(values * weights[..., None])
    wgt = wgt.at[py, px].add(weights)
    return img, wgt


def develop(img, wgt):
    """Weight-normalize the accumulated film (Film::develop)."""
    return img / jnp.maximum(wgt[..., None], 1e-20)
