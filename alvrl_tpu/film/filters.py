"""Reconstruction filters + filtered splatting.

Counterpart of src/rfilters/{box,tent,gaussian,mitchell,catmullrom,
lanczos}.cpp and the ImageBlock::put filter splat
(include/mitsuba/render/imageblock.h:124-144): each sample is
distributed over the (2r)^2 pixel neighborhood with filter weights,
accumulated as functional scatter-adds.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

BOX = "box"
TENT = "tent"
GAUSSIAN = "gaussian"
MITCHELL = "mitchell"
CATMULLROM = "catmullrom"
LANCZOS = "lanczos"

RADII = {BOX: 0.5, TENT: 1.0, GAUSSIAN: 2.0, MITCHELL: 2.0,
         CATMULLROM: 2.0, LANCZOS: 3.0}


def eval_filter(name, x):
    """1D filter kernel value at offset x (filters are separable)."""
    ax = jnp.abs(x)
    if name == BOX:
        return jnp.where(ax <= 0.5, 1.0, 0.0)
    if name == TENT:
        return jnp.maximum(1.0 - ax, 0.0)
    if name == GAUSSIAN:
        # sigma = 0.5, truncated at r=2 and offset to reach 0 there
        alpha = 1.0 / (2.0 * 0.5 ** 2)
        v = jnp.exp(-alpha * ax * ax) - np.exp(-alpha * 4.0)
        return jnp.maximum(v, 0.0)
    if name in (MITCHELL, CATMULLROM):
        if name == MITCHELL:
            b = c = 1.0 / 3.0
        else:
            b, c = 0.0, 0.5
        a2 = ax * ax
        a3 = a2 * ax
        inner = (
            (12 - 9 * b - 6 * c) * a3
            + (-18 + 12 * b + 6 * c) * a2
            + (6 - 2 * b)
        ) / 6.0
        outer = (
            (-b - 6 * c) * a3
            + (6 * b + 30 * c) * a2
            + (-12 * b - 48 * c) * ax
            + (8 * b + 24 * c)
        ) / 6.0
        return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))
    if name == LANCZOS:
        tau = 3.0
        px = jnp.pi * ax
        sinc = jnp.where(ax > 1e-6, jnp.sin(px) / jnp.maximum(px, 1e-9), 1.0)
        sincw = jnp.where(
            ax > 1e-6,
            jnp.sin(px / tau) / jnp.maximum(px / tau, 1e-9),
            1.0,
        )
        return jnp.where(ax < tau, sinc * sincw, 0.0)
    raise ValueError(name)


def splat(width, height, fx, fy, values, name=BOX):
    """Filtered splat of samples at continuous film coords (fx, fy).

    values: (N, 3). Returns (image (H, W, 3), weight (H, W))."""
    r = RADII[name]
    taps = int(np.ceil(2 * r))
    x0 = jnp.floor(fx - r + 0.5).astype(jnp.int32)
    y0 = jnp.floor(fy - r + 0.5).astype(jnp.int32)
    img = jnp.zeros((height, width, 3), values.dtype)
    wgt = jnp.zeros((height, width), values.dtype)
    for dy in range(taps):
        for dx in range(taps):
            px = x0 + dx
            py = y0 + dy
            w = (
                eval_filter(name, px + 0.5 - fx)
                * eval_filter(name, py + 0.5 - fy)
            )
            inside = (px >= 0) & (px < width) & (py >= 0) & (py < height)
            w = jnp.where(inside, w, 0.0)
            pxc = jnp.clip(px, 0, width - 1)
            pyc = jnp.clip(py, 0, height - 1)
            img = img.at[pyc, pxc].add(values * w[..., None])
            wgt = wgt.at[pyc, pxc].add(w)
    return img, wgt
