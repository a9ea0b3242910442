"""Procedural textures modulating surface albedo.

Counterpart of src/textures/ (checkerboard, gridtexture, scale, plus a
value-noise stand-in for bitmap textures — meshes here carry no UVs, so
textures are parameterized over world position, adequate for the
benchmark scene family). Evaluated inside the BSDF gathers:
`albedo_at(scene, mat_id, p)` replaces raw albedo table lookups.
"""

from __future__ import annotations

import jax.numpy as jnp

TEX_NONE = 0
TEX_CHECKER = 1
TEX_GRID = 2
TEX_NOISE = 3


def _hash3(ip):
    """Integer lattice hash -> [0,1) (value noise)."""
    h = (
        ip[..., 0] * jnp.int32(374761393)
        + ip[..., 1] * jnp.int32(668265263)
        + ip[..., 2] * jnp.int32(1440662683)
    )
    h = (h ^ (h >> 13)) * jnp.int32(1274126177)
    h = h ^ (h >> 16)
    return (h & 0x7FFFFF).astype(jnp.float32) / jnp.float32(0x800000)


def value_noise(p):
    """Trilinear value noise over the unit lattice."""
    ip = jnp.floor(p).astype(jnp.int32)
    fp = p - jnp.floor(p)
    w = fp * fp * (3.0 - 2.0 * fp)  # smoothstep

    def corner(dx, dy, dz):
        return _hash3(ip + jnp.asarray([dx, dy, dz], jnp.int32))

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    x00 = c000 * (1 - w[..., 0]) + c100 * w[..., 0]
    x10 = c010 * (1 - w[..., 0]) + c110 * w[..., 0]
    x01 = c001 * (1 - w[..., 0]) + c101 * w[..., 0]
    x11 = c011 * (1 - w[..., 0]) + c111 * w[..., 0]
    y0 = x00 * (1 - w[..., 1]) + x10 * w[..., 1]
    y1 = x01 * (1 - w[..., 1]) + x11 * w[..., 1]
    return y0 * (1 - w[..., 2]) + y1 * w[..., 2]


def checker(p, scale):
    ip = jnp.floor(p * scale[..., None]).astype(jnp.int32)
    return ((ip[..., 0] + ip[..., 1] + ip[..., 2]) & 1).astype(jnp.float32)


def grid_lines(p, scale, line_width=0.08):
    fp = p * scale[..., None] - jnp.floor(p * scale[..., None])
    near = jnp.minimum(fp, 1.0 - fp)
    on_line = jnp.min(near, axis=-1) < line_width
    return on_line.astype(jnp.float32)


def albedo_at(scene, mat_id, p):
    """Albedo of material `mat_id` at world position p, applying the
    material's texture (mix between albedo and albedo2 by the texture
    value). Falls back to the plain table when the scene's materials
    carry no texture fields (back-compat)."""
    mats = scene.materials
    base = mats.albedo[mat_id]
    if not hasattr(mats, "tex_kind") or mats.tex_kind is None:
        return base
    kind = mats.tex_kind[mat_id]
    scale = mats.tex_scale[mat_id]
    alb2 = mats.albedo2[mat_id]
    t_checker = checker(p, scale)
    t_grid = grid_lines(p, scale)
    t_noise = value_noise(p * scale[..., None])
    t = jnp.where(
        kind == TEX_CHECKER, t_checker,
        jnp.where(kind == TEX_GRID, t_grid,
                  jnp.where(kind == TEX_NOISE, t_noise, 0.0)),
    )
    return base * (1.0 - t[..., None]) + alb2 * t[..., None]
