"""Packing helpers: Scene/VRL pytrees -> the flat tiles the Pallas
kernel consumes."""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.media import homogeneous as hmed
from alvrl_tpu.ops import vrl_pallas as vp
from alvrl_tpu.scene.scene import DIFFUSE, Scene


def _pad_rows(a, mult):
    n = a.shape[0]
    p = (-(-n // mult)) * mult - n
    if p:
        a = jnp.pad(a, [(0, p)] + [(0, 0)] * (a.ndim - 1))
    return a


def pack_rays(scene: Scene, ray_o, ray_d, hit):
    """(B', RAY_ROWS) with B' padded to the ray tile."""
    mat = scene.material[jnp.maximum(hit.prim, 0)]
    kind = scene.materials.kind[mat]
    albedo = jnp.where(
        (kind == DIFFUSE)[..., None], scene.materials.albedo[mat], 0.0
    )
    hit_p = jnp.where(hit.valid[..., None], hit.p, ray_o)
    dist_eh = jnp.linalg.norm(hit_p - ray_o, axis=-1)
    tau_eu = hmed.eval_transmittance(scene.medium, dist_eh)
    tau_eu = jnp.where(hit.valid[..., None], tau_eu, 0.0)
    b = ray_o.shape[0]
    pack = jnp.zeros((b, vp.RAY_ROWS), jnp.float32)
    pack = pack.at[:, vp._RO:vp._RO + 3].set(ray_o)
    pack = pack.at[:, vp._RD:vp._RD + 3].set(ray_d)
    pack = pack.at[:, vp._HP:vp._HP + 3].set(hit_p)
    pack = pack.at[:, vp._NG:vp._NG + 3].set(hit.ng)
    pack = pack.at[:, vp._ALB:vp._ALB + 3].set(albedo)
    pack = pack.at[:, vp._VALID].set(hit.valid.astype(jnp.float32))
    pack = pack.at[:, vp._TAU:vp._TAU + 3].set(tau_eu)
    return _pad_rows(pack, vp.RAY_TILE)


def pack_vrls(vrls):
    """(VRL_ROWS, N') with N' padded to the vrl tile."""
    n = vrls.capacity
    pack = jnp.zeros((n, vp.VRL_ROWS), jnp.float32)
    pack = pack.at[:, vp._VS:vp._VS + 3].set(vrls.start)
    pack = pack.at[:, vp._VE:vp._VE + 3].set(vrls.end)
    pack = pack.at[:, vp._VP:vp._VP + 3].set(vrls.power)
    pack = pack.at[:, vp._VVALID].set(vrls.valid.astype(jnp.float32))
    return _pad_rows(pack, vp.VRL_TILE).T


def pack_tris(scene: Scene):
    """(T*9,) opaque triangles as p0, e1, e2 (host-computable)."""
    opaque = scene.opaque_faces()
    # static shapes: keep all faces, zero out non-opaque (degenerate tris
    # never intersect)
    f = scene.faces
    p0 = scene.vertices[f[:, 0]]
    p1 = scene.vertices[f[:, 1]]
    p2 = scene.vertices[f[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0
    tri = jnp.concatenate([p0, e1, e2], axis=1)
    tri = jnp.where(opaque[:, None], tri, 0.0)
    return tri.reshape(-1)


def pack_medium(scene: Scene):
    med = scene.medium
    pack = jnp.zeros((1, 16), jnp.float32)
    pack = pack.at[0, 0:3].set(med.sigma_t)
    pack = pack.at[0, 3:6].set(med.sigma_s)
    pack = pack.at[0, 6].set(med.g)
    pack = pack.at[0, 7].set(med.sampling_weight)
    return pack
