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


# ---------------------------------------------------------------------------
# Heterogeneous (grid-medium) packs: the kernel consumes cumulative-OD
# tables per eye ray / per VRL (media.heterogeneous.cumulative_od) and
# CP density factors (ops.cp).
# ---------------------------------------------------------------------------


def pack_rays_hetero(scene: Scene, ray_o, ray_d, hit):
    """(B', H_RAY_ROWS): base ray rows + eye cum-OD table; the _TAU
    rows carry the per-channel eye->surface tau (from the table's
    total, the same numbers the XLA path uses)."""
    from alvrl_tpu.media import heterogeneous as gmed

    med = scene.medium
    mat = scene.material[jnp.maximum(hit.prim, 0)]
    kind = scene.materials.kind[mat]
    albedo = jnp.where(
        (kind == DIFFUSE)[..., None], scene.materials.albedo[mat], 0.0
    )
    hit_p = jnp.where(hit.valid[..., None], hit.p, ray_o)
    eye_od = gmed.cumulative_od(med, ray_o, hit_p)     # (B, NQ+1)
    tau_eu = jnp.exp(-med.sigma_t_color * eye_od[:, -1:])
    tau_eu = jnp.where(hit.valid[..., None], tau_eu, 0.0)
    b = ray_o.shape[0]
    pack = jnp.zeros((b, vp.H_RAY_ROWS), jnp.float32)
    pack = pack.at[:, vp._RO:vp._RO + 3].set(ray_o)
    pack = pack.at[:, vp._RD:vp._RD + 3].set(ray_d)
    pack = pack.at[:, vp._HP:vp._HP + 3].set(hit_p)
    pack = pack.at[:, vp._NG:vp._NG + 3].set(hit.ng)
    pack = pack.at[:, vp._ALB:vp._ALB + 3].set(albedo)
    pack = pack.at[:, vp._VALID].set(hit.valid.astype(jnp.float32))
    pack = pack.at[:, vp._TAU:vp._TAU + 3].set(tau_eu)
    pack = pack.at[:, vp._EOD:vp._EOD + vp.NQ + 1].set(eye_od)
    return _pad_rows(pack, vp.RAY_TILE)


def pack_vrls_hetero(vrls, med):
    """(H_VRL_ROWS, N'): base vrl rows + per-VRL cum-OD table."""
    from alvrl_tpu.media import heterogeneous as gmed

    n = vrls.capacity
    vrl_od = gmed.cumulative_od(med, vrls.start, vrls.end)  # (N, NQ+1)
    pack = jnp.zeros((n, vp.H_VRL_ROWS), jnp.float32)
    pack = pack.at[:, vp._VS:vp._VS + 3].set(vrls.start)
    pack = pack.at[:, vp._VE:vp._VE + 3].set(vrls.end)
    pack = pack.at[:, vp._VP:vp._VP + 3].set(vrls.power)
    pack = pack.at[:, vp._VVALID].set(vrls.valid.astype(jnp.float32))
    pack = pack.at[:, vp._VOD:vp._VOD + vp.NQ + 1].set(vrl_od)
    return _pad_rows(pack, vp.VRL_TILE).T


def pack_medium_hetero(med):
    """(1, 32) grid-medium parameter block (see _kernel hetero docs)."""
    dz, dy, dx = med.density.shape
    extent = med.box_max - med.box_min
    pack = jnp.zeros((1, 32), jnp.float32)
    pack = pack.at[0, 0:3].set(med.sigma_t_color)
    pack = pack.at[0, 3:6].set(med.sigma_s_color)
    pack = pack.at[0, 6].set(med.g)
    pack = pack.at[0, 7].set(jnp.mean(med.sigma_t_color))
    pack = pack.at[0, 8:11].set(med.box_min)
    pack = pack.at[0, 11:14].set(1.0 / extent)
    pack = pack.at[0, 14].set(jnp.float32(2 * (dx - 1)))
    pack = pack.at[0, 15].set(jnp.float32(2 * (dy - 1)))
    pack = pack.at[0, 16].set(jnp.float32(2 * (dz - 1)))
    return pack


def pack_cp(med, rank: int = 48):
    """Host-side CP fit of the medium's supersampled density ->
    ((3*rank, 128) factors, fit_error). Concrete arrays only."""
    from alvrl_tpu.ops import cp as cp_mod

    factors, err = cp_mod.fit_medium(med, rank=rank)
    return jnp.asarray(factors.reshape(3 * rank, 128)), err
