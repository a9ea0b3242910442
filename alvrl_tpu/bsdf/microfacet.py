"""GGX microfacet BSDF (rough conductor / rough plastic).

Counterpart of src/bsdfs/{roughconductor,roughplastic}.cpp restricted to
the GGX (Trowbridge-Reitz) distribution with Smith's separable masking —
the reference's default recommendation. Works in the local frame with
z = shading normal; callers transform with core.math frames.

eval() returns f * cos(theta_o) (mitsuba's convention: BSDF::eval
includes the outgoing cosine). sample() uses visible-normal-free D
sampling (classic D(m) |m.n| pdf), adequate for the roughness range the
scenes use; pdf() matches sample() for MIS/chi-square checks.
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.core import math as m


def ggx_d(mh, alpha):
    """GGX NDF D(m) for local half-vector mh (z-up)."""
    ct = jnp.clip(mh[..., 2], 1e-6, 1.0)
    ct2 = ct * ct
    a2 = alpha * alpha
    # D = a2 / (pi * (ct2 * (a2 - 1) + 1)^2)
    t = ct2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * t * t, 1e-12)


def smith_g1(v, alpha):
    """Smith masking for GGX (height-uncorrelated, per direction)."""
    ct = jnp.abs(v[..., 2])
    ct = jnp.clip(ct, 1e-6, 1.0)
    tan2 = (1.0 - ct * ct) / (ct * ct)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2))


def fresnel_conductor_schlick(cos_i, f0):
    """Schlick approximation with per-channel F0 (conductor tint)."""
    c = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return f0 + (1.0 - f0) * (c ** 5)[..., None]


def eval_rough_conductor(wi, wo, alpha, f0):
    """f(wi, wo) * cos_o for a GGX conductor; wi, wo local, z-up,
    pointing away from the surface."""
    ci = wi[..., 2]
    co = wo[..., 2]
    valid = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    d = ggx_d(h, alpha)
    g = smith_g1(wi, alpha) * smith_g1(wo, alpha)
    f = fresnel_conductor_schlick(m.dot(wi, h), f0)
    spec = f * (d * g / jnp.maximum(4.0 * ci, 1e-9))[..., None]
    return jnp.where(valid[..., None], spec, 0.0)


def sample_ggx_half(u2, alpha):
    """Sample a GGX half-vector ~ D(m)|m.n| (local frame)."""
    u0, u1 = u2[..., 0], u2[..., 1]
    phi = 2.0 * jnp.pi * u1
    ct2 = (1.0 - u0) / jnp.maximum(1.0 + (alpha * alpha - 1.0) * u0, 1e-12)
    ct = jnp.sqrt(jnp.clip(ct2, 0.0, 1.0))
    st = jnp.sqrt(jnp.clip(1.0 - ct2, 0.0, 1.0))
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def pdf_rough_conductor(wi, wo, alpha):
    """pdf of sample_rough_conductor in solid angle of wo."""
    h = m.normalize(wi + wo)
    d = ggx_d(h, alpha)
    pdf_h = d * jnp.clip(h[..., 2], 0.0, 1.0)
    jac = 1.0 / jnp.maximum(4.0 * jnp.abs(m.dot(wo, h)), 1e-9)
    return jnp.where((wi[..., 2] > 0) & (wo[..., 2] > 0), pdf_h * jac, 0.0)


def sample_rough_conductor(u2, wi, alpha, f0):
    """Returns (wo, weight (3,), pdf): weight = f*cos/pdf."""
    h = sample_ggx_half(u2, alpha)
    wo = 2.0 * m.dot(wi, h)[..., None] * h - wi
    pdf = pdf_rough_conductor(wi, wo, alpha)
    f_cos = eval_rough_conductor(wi, wo, alpha, f0)
    w = jnp.where(
        (pdf > 0)[..., None], f_cos / jnp.maximum(pdf, 1e-12)[..., None], 0.0
    )
    return wo, w, pdf


def eval_rough_plastic(wi, wo, alpha, diffuse_albedo, f0_scalar=0.04):
    """Rough plastic: GGX specular coat over a Lambertian base
    (roughplastic.cpp without the internal-scattering refinement)."""
    f0 = jnp.full((3,), f0_scalar, jnp.float32)
    spec = eval_rough_conductor(wi, wo, alpha, f0)
    co = jnp.clip(wo[..., 2], 0.0, 1.0)
    diff = diffuse_albedo * (co / jnp.pi)[..., None]
    valid = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(valid[..., None], spec + diff, 0.0)
