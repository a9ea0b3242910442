"""Classic analytic BSDF lobes: Phong, Ward, diffuse transmission,
smooth plastic.

Counterpart of src/bsdfs/{phong,ward,difftrans,plastic}.cpp. All
functions work in the local frame (z = shading normal, wi/wo point away
from the surface) and return f * cos(theta_o) for eval (mitsuba's
BSDF::eval convention) — matching alvrl_tpu.bsdf.microfacet.

Sampling returns (wo_local, weight (3,), pdf) with weight =
f*cos/pdf, computed against the full lobe-mixture pdf (one-sample MIS
over the analytic lobes, as the reference plugins do).
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.core import math as m
from alvrl_tpu.core import spectrum, warp

_INV_PI = 1.0 / jnp.pi


def _reflect_local(wi):
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


# ---------------------------------------------------------------------------
# Phong (phong.cpp): kd/pi + ks (n+2)/(2pi) cos^n(alpha_R)
# ---------------------------------------------------------------------------

def eval_phong(wi, wo, kd, ks, exponent):
    ci, co = wi[..., 2], wo[..., 2]
    valid = (ci > 0) & (co > 0)
    r = _reflect_local(wi)
    cos_a = jnp.clip(m.dot(r, wo), 0.0, 1.0)
    spec = ks * ((exponent + 2.0) / (2.0 * jnp.pi)
                 * cos_a ** exponent)[..., None]
    f = kd * _INV_PI + spec
    return jnp.where(valid[..., None], f * co[..., None], 0.0)


def pdf_phong(wi, wo, kd, ks, exponent):
    """Mixture pdf of sample_phong (diffuse cosine + cos^n specular)."""
    p_spec = _phong_spec_prob(kd, ks)
    co = jnp.clip(wo[..., 2], 0.0, 1.0)
    r = _reflect_local(wi)
    cos_a = jnp.clip(m.dot(r, wo), 0.0, 1.0)
    pdf_d = co * _INV_PI
    pdf_s = (exponent + 1.0) / (2.0 * jnp.pi) * cos_a ** exponent
    return (1.0 - p_spec) * pdf_d + p_spec * pdf_s


def _phong_spec_prob(kd, ks):
    ld = spectrum.luminance(kd)
    ls = spectrum.luminance(ks)
    return ls / jnp.maximum(ld + ls, 1e-12)


def sample_phong(u3, wi, kd, ks, exponent):
    """u3: (3,) uniforms (lobe select + 2D)."""
    u_sel, u0, u1 = u3[..., 0], u3[..., 1], u3[..., 2]
    p_spec = _phong_spec_prob(kd, ks)
    # diffuse candidate
    wo_d = warp.square_to_cosine_hemisphere(jnp.stack([u0, u1], axis=-1))
    # specular candidate: cos^n around the reflection direction
    cos_a = u0 ** (1.0 / (exponent + 1.0))
    sin_a = jnp.sqrt(jnp.clip(1.0 - cos_a * cos_a, 0.0, 1.0))
    phi = 2.0 * jnp.pi * u1
    local = jnp.stack(
        [sin_a * jnp.cos(phi), sin_a * jnp.sin(phi), cos_a], axis=-1
    )
    r = _reflect_local(wi)
    s, t = m.build_frame(r)
    wo_s = m.frame_to_world(s, t, r, local)
    take_spec = u_sel < p_spec
    wo = jnp.where(take_spec[..., None], wo_s, wo_d)
    pdf = pdf_phong(wi, wo, kd, ks, exponent)
    f_cos = eval_phong(wi, wo, kd, ks, exponent)
    w = jnp.where((pdf > 1e-12)[..., None],
                  f_cos / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    return wo, w, pdf


# ---------------------------------------------------------------------------
# Ward (ward.cpp, the 'balanced' variant): anisotropic gaussian lobe
# ---------------------------------------------------------------------------

def eval_ward(wi, wo, kd, ks, alpha_u, alpha_v):
    ci, co = wi[..., 2], wo[..., 2]
    valid = (ci > 1e-4) & (co > 1e-4)
    h = wi + wo
    hz2 = jnp.maximum(h[..., 2] * h[..., 2], 1e-12)
    expo = jnp.exp(-(
        (h[..., 0] / alpha_u) ** 2 + (h[..., 1] / alpha_v) ** 2
    ) / hz2)
    spec = ks * (expo / (4.0 * jnp.pi * alpha_u * alpha_v
                         * jnp.sqrt(jnp.maximum(ci * co, 1e-12))))[..., None]
    f = kd * _INV_PI + spec
    return jnp.where(valid[..., None], f * co[..., None], 0.0)


def pdf_ward(wi, wo, kd, ks, alpha_u, alpha_v):
    p_spec = _phong_spec_prob(kd, ks)
    co = jnp.clip(wo[..., 2], 0.0, 1.0)
    pdf_d = co * _INV_PI
    h = m.normalize(wi + wo)
    hz = jnp.clip(h[..., 2], 1e-4, 1.0)
    expo = jnp.exp(-(
        (h[..., 0] / alpha_u) ** 2 + (h[..., 1] / alpha_v) ** 2
    ) / (hz * hz))
    # pdf(h) = expo / (pi au av hz^3) (the anisotropic-gaussian
    # half-vector density; isotropic check: exp(-tan^2/a^2)/(pi a^2
    # cos^3)); jacobian dwh/dwo = 1/(4 h.wo)
    pdf_s = expo / (
        jnp.pi * alpha_u * alpha_v * hz ** 3
    ) / jnp.maximum(4.0 * jnp.abs(m.dot(h, wo)), 1e-9)
    return (1.0 - p_spec) * pdf_d + p_spec * pdf_s


def sample_ward(u3, wi, kd, ks, alpha_u, alpha_v):
    u_sel, u0, u1 = u3[..., 0], u3[..., 1], u3[..., 2]
    p_spec = _phong_spec_prob(kd, ks)
    wo_d = warp.square_to_cosine_hemisphere(jnp.stack([u0, u1], axis=-1))
    # anisotropic half-vector (ward.cpp sample): phi_h with the
    # alpha-ratio tangent warp, quadrant-preserved
    phi_in = 2.0 * jnp.pi * u1
    phi_h = jnp.arctan2(alpha_v * jnp.sin(phi_in), alpha_u * jnp.cos(phi_in))
    cos_ph = jnp.cos(phi_h)
    sin_ph = jnp.sin(phi_h)
    denom = (cos_ph / alpha_u) ** 2 + (sin_ph / alpha_v) ** 2
    tan2_th = -jnp.log(jnp.maximum(u0, 1e-9)) / jnp.maximum(denom, 1e-12)
    cos_th = 1.0 / jnp.sqrt(1.0 + tan2_th)
    sin_th = jnp.sqrt(jnp.clip(1.0 - cos_th * cos_th, 0.0, 1.0))
    h = jnp.stack([sin_th * cos_ph, sin_th * sin_ph, cos_th], axis=-1)
    wo_s = 2.0 * m.dot(wi, h)[..., None] * h - wi
    take_spec = u_sel < p_spec
    wo = jnp.where(take_spec[..., None], wo_s, wo_d)
    pdf = pdf_ward(wi, wo, kd, ks, alpha_u, alpha_v)
    f_cos = eval_ward(wi, wo, kd, ks, alpha_u, alpha_v)
    ok = (pdf > 1e-12) & (wo[..., 2] > 0)
    w = jnp.where(ok[..., None],
                  f_cos / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    return wo, w, pdf


# ---------------------------------------------------------------------------
# Diffuse transmission (difftrans.cpp): albedo/pi on the far hemisphere
# ---------------------------------------------------------------------------

def eval_difftrans(wi, wo, albedo):
    """Transmits: wo on the opposite side of wi."""
    opposite = (wi[..., 2] * wo[..., 2]) < 0
    aco = jnp.abs(wo[..., 2])
    return jnp.where(opposite[..., None],
                     albedo * (aco * _INV_PI)[..., None], 0.0)


def sample_difftrans(u2, wi, albedo):
    local = warp.square_to_cosine_hemisphere(u2)
    # flip to the hemisphere opposite wi
    sign = jnp.where(wi[..., 2] > 0, -1.0, 1.0)
    wo = jnp.stack(
        [local[..., 0], local[..., 1], sign * local[..., 2]], axis=-1
    )
    pdf = jnp.abs(wo[..., 2]) * _INV_PI
    return wo, albedo * jnp.ones_like(wo), pdf


# ---------------------------------------------------------------------------
# Smooth plastic (plastic.cpp): delta dielectric coat over Lambert
# ---------------------------------------------------------------------------

def fresnel_dielectric_scalar(cos_i, eta):
    """Unpolarized Fresnel reflectance, cos_i >= 0, eta = int/ext."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin_t2 = (1.0 / (eta * eta)) * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin_t2 >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    return jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))


def eval_plastic_smooth(wi, wo, albedo, eta):
    """Smooth part only (the coat reflection is a delta lobe):
    (1-F_i)(1-F_o) albedo/pi cos_o — plastic.cpp without the
    internal-scattering series (documented simplification)."""
    ci, co = wi[..., 2], wo[..., 2]
    valid = (ci > 0) & (co > 0)
    fi = fresnel_dielectric_scalar(ci, eta)
    fo = fresnel_dielectric_scalar(co, eta)
    f = albedo * ((1.0 - fi) * (1.0 - fo) * _INV_PI * co)[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def sample_plastic_smooth(u3, wi, albedo, eta):
    """With prob F(cos_i): delta specular reflection (weight 1);
    else cosine diffuse (weight albedo * (1-F_o)).
    Returns (wo, weight, is_delta)."""
    u_sel, u0, u1 = u3[..., 0], u3[..., 1], u3[..., 2]
    fi = fresnel_dielectric_scalar(wi[..., 2], eta)
    take_spec = u_sel < fi
    wo_s = _reflect_local(wi)
    wo_d = warp.square_to_cosine_hemisphere(jnp.stack([u0, u1], axis=-1))
    wo = jnp.where(take_spec[..., None], wo_s, wo_d)
    fo = fresnel_dielectric_scalar(wo_d[..., 2], eta)
    w_d = albedo * (1.0 - fo)[..., None]
    w = jnp.where(take_spec[..., None], jnp.ones_like(albedo), w_d)
    return wo, w, take_spec
