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


# ---------------------------------------------------------------------------
# Generalized microfacet distributions (src/bsdfs/microfacet.h:50-56):
# Beckmann (the reference's default), GGX, and Phong (Ashikhmin-Shirley
# when anisotropic), all with anisotropic (alpha_u, alpha_v) roughness.
# The distribution id is a per-material ARRAY column (scene.materials
# .dist) — every case is evaluated branchlessly and selected, the
# array-machine counterpart of the reference's switch dispatch.
# Conventions match microfacet.h: D eval at :191-233, sampleAll at
# :286-389, smithG1 with projected roughness at :477-556, Phong
# exponent <-> alpha conversion e = 2/alpha^2 - 2 at :701-704.
# ---------------------------------------------------------------------------

MF_BECKMANN = 0
MF_GGX = 1
MF_PHONG = 2

_TWO_PI = 2.0 * jnp.pi


def phong_exponent(alpha):
    """Equivalent Phong exponent for a Beckmann-style roughness
    (microfacet.h:701-704)."""
    return jnp.maximum(2.0 / jnp.maximum(alpha * alpha, 1e-8) - 2.0, 0.0)


def mf_d(dist, mh, au, av):
    """Microfacet NDF D(m) for all three kinds (microfacet.h:191-233).
    dist broadcasts against mh[..., 0]."""
    ct = mh[..., 2]
    ct2 = jnp.maximum(ct * ct, 1e-12)
    x2 = mh[..., 0] * mh[..., 0]
    y2 = mh[..., 1] * mh[..., 1]
    au2 = jnp.maximum(au * au, 1e-8)
    av2 = jnp.maximum(av * av, 1e-8)
    bexp = (x2 / au2 + y2 / av2) / ct2

    d_beck = jnp.exp(-bexp) / (jnp.pi * au * av * ct2 * ct2)
    root = (1.0 + bexp) * ct2
    d_ggx = 1.0 / jnp.maximum(jnp.pi * au * av * root * root, 1e-20)

    e_u = phong_exponent(au)
    e_v = phong_exponent(av)
    st2 = jnp.maximum(x2 + y2, 1e-12)
    e = jnp.where(x2 + y2 > 1e-12, (x2 * e_u + y2 * e_v) / st2, e_u)
    d_ph = (jnp.sqrt((e_u + 2.0) * (e_v + 2.0)) / _TWO_PI
            * jnp.power(jnp.maximum(ct, 1e-9), e))

    d = jnp.where(dist == MF_BECKMANN, d_beck,
                  jnp.where(dist == MF_PHONG, d_ph, d_ggx))
    # the reference zeroes numerically negligible results (:228-230)
    return jnp.where((ct > 0) & (d * ct >= 1e-20), d, 0.0)


def _project_roughness(v, au, av):
    """Roughness projected onto direction v (microfacet.h:545-556)."""
    st2 = jnp.maximum(1.0 - v[..., 2] * v[..., 2], 1e-12)
    cos_phi2 = v[..., 0] * v[..., 0] / st2
    sin_phi2 = v[..., 1] * v[..., 1] / st2
    proj = jnp.sqrt(cos_phi2 * au * au + sin_phi2 * av * av)
    return jnp.where(1.0 - v[..., 2] * v[..., 2] > 1e-12, proj, au)


def mf_g1(dist, v, mh, au, av):
    """Smith masking for one direction (microfacet.h:477-523). Phong
    reuses the Beckmann rational fit with its generating alpha."""
    ct = v[..., 2]
    sideness = (m.dot(v, mh) * ct) > 0
    tan_t = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0)) / jnp.maximum(
        jnp.abs(ct), 1e-9)
    alpha = _project_roughness(v, au, av)
    a = 1.0 / jnp.maximum(alpha * tan_t, 1e-9)
    a2 = a * a
    g_beck = jnp.where(
        a >= 1.6, 1.0,
        (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2))
    root = alpha * tan_t
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + root * root))
    g = jnp.where(dist == MF_GGX, g_ggx, g_beck)
    g = jnp.where(tan_t < 1e-9, 1.0, g)
    return jnp.where(sideness, g, 0.0)


def _aniso_phi(u1, au, av):
    """Anisotropic azimuth sampling phi = atan(av/au tan(...)) with the
    quadrant restoration of microfacet.h:300-305 (branchless)."""
    phi = jnp.arctan(av / au * jnp.tan(jnp.pi + _TWO_PI * u1)) \
        + jnp.pi * jnp.floor(2.0 * u1 + 0.5)
    return phi


def mf_sample(dist, u2, au, av):
    """Sample m ~ D(m)|cos| over ALL normals (sampleAll,
    microfacet.h:286-389). Returns (m, pdf)."""
    u0 = jnp.clip(u2[..., 0], 1e-7, 1.0 - 1e-7)
    u1 = u2[..., 1]
    phi = _aniso_phi(u1, au, av)
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)
    cos_sc = cos_phi / au
    sin_sc = sin_phi / av
    alpha_sqr = 1.0 / jnp.maximum(cos_sc * cos_sc + sin_sc * sin_sc, 1e-12)

    # beckmann
    tan2_b = alpha_sqr * -jnp.log(1.0 - u0)
    ct_b = 1.0 / jnp.sqrt(1.0 + tan2_b)
    pdf_b = (1.0 - u0) / (jnp.pi * au * av * ct_b * ct_b * ct_b)

    # ggx
    tan2_g = alpha_sqr * u0 / (1.0 - u0)
    ct_g = 1.0 / jnp.sqrt(1.0 + tan2_g)
    tmp_g = 1.0 + tan2_g / alpha_sqr
    pdf_g = 1.0 / (jnp.pi * au * av * ct_g ** 3 * tmp_g * tmp_g)

    # phong (Ashikhmin-Shirley azimuth: per-quadrant remap of u1)
    e_u = phong_exponent(au)
    e_v = phong_exponent(av)
    q = jnp.floor(u1 * 4.0)                      # quadrant 0..3
    u1q = jnp.abs(u1 * 4.0 - 2.0 * jnp.round(u1 * 2.0))  # folded to [0,1)
    # exact azimuth marginal for the (e+2)-normalized NDF: p(phi)
    # proportional to 1/(e(phi)+2) => (e+2) ratio here. (The reference
    # borrows PBRT's (e+1)-ratio Ashikhmin-Shirley scheme,
    # microfacet.h:707-718, which is ~percent-level inconsistent with
    # its own pdfAll; chi-square flags it, so we sample exactly.)
    phi_q = jnp.arctan(
        jnp.sqrt((e_u + 2.0) / (e_v + 2.0))
        * jnp.tan(0.5 * jnp.pi * jnp.clip(u1q, 1e-7, 1.0 - 1e-7)))
    phi_p = jnp.where(q == 0, phi_q,
                      jnp.where(q == 1, jnp.pi - phi_q,
                                jnp.where(q == 2, jnp.pi + phi_q,
                                          _TWO_PI - phi_q)))
    cos_pp = jnp.cos(phi_p)
    sin_pp = jnp.sin(phi_p)
    e_p = e_u * cos_pp * cos_pp + e_v * sin_pp * sin_pp
    ct_p = jnp.power(u0, 1.0 / (e_p + 2.0))
    pdf_p = (jnp.sqrt((e_u + 2.0) * (e_v + 2.0)) / _TWO_PI
             * jnp.power(ct_p, e_p + 1.0))

    is_b = dist == MF_BECKMANN
    is_p = dist == MF_PHONG
    ct = jnp.where(is_b, ct_b, jnp.where(is_p, ct_p, ct_g))
    sin_phi = jnp.where(is_p, sin_pp, sin_phi)
    cos_phi = jnp.where(is_p, cos_pp, cos_phi)
    pdf = jnp.where(is_b, pdf_b, jnp.where(is_p, pdf_p, pdf_g))
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    mh = jnp.stack([st * cos_phi, st * sin_phi, ct], axis=-1)
    return mh, jnp.maximum(pdf, 0.0)


def mf_pdf(dist, mh, au, av):
    """pdfAll: D(m) * |cos theta_m| (microfacet.h:456-466 without
    visible-normal weighting)."""
    return mf_d(dist, mh, au, av) * jnp.clip(mh[..., 2], 0.0, 1.0)


# ---- generalized conductor / plastic over the distribution column -------

def eval_rough_conductor_d(wi, wo, dist, au, av, f0):
    """eval_rough_conductor with selectable distribution + anisotropy
    (roughconductor.cpp:eval over microfacet.h)."""
    ci = wi[..., 2]
    co = wo[..., 2]
    valid = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    d = mf_d(dist, h, au, av)
    g = mf_g1(dist, wi, h, au, av) * mf_g1(dist, wo, h, au, av)
    f = fresnel_conductor_schlick(m.dot(wi, h), f0)
    spec = f * (d * g / jnp.maximum(4.0 * ci, 1e-9))[..., None]
    return jnp.where(valid[..., None], spec, 0.0)


def pdf_rough_conductor_d(wi, wo, dist, au, av):
    h = m.normalize(wi + wo)
    pdf_h = mf_pdf(dist, h, au, av)
    jac = 1.0 / jnp.maximum(4.0 * jnp.abs(m.dot(wo, h)), 1e-9)
    return jnp.where((wi[..., 2] > 0) & (wo[..., 2] > 0), pdf_h * jac, 0.0)


def sample_rough_conductor_d(u2, wi, dist, au, av, f0):
    h, _ = mf_sample(dist, u2, au, av)
    wo = 2.0 * m.dot(wi, h)[..., None] * h - wi
    pdf = pdf_rough_conductor_d(wi, wo, dist, au, av)
    f_cos = eval_rough_conductor_d(wi, wo, dist, au, av, f0)
    w = jnp.where(
        (pdf > 0)[..., None], f_cos / jnp.maximum(pdf, 1e-12)[..., None], 0.0
    )
    return wo, w, pdf


def eval_rough_plastic_d(wi, wo, dist, au, av, diffuse_albedo,
                         f0_scalar=0.04):
    f0 = jnp.full((3,), f0_scalar, jnp.float32)
    spec = eval_rough_conductor_d(wi, wo, dist, au, av, f0)
    co = jnp.clip(wo[..., 2], 0.0, 1.0)
    diff = diffuse_albedo * (co / jnp.pi)[..., None]
    valid = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(valid[..., None], spec + diff, 0.0)


# ---------------------------------------------------------------------------
# Rough dielectric (src/bsdfs/roughdielectric.cpp): microfacet
# reflection + refraction through a rough interface [Walter et al. 2007].
# eval at :244-330 (reflection half-vector, transmission half-vector
# -(eta_i wi + eta_o wo), the eta_o^2 Jacobian, the ERadiance 1/eta^2
# radiance-compression factor), sampling at :379-470 (m ~ D, then
# reflect/refract with probability F(wi.m)).
# ---------------------------------------------------------------------------


def _fresnel_signed(cos_im, eta):
    """Dielectric Fresnel for a signed cosine against the microfacet
    (eta = interior/exterior): entering uses eta, exiting 1/eta."""
    from alvrl_tpu.bsdf.lobes import fresnel_dielectric_scalar

    f_in = fresnel_dielectric_scalar(jnp.abs(cos_im), eta)
    f_out = fresnel_dielectric_scalar(jnp.abs(cos_im), 1.0 / eta)
    return jnp.where(cos_im >= 0, f_in, f_out)


def eval_rough_dielectric(wi, wo, eta, dist, au, av, mode="radiance"):
    """f * |cos_o| of the rough dielectric (roughdielectric.cpp:244-330).
    Handles both reflection (same hemisphere) and transmission."""
    ci = wi[..., 2]
    co = wo[..., 2]
    reflect = ci * co > 0

    # reflection half-vector, oriented to the upper hemisphere
    h_r = m.normalize(wi + wo)
    h_r = h_r * jnp.sign(h_r[..., 2])[..., None]
    # transmission half-vector (Walter eq. 16)
    eta_i = jnp.where(ci > 0, 1.0, eta)
    eta_o = jnp.where(ci > 0, eta, 1.0)
    h_t = m.normalize(wi * eta_i[..., None] + wo * eta_o[..., None])
    h_t = h_t * jnp.sign(h_t[..., 2])[..., None]  # orient z > 0
    h = jnp.where(reflect[..., None], h_r, h_t)

    d = mf_d(dist, h, au, av)
    g = mf_g1(dist, wi, h, au, av) * mf_g1(dist, wo, h, au, av)
    wih = m.dot(wi, h)
    woh = m.dot(wo, h)
    f = _fresnel_signed(jnp.where(ci > 0, wih, -wih), eta)

    val_r = f * d * g / jnp.maximum(4.0 * jnp.abs(ci), 1e-9)

    denom = eta_i * wih + eta_o * woh
    val_t = (
        jnp.abs(wih * woh) / jnp.maximum(jnp.abs(ci * co), 1e-9)
        * eta_o * eta_o * (1.0 - f) * d * g
        / jnp.maximum(denom * denom, 1e-12)
    ) * jnp.abs(co)
    if mode == "radiance":
        # radiance compression (roughdielectric.cpp factor^2)
        val_t = val_t * (eta_i / eta_o) ** 2
    ok_t = (~reflect) & (jnp.abs(denom) > 1e-9)
    return jnp.where(reflect, val_r, jnp.where(ok_t, val_t, 0.0))


def pdf_rough_dielectric(wi, wo, eta, dist, au, av):
    """Solid-angle pdf of sample_rough_dielectric (pdf,
    roughdielectric.cpp:332-377): pdf_m * lobe prob * Jacobian."""
    ci = wi[..., 2]
    co = wo[..., 2]
    reflect = ci * co > 0
    h_r = m.normalize(wi + wo)
    h_r = h_r * jnp.sign(h_r[..., 2])[..., None]
    eta_i = jnp.where(ci > 0, 1.0, eta)
    eta_o = jnp.where(ci > 0, eta, 1.0)
    h_t = m.normalize(wi * eta_i[..., None] + wo * eta_o[..., None])
    h_t = h_t * jnp.sign(h_t[..., 2])[..., None]
    h = jnp.where(reflect[..., None], h_r, h_t)
    wih = m.dot(wi, h)
    woh = m.dot(wo, h)
    f = _fresnel_signed(jnp.where(ci > 0, wih, -wih), eta)
    pdf_m = mf_pdf(dist, h, au, av)
    jac_r = 1.0 / jnp.maximum(4.0 * jnp.abs(woh), 1e-9)
    denom = eta_i * wih + eta_o * woh
    jac_t = eta_o * eta_o * jnp.abs(woh) / jnp.maximum(denom * denom, 1e-12)
    return jnp.where(reflect, pdf_m * f * jac_r,
                     pdf_m * (1.0 - f) * jac_t)


def sample_rough_dielectric(u3, wi, eta, dist, au, av, mode="radiance"):
    """Sample the rough dielectric (roughdielectric.cpp:379-470):
    m ~ D(m)|cos|, then reflect with probability F(wi.m) else refract.
    Returns (wo, weight (3,), pdf, did_transmit). weight = f|cos|/pdf
    computed from the closed forms (unbiased one-sample estimator)."""
    u_sel = u3[..., 0]
    mh, _ = mf_sample(dist, u3[..., 1:3], au, av)
    ci = wi[..., 2]
    wih = m.dot(wi, mh)
    f = _fresnel_signed(jnp.where(ci > 0, wih, -wih), eta)
    take_r = u_sel < f

    wo_r = 2.0 * wih[..., None] * mh - wi

    # refraction about mh (Walter eq. 40)
    inv_eta_rel = jnp.where(ci > 0, 1.0 / eta, eta)
    c = wih
    sign_c = jnp.sign(c)
    cos_t2 = 1.0 - inv_eta_rel * inv_eta_rel * (1.0 - c * c)
    tir = cos_t2 <= 0.0
    wo_t = (inv_eta_rel * c - sign_c * jnp.sqrt(jnp.maximum(cos_t2, 0.0))
            )[..., None] * mh - inv_eta_rel[..., None] * wi

    wo = jnp.where(take_r[..., None], wo_r, wo_t)
    # invalid refractions (TIR was already folded into F == 1, but
    # numerical stragglers exist) and wrong-side reflections die
    ok = jnp.where(take_r, wo[..., 2] * ci > 0,
                   (~tir) & (wo[..., 2] * ci < 0))
    f_cos = eval_rough_dielectric(wi, wo, eta, dist, au, av, mode=mode)
    pdf = pdf_rough_dielectric(wi, wo, eta, dist, au, av)
    w = jnp.where((ok & (pdf > 1e-20))[..., None],
                  (f_cos / jnp.maximum(pdf, 1e-20))[..., None]
                  * jnp.ones((3,), jnp.float32), 0.0)
    return wo, w, pdf, (~take_r) & ok


# ---------------------------------------------------------------------------
# Rough transmittance table (the counterpart of the reference's
# precomputed RoughTransmittance data + src/utils/rdielprec.cpp): the
# fraction of radiance transmitted through a rough dielectric interface
# as a function of (cos theta, alpha), computed by host Monte Carlo over
# the sampling routine above. Used by ROUGH_COATING.
# ---------------------------------------------------------------------------

_RT_COS = 16
_RT_ALPHA = 8
_RT_SAMPLES = 2048
_rt_cache = {}


def rough_transmittance_table(eta: float, dist_kind: int = MF_BECKMANN,
                              alpha_max: float = 0.5):
    """(cos x alpha) table of int f_t(wi, wo) |cos_o| dwo, computed by
    importance sampling the full lobe and accumulating the transmitted
    fraction (what data/microfacet/*.dat ships in the reference;
    rdielprec.cpp regenerates it)."""
    key = (round(float(eta), 4), dist_kind, round(alpha_max, 4))
    if key in _rt_cache:
        return _rt_cache[key]
    import numpy as np_

    rs = np_.random.default_rng(1234)
    u = rs.uniform(1e-6, 1.0 - 1e-6, (_RT_SAMPLES, 3)).astype(np_.float32)
    cos_grid = np_.linspace(1.0 / _RT_COS, 1.0, _RT_COS, dtype=np_.float32)
    alpha_grid = np_.linspace(
        alpha_max / _RT_ALPHA, alpha_max, _RT_ALPHA, dtype=np_.float32)
    tbl = np_.zeros((_RT_COS, _RT_ALPHA), np_.float32)
    for i, cti in enumerate(cos_grid):
        sti = float(np_.sqrt(max(0.0, 1.0 - cti * cti)))
        wi = jnp.asarray([sti, 0.0, float(cti)], jnp.float32)
        for j, a in enumerate(alpha_grid):
            _, w, _, is_t = sample_rough_dielectric(
                jnp.asarray(u), jnp.broadcast_to(wi, (_RT_SAMPLES, 3)),
                jnp.float32(eta), jnp.int32(dist_kind),
                jnp.float32(a), jnp.float32(a), mode="importance",
            )
            tbl[i, j] = float(
                jnp.mean(jnp.where(is_t, w[..., 0], 0.0)))
    out = jnp.asarray(np_.clip(tbl, 0.0, 1.0))
    _rt_cache[key] = out
    return out


def rough_transmittance(table, cos_i, alpha, alpha_max: float = 0.5):
    """Bilinear lookup of the (cos, alpha) transmittance table."""
    gx = jnp.clip(jnp.abs(cos_i), 0.0, 1.0) * _RT_COS - 1.0
    gy = jnp.clip(alpha / alpha_max, 0.0, 1.0) * _RT_ALPHA - 1.0
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, _RT_COS - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, _RT_ALPHA - 2)
    fx = jnp.clip(gx - x0, 0.0, 1.0)
    fy = jnp.clip(gy - y0, 0.0, 1.0)
    t00 = table[x0, y0]
    t01 = table[x0, y0 + 1]
    t10 = table[x0 + 1, y0]
    t11 = table[x0 + 1, y0 + 1]
    return ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
            + (t01 * (1 - fx) + t11 * fx) * fy)


def rough_transmittance_b(table, cos_i, alpha, alpha_max: float = 0.5):
    """rough_transmittance for BATCHED tables (..., _RT_COS, _RT_ALPHA)
    gathered per material id — four flat take_along_axis gathers."""
    gx = jnp.clip(jnp.abs(cos_i), 0.0, 1.0) * _RT_COS - 1.0
    gy = jnp.clip(alpha / alpha_max, 0.0, 1.0) * _RT_ALPHA - 1.0
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, _RT_COS - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, _RT_ALPHA - 2)
    fx = jnp.clip(gx - x0, 0.0, 1.0)
    fy = jnp.clip(gy - y0, 0.0, 1.0)
    flat = table.reshape(table.shape[:-2] + (_RT_COS * _RT_ALPHA,))

    def at(xi, yi):
        idx = xi * _RT_ALPHA + yi
        return jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]

    return ((at(x0, y0) * (1 - fx) + at(x0 + 1, y0) * fx) * (1 - fy)
            + (at(x0, y0 + 1) * (1 - fx) + at(x0 + 1, y0 + 1) * fx) * fy)
