"""Phase functions: Henyey-Greenstein (isotropic as the g=0 case).

Counterpart of src/phase/{isotropic,hg}.cpp. Convention matches the
reference's PhaseFunctionSamplingRecord: `eval(g, wi, wo)` with the HG
lobe written in terms of dot(wi, wo), i.e. the reference evaluates
eval(pRec(mRec, -VU, -EU)) with wi pointing *away* from the propagation
direction of the incoming light (hg.cpp:107-110).

Sampling returns weight 1 (perfect importance sampling, hg.cpp:73-97).
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.core import math as m

_G_EPS = 1e-4


def eval_hg(g, wi, wo):
    """HG phase value; INV_FOURPI * (1-g^2) / (1+g^2+2g cos)^(3/2)."""
    temp = 1.0 + g * g + 2.0 * g * m.dot(wi, wo)
    temp = jnp.maximum(temp, 1e-12)
    return m.INV_FOURPI * (1.0 - g * g) / (temp * jnp.sqrt(temp))


def sample_hg(g, wi, u2):
    """Sample wo given wi; returns (wo, weight=1, pdf).

    Branchless mix of the isotropic (|g| < eps) and HG inverse-CDF cases
    (hg.cpp:73-97). wo is built in the frame around -wi, as the reference
    does (pRec.wo = Frame(-wi).toWorld(...)).
    """
    u0, u1 = u2[..., 0], u2[..., 1]
    g_safe = jnp.where(jnp.abs(g) < _G_EPS, _G_EPS, g)
    sqr_term = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u0)
    cos_hg = (1.0 + g_safe * g_safe - sqr_term * sqr_term) / (2.0 * g_safe)
    cos_iso = 1.0 - 2.0 * u0
    cos_theta = jnp.where(jnp.abs(g) < _G_EPS, cos_iso, cos_hg)
    phi = 2.0 * jnp.pi * u1
    local = m.spherical_direction(cos_theta, phi)
    axis = -wi
    s, t = m.build_frame(axis)
    wo = m.frame_to_world(s, t, axis, local)
    pdf = eval_hg(g, wi, wo)
    return wo, jnp.ones_like(pdf), pdf
