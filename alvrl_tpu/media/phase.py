"""Phase functions: Henyey-Greenstein (isotropic as the g=0 case) and
Rayleigh, behind a static per-medium kind switch.

Counterpart of src/phase/{isotropic,hg,rayleigh}.cpp. Convention matches
the reference's PhaseFunctionSamplingRecord: `eval(g, wi, wo)` with the
HG lobe written in terms of dot(wi, wo), i.e. the reference evaluates
eval(pRec(mRec, -VU, -EU)) with wi pointing *away* from the propagation
direction of the incoming light (hg.cpp:107-110).

Sampling returns weight 1 (perfect importance sampling: hg.cpp:73-97;
rayleigh.cpp samples its exact CDF by a Cardano cubic inversion).

The kind is a *static* python int on the medium (one phase function per
medium, as in the reference's scene graph), so XLA compiles only the
branch taken; kkay/microflake (oriented media) are a planned round-2
item together with orientation volumes.
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.core import math as m

# phase kinds (static per-medium)
HG = 0         # hg.cpp (g=0 == isotropic.cpp)
RAYLEIGH = 1   # rayleigh.cpp

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


def eval_rayleigh(wi, wo):
    """Rayleigh lobe 3/(16pi) * (1 + cos^2) with cos = dot(wi, wo)
    (rayleigh.cpp eval; same wi convention as HG)."""
    c = m.dot(wi, wo)
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + c * c)


def sample_rayleigh(wi, u2):
    """Exact inverse-CDF sampling of the Rayleigh lobe.

    cos(theta) solves the depressed cubic mu^3 + 3 mu = 8u - 4
    (CDF of 3/8 (1+mu^2)); Cardano: mu = c - 1/c with
    c = cbrt(q + sqrt(q^2 + 1)), q = 4u - 2 (rayleigh.cpp sample).
    Returns (wo, weight=1, pdf)."""
    u0, u1 = u2[..., 0], u2[..., 1]
    q = 4.0 * u0 - 2.0
    croot = jnp.cbrt(q + jnp.sqrt(q * q + 1.0))
    cos_theta = jnp.clip(croot - 1.0 / croot, -1.0, 1.0)
    phi = 2.0 * jnp.pi * u1
    local = m.spherical_direction(cos_theta, phi)
    axis = -wi
    s, t = m.build_frame(axis)
    wo = m.frame_to_world(s, t, axis, local)
    pdf = eval_rayleigh(wi, wo)
    return wo, jnp.ones_like(pdf), pdf


def eval_phase(kind: int, g, wi, wo):
    """Static phase dispatch (the PhaseFunction plugin switch)."""
    if kind == RAYLEIGH:
        return eval_rayleigh(wi, wo)
    return eval_hg(g, wi, wo)


def sample_phase(kind: int, g, wi, u2):
    if kind == RAYLEIGH:
        return sample_rayleigh(wi, u2)
    return sample_hg(g, wi, u2)
