"""Chi-square goodness-of-fit harness for directional sampling routines.

Counterpart of include/mitsuba/core/chisquare.h (:81-162) +
src/libcore/chisquare.cpp: bucket a sampling routine's outputs into a
(theta, phi) histogram, integrate the claimed pdf per cell, pool
low-count cells, and run a chi-square test. Used by the test suite to
verify sample()/pdf() consistency of phase functions and BSDF lobes —
the reference's test strategy (SURVEY §4).
"""

from __future__ import annotations

import numpy as np
from scipy import special as _sp  # scipy ships with the image? fallback below


def _chi2_sf(x, k):
    """Survival function of the chi-square distribution."""
    return float(_sp.gammaincc(k / 2.0, x / 2.0))


def chi_square_test(
    sample_fn,
    pdf_fn,
    n_samples: int = 100_000,
    theta_bins: int = 10,
    phi_bins: int = 20,
    significance: float = 0.01,
    min_exp_count: float = 5.0,
    pdf_resolution: int = 8,
):
    """sample_fn(n) -> (n, 3) unit directions; pdf_fn(dirs (m,3)) ->
    (m,) solid-angle density. Returns (passed, p_value, stats)."""
    dirs = np.asarray(sample_fn(n_samples))
    cos_theta = np.clip(dirs[:, 2], -1, 1)
    phi = np.arctan2(dirs[:, 1], dirs[:, 0])  # [-pi, pi]

    obs, _, _ = np.histogram2d(
        cos_theta, phi,
        bins=[theta_bins, phi_bins],
        range=[[-1, 1], [-np.pi, np.pi]],
    )

    # integrate the pdf per cell with a midpoint sub-grid
    exp = np.zeros((theta_bins, phi_bins))
    dct = 2.0 / theta_bins
    dph = 2.0 * np.pi / phi_bins
    sub = pdf_resolution
    for i in range(theta_bins):
        for j in range(phi_bins):
            ct = -1 + (i + (np.arange(sub) + 0.5) / sub) * dct
            ph = -np.pi + (j + (np.arange(sub) + 0.5) / sub) * dph
            ctg, phg = np.meshgrid(ct, ph, indexing="ij")
            st = np.sqrt(np.clip(1 - ctg ** 2, 0, 1))
            d = np.stack(
                [st * np.cos(phg), st * np.sin(phg), ctg], axis=-1
            ).reshape(-1, 3)
            pdf = np.asarray(pdf_fn(d)).reshape(sub, sub)
            exp[i, j] = pdf.mean() * dct * dph  # d(cos)d(phi) measure
    exp *= n_samples

    # pool cells with low expected counts (chisquare.cpp behavior)
    obs_f = obs.reshape(-1)
    exp_f = exp.reshape(-1)
    order = np.argsort(exp_f)
    pooled_obs, pooled_exp = [], []
    acc_o = acc_e = 0.0
    for k in order:
        acc_o += obs_f[k]
        acc_e += exp_f[k]
        if acc_e >= min_exp_count:
            pooled_obs.append(acc_o)
            pooled_exp.append(acc_e)
            acc_o = acc_e = 0.0
    if acc_e > 0 and pooled_exp:
        pooled_obs[-1] += acc_o
        pooled_exp[-1] += acc_e
    pooled_obs = np.asarray(pooled_obs)
    pooled_exp = np.asarray(pooled_exp)

    dof = len(pooled_exp) - 1
    if dof <= 0:
        return False, 0.0, {"dof": dof}
    chi2 = float(np.sum((pooled_obs - pooled_exp) ** 2 / pooled_exp))
    p = _chi2_sf(chi2, dof)
    return p >= significance, p, {
        "chi2": chi2, "dof": dof,
        "total_exp": float(exp.sum()), "n": n_samples,
    }
