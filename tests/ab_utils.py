"""Variance-aware A/B helpers for estimator agreement tests.

VERDICT r03 item 6: fixed ±15–25% bands cannot catch real estimator
bias. Instead, run each estimator k>=2 times with independent keys,
estimate each side's self-noise from the sample std of its run means,
and gate the difference of means at a z-score — the methodology
test_ab_oracle.py uses against the volpath oracle (reference analog:
internalSamples equal-transport A/Bs, volpath.cpp:109-118)."""

import numpy as np


def mean_z(runs_a, runs_b, floor_frac=0.01, z_max=4.0):
    """z-score of the difference of image means between two estimators,
    each given as a list of >=2 independent run images. Returns
    (z, mean_a, mean_b, sigma); asserts nothing — callers gate."""
    ma = np.array([np.mean(r) for r in runs_a], np.float64)
    mb = np.array([np.mean(r) for r in runs_b], np.float64)
    sa = (ma.std(ddof=1) / np.sqrt(len(ma))) if len(ma) > 1 else 0.0
    sb = (mb.std(ddof=1) / np.sqrt(len(mb))) if len(mb) > 1 else 0.0
    sigma = float(np.sqrt(sa * sa + sb * sb))
    sigma = max(sigma, floor_frac * float(mb.mean()))
    z = abs(float(ma.mean()) - float(mb.mean())) / sigma
    return z, float(ma.mean()), float(mb.mean()), sigma


def assert_means_agree(runs_a, runs_b, z_max=4.0, floor_frac=0.01,
                       label=""):
    z, m_a, m_b, sigma = mean_z(runs_a, runs_b, floor_frac)
    assert z < z_max, (label, z, m_a, m_b, sigma)
