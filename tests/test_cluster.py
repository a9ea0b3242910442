"""Adaptive LightSlice clustering tests (Preprocessor.cpp counterparts).

The key invariants:
  * slicing covers every valid pixel and respects the target count;
  * the closed-form cluster variance equals the definitional variance of
    the one-sample estimator (validating our replacement of the
    incremental recurrence of calculateClusterVariance);
  * representative sampling is unbiased: E[weight * column] = cluster sum;
  * adaptive refinement never increases the convergence constant vs the
    unrefined state.
"""

import numpy as np

from alvrl_tpu.integrators.vrl import cluster as cl


def _toy_matrix(rng, p=6, n=20):
    mean = rng.random((p, n)) ** 2
    var = 0.1 * rng.random((p, n)) ** 2
    return mean, var


def test_build_slices_cover():
    rng = np.random.default_rng(0)
    n = 500
    pos = rng.random((n, 3))
    dirs = rng.random((n, 3)) * 0.1
    valid = rng.random(n) > 0.1
    slices = cl.build_slices(pos, dirs, valid, 32)
    assert len(slices.members) >= 32 or sum(len(m) for m in slices.members) == valid.sum()
    covered = np.concatenate(slices.members)
    assert sorted(covered) == sorted(np.nonzero(valid)[0])
    for s, idx in enumerate(slices.members):
        assert (slices.pixel_to_slice[idx] == s).all()
    assert (slices.pixel_to_slice[~valid] == cl.UINT32_MAX).all()


def test_cluster_variance_closed_form():
    """W * sum(x^2/w) - (sum x)^2 must equal the definitional variance of
    the estimator x_I / p_I with p_i = w_i / W."""
    rng = np.random.default_rng(1)
    mean, var = _toy_matrix(rng)
    p, n = mean.shape
    loc = np.full(p, 1.0 / p)
    c = cl.Clustering([np.arange(n)], mean, var, loc, 0.5, rng=rng)
    (_, _, node), = c.pq
    # definitional check per gather row
    cols = c.order[node.begin:node.end]
    w = c.col_w[cols]
    W = w.sum()
    x = mean[:, cols]
    est_var = np.zeros(p)
    for i in range(len(cols)):
        pi = w[i] / W
        est_var += pi * (x[:, i] / pi - x.sum(axis=1)) ** 2
    expected = loc @ est_var
    assert abs(node.uvar - expected) / max(expected, 1e-12) < 1e-8


def test_prefix_variance_matches_range():
    rng = np.random.default_rng(2)
    mean, var = _toy_matrix(rng)
    p, n = mean.shape
    loc = np.full(p, 1.0 / p)
    c = cl.Clustering([np.arange(n)], mean, var, loc, 0.5, rng=rng)
    cols = c.order[:n]
    u_pre, i_pre = c._prefix_variances(cols)
    for k in [1, 3, n]:
        u, i = c._range_variance(0, k)
        np.testing.assert_allclose(u_pre[k - 1], u, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(i_pre[k - 1], i, rtol=1e-8, atol=1e-12)


def test_representative_unbiased():
    """Averaging weight * mean-column over many representative draws
    reproduces the cluster's summed column (sampleRepresentatives
    semantics: weight = 1/prob)."""
    rng = np.random.default_rng(3)
    mean, var = _toy_matrix(rng, p=4, n=10)
    loc = np.full(4, 0.25)
    total = np.zeros(4)
    draws = 4000
    c = cl.Clustering([np.arange(10)], mean, var, loc, 0.5, rng=rng)
    for _ in range(draws):
        ids, ws = c.sample_representatives()
        total += sum(w * mean[:, i] for i, w in zip(ids, ws))
    est = total / draws
    expected = mean.sum(axis=1)
    np.testing.assert_allclose(est, expected, rtol=0.05)


def test_adaptive_refinement_improves():
    rng = np.random.default_rng(4)
    mean, var = _toy_matrix(rng, p=8, n=64)
    loc = np.full(8, 1.0 / 8)
    c = cl.Clustering([np.arange(64)], mean, var, loc, 0.25, rng=rng)
    before = c.convergence_constant()
    assert c.refine(-1.0)
    after = c.convergence_constant()
    assert after <= before + 1e-12
    assert c.num_clusters() >= 1


def test_fixed_depth_refinement():
    rng = np.random.default_rng(5)
    mean, var = _toy_matrix(rng, p=4, n=32)
    loc = np.full(4, 0.25)
    c = cl.Clustering([np.arange(32)], mean, var, loc, 0.5, rng=rng)
    c.refine(4.0)  # 1-in-4 undersampling -> ~8 clusters
    assert c.num_clusters() >= 8


def test_zero_columns_quarantined():
    rng = np.random.default_rng(6)
    mean, var = _toy_matrix(rng, p=4, n=12)
    mean[:, 5] = 0.0
    mean[:, 7] = 0.0
    rows = [np.arange(2), np.arange(2, 4)]
    ids, ws, fb_ids, fb_w, gc_ids, gc_w = cl.build_clusters(
        mean, var, rows, np.array([1.0, 1.0]), 1.0,
        [[], []], cl.ClusterParams(local_undersampling=-1.0), rng,
    )
    assert len(ids) == 2
    for i, w in zip(ids, ws):
        assert len(i) == len(w)
    # every vrl appears in some cluster structure; weights positive
    assert all((w > 0).all() for w in ws)
