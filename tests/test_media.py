"""Medium + phase function tests.

Statistical sampling consistency in the spirit of the reference's
chi-square harness (include/mitsuba/core/chisquare.h) and of the
pdfSuccess/pdfFailure conventions of homogeneous.cpp:275-396.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import math as m
from alvrl_tpu.core import rng
from alvrl_tpu.media import homogeneous as hmed
from alvrl_tpu.media import phase as ph


def _medium():
    return hmed.make_medium([0.1, 0.15, 0.2], [0.6, 0.5, 0.4], g=0.0)


def test_transmittance():
    med = _medium()
    tau = hmed.eval_transmittance(med, jnp.float32(2.0))
    np.testing.assert_allclose(
        np.asarray(tau), np.exp(-np.asarray(med.sigma_t) * 2.0), rtol=1e-5
    )


def test_sample_distance_failure_unbiased():
    """E[ 1{fail} / pdf_failure ] == 1 (the estimator identity the VRL
    tracer relies on for the surface branch, vrlTracer.h:176-177)."""
    med = _medium()
    n = 200_000
    keys = jax.random.split(jax.random.key(0), n)
    dist = jnp.full((n,), 1.5)
    ms = jax.vmap(lambda k, d: hmed.sample_distance(med, k, d))(keys, dist)
    est = np.asarray(jnp.where(~ms.success, 1.0 / ms.pdf_failure, 0.0))
    assert abs(est.mean() - 1.0) < 0.01


def test_sample_distance_success_unbiased():
    """E[ 1{success} sigma_t(t) tau(t) / pdf_success ] == 1 - tau(D)
    channel-wise (free-flight pdf integrates to the collision prob)."""
    med = _medium()
    n = 400_000
    keys = jax.random.split(jax.random.key(1), n)
    d_max = 1.5
    dist = jnp.full((n,), d_max)
    ms = jax.vmap(lambda k, d: hmed.sample_distance(med, k, d))(keys, dist)
    sig_t = med.sigma_t
    f = sig_t * jnp.exp(-sig_t * ms.t[..., None])
    est = jnp.where(
        ms.success[..., None], f / ms.pdf_success[..., None], 0.0
    )
    expected = 1.0 - np.exp(-np.asarray(sig_t) * d_max)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(est, axis=0)), expected, rtol=0.02
    )


def test_hg_eval_normalized():
    """Integral of HG over the sphere == 1 (hg.cpp eval)."""
    for g in [0.0, 0.3, 0.8, -0.5]:
        mu = np.linspace(-1, 1, 20001)
        wi = jnp.array([0.0, 0.0, 1.0])
        wo = jnp.stack(
            [jnp.sqrt(1 - jnp.asarray(mu) ** 2), jnp.zeros_like(jnp.asarray(mu)), jnp.asarray(mu)],
            axis=-1,
        ).astype(jnp.float32)
        vals = np.asarray(ph.eval_hg(jnp.float32(g), wi, wo))
        integral = 2 * np.pi * np.trapezoid(vals, mu)
        assert abs(integral - 1.0) < 2e-3, (g, integral)


def test_hg_sample_matches_eval():
    """Histogram of sampled cos(wi,wo) vs analytic HG pdf — the
    chi-square-style sample()/pdf() consistency check (test strategy
    SURVEY §4 / chisquare.h)."""
    g = 0.7
    n = 300_000
    wi = jnp.array([0.0, 0.0, 1.0])
    u = rng.uniform2(jax.random.key(2), (n,))
    wo, w, _ = ph.sample_hg(jnp.float32(g), wi, u)
    np.testing.assert_allclose(np.asarray(w), 1.0)
    cos = np.asarray(m.dot(-wi, wo))  # angle relative to propagation dir
    hist, edges = np.histogram(cos, bins=50, range=(-1, 1), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    # marginal pdf of mu (= cos between propagation dir -wi and wo):
    # p(mu) = 0.5 (1-g^2) / (1 + g^2 - 2 g mu)^{3/2}
    temp = 1 + g * g - 2 * g * centers
    analytic = 0.5 * (1 - g * g) / temp ** 1.5
    np.testing.assert_allclose(hist, analytic, rtol=0.1, atol=0.02)


def test_eval_ray_pdf_mixture():
    """pdfFailure includes the (1 - samplingWeight) no-interaction mass
    (homogeneous.cpp:388-389)."""
    med = _medium()
    _, pdf_s, pdf_f = hmed.eval_ray(med, jnp.float32(1.0))
    w = float(med.sampling_weight)
    e = np.exp(-np.asarray(med.sigma_t) * 1.0)
    exp_fail = w * e.mean() + (1 - w)
    assert abs(float(pdf_f) - exp_fail) < 1e-5
    exp_succ = w * (np.asarray(med.sigma_t) * e).mean()
    assert abs(float(pdf_s) - exp_succ) < 1e-5


def test_medium_gradients():
    """Transmittance is differentiable w.r.t. sigma coefficients."""

    def loss(sa):
        med = hmed.HomogeneousMedium(
            sigma_a=sa,
            sigma_s=jnp.array([0.5, 0.5, 0.5]),
            g=jnp.float32(0.0),
            sampling_weight=jnp.float32(0.8),
        )
        return jnp.sum(hmed.eval_transmittance(med, jnp.float32(2.0)))

    sa = jnp.array([0.1, 0.2, 0.3])
    g = jax.grad(loss)(sa)
    expected = -2.0 * np.exp(-np.asarray(sa + 0.5) * 2.0)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4)


def test_sampling_strategy_identities():
    """Every distance-sampling strategy (balance/single/manual/maximum,
    homogeneous.cpp:149-226) must satisfy the estimator identities:
    E[1{fail}/pdfFailure] = 1 over the pass branch and
    E[1{success} * tau*sigma_s/pdfSuccess] = integral tau sigma_s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alvrl_tpu.media import homogeneous as hm

    sigma_a = [0.08, 0.05, 0.02]
    sigma_s = [0.5, 0.7, 0.3]
    dist = jnp.float32(2.0)
    n = 60000
    for kw in [dict(strategy=hm.BALANCE), dict(strategy=hm.SINGLE, channel=1),
               dict(strategy=hm.MANUAL, density=0.9),
               dict(strategy=hm.MAXIMUM)]:
        med = hm.make_medium(sigma_a, sigma_s, **kw)
        keys = jax.random.split(jax.random.key(7), n)
        ms = jax.vmap(lambda k: hm.sample_distance(med, k, dist))(keys)
        # pass identity
        est_fail = np.asarray(
            jnp.where(~ms.success, 1.0 / jnp.maximum(ms.pdf_failure, 1e-30),
                      0.0)
        ).mean()
        assert abs(est_fail - 1.0) < 0.02, (kw, est_fail)
        # scatter identity: E[tau*sigma_s/pdfSuccess over successes]
        # = integral_0^dist tau(t) sigma_s dt (per channel)
        w = np.asarray(
            jnp.where(ms.success[:, None],
                      ms.transmittance * med.sigma_s
                      / jnp.maximum(ms.pdf_success, 1e-30)[:, None], 0.0)
        ).mean(axis=0)
        st = np.asarray(med.sigma_t)
        ref = np.asarray(med.sigma_s) / st * (1.0 - np.exp(-st * 2.0))
        assert np.allclose(w, ref, rtol=0.03), (kw, w, ref)
