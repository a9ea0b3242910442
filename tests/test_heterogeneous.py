"""Heterogeneous (grid) medium tests — counterpart of the semantics in
src/medium/heterogeneous.cpp + src/volume/gridvolume.cpp."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.media import api as mapi
from alvrl_tpu.media import heterogeneous as gmed


def _const_grid(value=1.0, sig=(0.5, 0.6, 0.7), alb=0.8):
    return gmed.make_grid_medium(
        jnp.full((4, 4, 4), value), list(sig), [alb] * 3
    )


def _blob_grid(n=16):
    z, y, x = jnp.meshgrid(
        *([jnp.linspace(-1, 1, n)] * 3), indexing="ij"
    )
    dens = jnp.exp(-3 * (x ** 2 + y ** 2 + z ** 2)) * 2.0
    return gmed.make_grid_medium(dens, [0.9] * 3, [0.9] * 3)


def test_trilinear_const():
    med = _const_grid(2.0)
    pts = jnp.array([[0.0, 0.0, 0.0], [0.3, -0.2, 0.7], [0.99, 0.99, 0.99]])
    d = gmed.lookup_density(med, pts)
    np.testing.assert_allclose(np.asarray(d), 2.0, rtol=1e-5)


def test_lookup_outside_zero():
    med = _const_grid(2.0)
    d = gmed.lookup_density(med, jnp.array([1.5, 0.0, 0.0]))
    assert float(d) == 0.0


def test_transmittance_matches_analytic_const():
    med = _const_grid(1.0)
    p0 = jnp.array([-0.9, 0.0, 0.0])
    p1 = jnp.array([0.9, 0.0, 0.0])
    tau = gmed.eval_transmittance(med, p0, p1)
    np.testing.assert_allclose(
        np.asarray(tau), np.exp(-np.array([0.5, 0.6, 0.7]) * 1.8), rtol=1e-5
    )


def test_woodcock_failure_prob():
    """P(no interaction over the segment) == exp(-int sigma_chan)."""
    med = _const_grid(1.0)
    chan = float(jnp.mean(med.sigma_t_color))
    o = jnp.array([-0.9, 0.0, 0.0])
    d = jnp.array([1.0, 0.0, 0.0])
    dist = 1.8
    n = 20000
    keys = jax.random.split(jax.random.key(0), n)
    ms = jax.vmap(
        lambda k: gmed.sample_distance(med, k, o, d, jnp.float32(dist))
    )(keys)
    p_fail = float((~ms.success).mean())
    expected = np.exp(-chan * dist)
    assert abs(p_fail - expected) < 0.01, (p_fail, expected)


def test_distance_sample_weight_unbiased():
    """E[1{fail} * w_pass] == tau (spectral) for a const grid."""
    med = _const_grid(1.0)
    o = jnp.array([-0.9, 0.0, 0.0])
    d = jnp.array([1.0, 0.0, 0.0])
    dist = jnp.float32(1.5)
    n = 40000
    keys = jax.random.split(jax.random.key(1), n)
    ds = jax.vmap(
        lambda k: mapi.sample_distance_seg(med, k, o, d, dist)
    )(keys)
    est = np.asarray(jnp.mean(ds.w_pass, axis=0))
    expected = np.exp(-np.array([0.5, 0.6, 0.7]) * 1.5)
    np.testing.assert_allclose(est, expected, rtol=0.03)


def test_density_gradients_flow():
    med = _blob_grid(8)

    def loss(density):
        m2 = med.replace(density=density)
        tau = gmed.eval_transmittance(
            m2, jnp.array([-0.9, 0.0, 0.0]), jnp.array([0.9, 0.0, 0.0])
        )
        return jnp.sum(tau)

    g = jax.grad(loss)(med.density)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_hetero_vrl_vs_oracle():
    """Grid-medium equal-transport A/B (small, statistical)."""
    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.integrators.vrl import integrator, tracer
    from alvrl_tpu.integrators.vrl.integrate import VRLConfig
    from alvrl_tpu.scene import presets

    scene = presets.cornell_smoke(width=6, height=6).replace(medium=_blob_grid(8))
    imgs = []
    for i in range(4):
        img, _ = integrator.render_unclustered(
            scene, jax.random.key(i), num_particles=128,
            cfg=VRLConfig(vrl_chunk=64),
            tracer_cfg=tracer.TracerConfig(max_depth=10), ray_tile=36,
        )
        imgs.append(np.asarray(img))
    vrl_img = np.mean(imgs, axis=0)
    o_img = np.asarray(
        volpath.render_volpath(
            scene, jax.random.key(50), spp=384,
            cfg=volpath.VolpathConfig(max_depth=10), ray_tile=36,
        )
    )
    assert np.isfinite(vrl_img).all() and np.isfinite(o_img).all()
    ratio = vrl_img.mean() / max(o_img.mean(), 1e-9)
    assert 0.8 < ratio < 1.25, ratio


def test_fast_tau_matches_trilinear():
    """The 2x-supersampled nearest-neighbor quadrature (fast_tau) must
    track exact trilinear optical depth to <1% mean relative error on a
    smooth plume, and the supersample must be exact at grid nodes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alvrl_tpu.media import heterogeneous as gmed

    r = np.random.RandomState(3)
    z, y, x = np.meshgrid(np.linspace(-1, 1, 24), np.linspace(-1, 1, 24),
                          np.linspace(-1, 1, 24), indexing="ij")
    dens = np.exp(-3.0 * (x ** 2 + y ** 2 + z ** 2)).astype(np.float32)
    dens += 0.1 * r.rand(24, 24, 24).astype(np.float32)
    med_fast = gmed.make_grid_medium(dens, [1.0] * 3, [0.9] * 3)
    med_exact = med_fast.replace(fast_tau=False)

    # supersample exact at original nodes
    ss = np.asarray(med_fast.density_ss)
    assert np.allclose(ss[::2, ::2, ::2], dens, atol=1e-6)

    p0 = jnp.asarray(r.uniform(-0.9, 0.9, (256, 3)), jnp.float32)
    p1 = jnp.asarray(r.uniform(-0.9, 0.9, (256, 3)), jnp.float32)
    od_f = np.asarray(jax.vmap(
        lambda a, b: gmed.optical_depth(med_fast, a, b, n_steps=16)
    )(p0, p1))
    od_e = np.asarray(jax.vmap(
        lambda a, b: gmed.optical_depth(med_exact, a, b, n_steps=16)
    )(p0, p1))
    rel = np.abs(od_f - od_e) / np.maximum(od_e, 1e-3)
    assert rel.mean() < 0.01, rel.mean()
    # worst case on the noisy component of the field stays bounded
    assert rel.max() < 0.10, rel.max()
