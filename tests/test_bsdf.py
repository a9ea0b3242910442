"""Microfacet BSDF tests: GGX sample/pdf consistency (chi-square),
energy sanity, and a rough-scene equal-transport A/B."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.bsdf import microfacet as mf
from alvrl_tpu.core import chisquare, math as m, rng


def test_ggx_d_normalized():
    """int D(m) cos dm over the hemisphere == 1."""
    for alpha in [0.1, 0.3, 0.6]:
        ct = np.linspace(1e-4, 1, 4001)
        mh = jnp.stack(
            [jnp.sqrt(1 - jnp.asarray(ct) ** 2), jnp.zeros(len(ct)), jnp.asarray(ct)],
            axis=-1,
        ).astype(jnp.float32)
        d = np.asarray(mf.ggx_d(mh, jnp.float32(alpha)))
        integral = 2 * np.pi * np.trapezoid(d * ct, ct)
        assert abs(integral - 1.0) < 5e-3, (alpha, integral)


def test_ggx_sample_pdf_chisquare():
    alpha = jnp.float32(0.35)
    f0 = jnp.array([0.9, 0.9, 0.9])
    wi = m.normalize(jnp.array([0.4, 0.1, 0.9]))

    def sample_fn(n):
        u = rng.uniform2(jax.random.key(3), (n,))
        wo, _, _ = mf.sample_rough_conductor(u, wi, alpha, f0)
        # below-horizon half-vector reflections are zero-weight invalid
        # samples (the reference rejects them the same way); the pdf is
        # zero there, so exclude them from the histogram
        return np.asarray(wo)[np.asarray(wo[:, 2]) > 0]

    def pdf_fn(dirs):
        d = jnp.asarray(dirs, jnp.float32)
        return mf.pdf_rough_conductor(jnp.broadcast_to(wi, d.shape), d, alpha)

    ok, p, info = chisquare.chi_square_test(
        sample_fn, pdf_fn, n_samples=60_000, significance=0.005
    )
    assert ok, (p, info)


def test_rough_conductor_white_furnace_bound():
    """Energy conservation: outgoing energy <= 1 for f0=1."""
    alpha = jnp.float32(0.4)
    f0 = jnp.ones(3)
    wi = m.normalize(jnp.array([0.3, 0.0, 0.95]))
    u = rng.uniform2(jax.random.key(4), (100_000,))
    _, w, _ = mf.sample_rough_conductor(u, wi, alpha, f0)
    e = float(jnp.mean(w[:, 0]))
    assert e <= 1.05, e
    assert e > 0.5  # most energy retained at moderate roughness


def test_rough_scene_ab():
    """VRL render vs oracle with a rough-conductor blocker."""
    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.integrators.vrl import integrator, tracer
    from alvrl_tpu.integrators.vrl.integrate import VRLConfig
    from alvrl_tpu.scene import presets
    from alvrl_tpu.scene.scene import ROUGH_CONDUCTOR

    scene = presets.cornell_smoke(width=6, height=6)
    mats = scene.materials.replace(
        kind=scene.materials.kind.at[3].set(ROUGH_CONDUCTOR),
        alpha=scene.materials.alpha.at[3].set(0.3),
    )
    scene = scene.replace(materials=mats)

    imgs = []
    for i in range(4):
        img, _ = integrator.render_unclustered(
            scene, jax.random.key(i), num_particles=192,
            cfg=VRLConfig(vrl_chunk=64),
            tracer_cfg=tracer.TracerConfig(max_depth=10), ray_tile=36,
        )
        imgs.append(np.asarray(img))
    v = np.mean(imgs, axis=0)
    o = np.asarray(
        volpath.render_volpath(
            scene, jax.random.key(9), spp=512,
            cfg=volpath.VolpathConfig(max_depth=10), ray_tile=36,
        )
    )
    assert np.isfinite(v).all() and np.isfinite(o).all()
    ratio = v.mean() / o.mean()
    assert 0.8 < ratio < 1.25, ratio
