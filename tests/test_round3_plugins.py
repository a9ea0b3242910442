"""Round-3 plugin-gap tests: mixture phase, collimated emitter, RGBE
.hdr I/O, the Beam Radiance Estimate, and the grid-medium cache
invalidation fix."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import chisquare, rng
from alvrl_tpu.emitters import emitters as em_mod
from alvrl_tpu.io import hdr as hdr_io
from alvrl_tpu.media import heterogeneous as gmed
from alvrl_tpu.media import phase as ph


# ---------------- mixture phase ----------------

def _mix():
    return ph.mixture_params(
        weights=[0.4, 0.35, 0.25],
        kinds=[ph.HG, ph.RAYLEIGH, ph.HG],
        gs=[0.7, 0.0, -0.3],
    )


def test_mixture_eval_normalized():
    """The mixture lobe must integrate to 1 over the sphere (each
    component does and the weights are a pmf)."""
    pp = _mix()
    wi = jnp.array([0.0, 0.0, 1.0])
    n = 200_000
    u = rng.uniform2(jax.random.key(0), (n,))
    from alvrl_tpu.core import warp

    wo = warp.square_to_uniform_sphere(u)
    vals = np.asarray(ph.eval_mixture(pp, wi, wo))
    integral = vals.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.01, integral


def test_mixture_eval_is_weighted_sum():
    pp = _mix()
    wi = jnp.array([0.0, 0.0, 1.0])
    wo = jnp.asarray(np.random.default_rng(1).normal(size=(64, 3)))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    manual = (
        0.4 * ph.eval_hg(jnp.float32(0.7), wi, wo)
        + 0.35 * ph.eval_rayleigh(wi, wo)
        + 0.25 * ph.eval_hg(jnp.float32(-0.3), wi, wo)
    )
    np.testing.assert_allclose(
        np.asarray(ph.eval_mixture(pp, wi, wo)), np.asarray(manual),
        rtol=1e-5,
    )


def test_mixture_chisquare():
    """sample_mixture must follow pdf_mixture (GOF over the sphere)."""
    pp = _mix()
    wi = jnp.array([0.0, 0.0, 1.0])

    def sample_fn(n):
        u = rng.uniform2(jax.random.key(7), (n,))
        wo, _, _ = ph.sample_mixture(pp, wi, u)
        return wo

    def pdf_fn(dirs):
        return ph.pdf_mixture(pp, wi, jnp.asarray(dirs, jnp.float32))

    ok, p, _ = chisquare.chi_square_test(sample_fn, pdf_fn, n_samples=80_000)
    assert ok, p


def test_mixture_weight_rescale():
    """Weights summing beyond one are rescaled (energy conservation,
    mixturephase.cpp:101-113)."""
    pp = ph.mixture_params([2.0, 2.0], [ph.HG, ph.HG], [0.0, 0.5])
    np.testing.assert_allclose(np.asarray(pp.mix_w), [0.5, 0.5], atol=1e-6)


def test_mixture_absorbing_weights():
    """ADVICE r03 item 2: a mixture with weights summing to s < 1 is a
    valid ENERGY-ABSORBING phase — the reference keeps the raw weights
    for eval (mixturephase.cpp:119-126, rescale only when s > 1), so
    the lobe integrates to s, sample() returns weight s (eval/pdf),
    and the sampling pdf still integrates to 1."""
    pp = ph.mixture_params([0.3, 0.3], [ph.HG, ph.RAYLEIGH], [0.5, 0.0])
    s = 0.6
    np.testing.assert_allclose(np.asarray(pp.mix_w), [0.3, 0.3],
                               atol=1e-6)
    wi = jnp.array([0.0, 0.0, 1.0])
    n = 200_000
    u = rng.uniform2(jax.random.key(2), (n,))
    from alvrl_tpu.core import warp

    wo = warp.square_to_uniform_sphere(u)
    ev = np.asarray(ph.eval_mixture(pp, wi, wo)).mean() * 4.0 * np.pi
    assert abs(ev - s) < 0.01, ev
    pdf_int = np.asarray(ph.pdf_mixture(pp, wi, wo)).mean() * 4.0 * np.pi
    assert abs(pdf_int - 1.0) < 0.02, pdf_int
    _, w_s, _ = ph.sample_mixture(pp, wi, rng.uniform2(
        jax.random.key(3), (64,)))
    np.testing.assert_allclose(np.asarray(w_s), s, atol=1e-5)


def test_mixture_dispatch():
    pp = _mix()
    wi = jnp.array([0.0, 0.0, 1.0])
    wo = jnp.array([1.0, 0.0, 0.0])
    v1 = ph.eval_phase(ph.MIXTURE, 0.0, wi, wo, pp=pp)
    np.testing.assert_allclose(
        np.asarray(v1), np.asarray(ph.eval_mixture(pp, wi, wo)), rtol=1e-6
    )
    wo_s, w_s, pdf_s = ph.sample_phase(
        ph.MIXTURE, 0.0, wi, rng.uniform2(jax.random.key(3), (16,)), pp=pp
    )
    assert np.asarray(w_s).shape == (16,)
    np.testing.assert_allclose(np.asarray(w_s), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pdf_s),
        np.asarray(ph.pdf_mixture(pp, wi, wo_s)), rtol=1e-5,
    )


# ---------------- collimated emitter ----------------

def test_collimated_emission():
    em = em_mod.make_emitters(
        kinds=[em_mod.COLLIMATED],
        positions=[[1.0, 2.0, 3.0]],
        intensities=[[5.0, 6.0, 7.0]],
        directions=[[0.0, 1.0, 0.0]],
    )
    pos, d, w = em_mod.sample_emission(
        em, jax.random.key(0), jnp.zeros(3), jnp.float32(10.0)
    )
    np.testing.assert_allclose(np.asarray(pos), [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), [5.0, 6.0, 7.0], atol=1e-5)


def test_collimated_nee_is_zero():
    """Direct sampling of a 0D response always fails
    (collimated.cpp:128-132)."""
    em = em_mod.make_emitters(
        kinds=[em_mod.COLLIMATED],
        positions=[[0.0, 0.0, 0.0]],
        intensities=[[1.0, 1.0, 1.0]],
        directions=[[0.0, 0.0, 1.0]],
    )
    _, v, _ = em_mod.nee(em, jax.random.key(1), jnp.ones(3), jnp.float32(5.0))
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=0.0)


def test_collimated_loader():
    from alvrl_tpu.scene import loader

    scene = loader.build_scene({
        "camera": {"origin": [0, 0, -1], "target": [0, 0, 1],
                   "width": 8, "height": 8},
        "shapes": [{"type": "cube", "min": [-2, -2, -2], "max": [2, 2, 2],
                    "bsdf": {"type": "diffuse"}}],
        "emitters": [{"type": "collimated", "position": [0, 0, 0],
                      "power": [2.0, 2.0, 2.0],
                      "direction": [0, 0, 1]}],
        "medium": {"type": "homogeneous", "sigma_a": [0.1] * 3,
                   "sigma_s": [0.5] * 3,
                   "phase": {"type": "mixture", "components": [
                       {"type": "hg", "g": 0.6, "weight": 0.5},
                       {"type": "rayleigh", "weight": 0.5}]}},
    })
    assert int(scene.emitters.kind[0]) == em_mod.COLLIMATED
    np.testing.assert_allclose(
        np.asarray(scene.emitters.intensity[0]), 2.0, atol=1e-6)
    assert scene.medium.phase_kind == ph.MIXTURE
    np.testing.assert_allclose(
        np.asarray(scene.medium.phase_params.mix_w), [0.5, 0.5], atol=1e-6)


# ---------------- RGBE .hdr ----------------

def test_hdr_roundtrip(tmp_path):
    rg = np.random.default_rng(0)
    img = (rg.uniform(0.0, 1.0, (24, 33, 3)).astype(np.float32)
           * np.float32(10.0) ** rg.integers(-3, 4, (24, 33, 1)))
    path = str(tmp_path / "t.hdr")
    hdr_io.write_hdr(path, img)
    back = hdr_io.read_hdr(path)
    assert back.shape == img.shape
    # 8-bit shared-exponent mantissa: abs error <= vmax/128 per pixel
    vmax = img.max(axis=-1, keepdims=True)
    assert np.all(np.abs(back - img) <= vmax / 128.0 + 1e-7)


def test_hdr_rle_runs(tmp_path):
    """Constant rows exercise the RLE runs in both directions; zeros
    map to exponent 0."""
    img = np.zeros((4, 640, 3), np.float32)
    img[1] = 3.25
    img[2, ::7] = [1.0, 2.0, 4.0]
    path = str(tmp_path / "runs.hdr")
    hdr_io.write_hdr(path, img)
    back = hdr_io.read_hdr(path)
    np.testing.assert_allclose(back[0], 0.0, atol=0.0)
    assert np.all(np.abs(back - img) <= img.max() / 128.0 + 1e-7)


def test_hdr_flat_fallback(tmp_path):
    """Width < 8 falls back to flat scanlines."""
    img = np.random.default_rng(1).uniform(0, 2, (5, 6, 3)).astype(np.float32)
    path = str(tmp_path / "flat.hdr")
    hdr_io.write_hdr(path, img)
    back = hdr_io.read_hdr(path)
    vmax = img.max(axis=-1, keepdims=True)
    assert np.all(np.abs(back - img) <= vmax / 128.0 + 1e-7)


# ---------------- beam radiance estimate ----------------

def test_bre_radii_scale_with_density():
    """Photon radius must shrink where photons are dense."""
    from alvrl_tpu.integrators import photonmap as pmap

    rg = np.random.default_rng(2)
    dense = rg.uniform(0, 0.2, (256, 3))
    sparse = rg.uniform(0, 2.0, (256, 3)) + np.array([5.0, 0, 0])
    pos = np.concatenate([dense, sparse]).astype(np.float32)
    pm = pmap.PhotonMap(
        s_pos=jnp.zeros((1, 3)), s_wi=jnp.zeros((1, 3)),
        s_power=jnp.zeros((1, 3)), s_valid=jnp.zeros(1, bool),
        v_pos=jnp.asarray(pos),
        v_wi=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (512, 1)),
        v_power=jnp.ones((512, 3)),
        v_valid=jnp.ones(512, bool),
        n_emitted=jnp.float32(512),
    )
    r = np.asarray(pmap.bre_radii(pm, lookup_size=64))
    assert r.shape == (512,)
    assert np.all(r > 0)
    assert r[:256].mean() < 0.5 * r[256:].mean()


def test_bre_matches_march_estimate():
    """The BRE along camera rays must statistically agree with the
    march-based volume estimate (same photon map, same medium) — they
    estimate the same beam integral with different kernels."""
    from alvrl_tpu.integrators import photonmap as pmap
    from alvrl_tpu.scene import presets

    scene = presets.cornell_smoke(width=12, height=12)
    pm = pmap.trace_photons(scene, jax.random.key(0), 512)
    img_bre = np.asarray(
        pmap.render_photonmap_bre(
            scene, pm, jax.random.key(1), jnp.float32(0.25),
            lookup_size=64,
        )
    )
    img_march = np.asarray(
        pmap.render_photonmap(
            scene, pm, jax.random.key(1), jnp.float32(0.25),
            jnp.float32(0.25), march_steps=32,
        )
    )
    assert np.all(np.isfinite(img_bre))
    assert img_bre.mean() > 0
    ratio = img_bre.mean() / max(img_march.mean(), 1e-9)
    assert 0.5 < ratio < 2.0, ratio


# ---------------- grid-medium cache invalidation ----------------

def _tiny_medium():
    rg = np.random.default_rng(3)
    density = rg.uniform(0.2, 1.0, (5, 5, 5)).astype(np.float32)
    return gmed.make_grid_medium(
        density, sigma_t_color=[1.0, 1.0, 1.0], albedo=[0.8, 0.8, 0.8],
    )


def test_with_cache_recomputes_on_density_replace():
    med = gmed.with_cache(_tiny_medium())
    med2 = gmed.with_cache(med.replace(density=med.density * 2.0))
    np.testing.assert_allclose(
        np.asarray(med2.density_ss_cache),
        2.0 * np.asarray(med.density_ss_cache), rtol=1e-6,
    )


def test_prepared_medium_density_gradient_nonzero():
    """The ADVICE round-2 trap: grad w.r.t. density must survive a
    prepare -> replace(density) -> prepare sequence."""
    med = gmed.with_cache(_tiny_medium())
    p0 = jnp.array([-0.5, -0.5, -0.5])
    p1 = jnp.array([0.5, 0.5, 0.5])

    def loss(d):
        m2 = gmed.with_cache(med.replace(density=d))
        return gmed.optical_depth(m2, p0, p1)

    g = np.asarray(jax.grad(loss)(med.density))
    assert np.abs(g).sum() > 0.0
