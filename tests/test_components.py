"""Tests for framework components: filters, QMC, chi-square harness,
emitters, sensors, image I/O, stats."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.core import chisquare, qmc, rng, warp
from alvrl_tpu.core.stats import STATS
from alvrl_tpu.emitters import emitters as em_mod
from alvrl_tpu.film import filters
from alvrl_tpu.io import image as image_io
from alvrl_tpu.media import phase as ph
from alvrl_tpu.scene import presets
from alvrl_tpu.scene.scene import ORTHOGRAPHIC, SPHERICAL, THINLENS
from alvrl_tpu.sensors import perspective


# ---------------- filters ----------------

def test_filters_normalized_splat():
    """A constant field splatted through any filter and developed must
    stay constant (filter weights cancel)."""
    for name in [filters.BOX, filters.TENT, filters.GAUSSIAN,
                 filters.MITCHELL, filters.CATMULLROM]:
        fx = jnp.asarray(np.random.default_rng(0).uniform(4, 12, 500), jnp.float32)
        fy = jnp.asarray(np.random.default_rng(1).uniform(4, 12, 500), jnp.float32)
        vals = jnp.ones((500, 3))
        img, wgt = filters.splat(16, 16, fx, fy, vals, name)
        from alvrl_tpu.film.film import develop

        out = develop(img, wgt)
        interior = np.asarray(out)[6:10, 6:10]
        np.testing.assert_allclose(interior, 1.0, atol=1e-5)


def test_filter_kernels_sane():
    x = jnp.linspace(-3, 3, 101)
    for name, r in filters.RADII.items():
        v = np.asarray(filters.eval_filter(name, x))
        assert v[np.abs(np.asarray(x)) > r + 1e-3].max(initial=0.0) <= 1e-6
        assert v.max() > 0


# ---------------- qmc ----------------

def test_radical_inverse():
    # base 2: 1 -> 0.5, 2 -> 0.25, 3 -> 0.75
    v = np.asarray(qmc.radical_inverse(2, jnp.array([1, 2, 3])))
    np.testing.assert_allclose(v, [0.5, 0.25, 0.75], atol=1e-7)


def test_halton_uniform():
    pts = np.asarray(qmc.halton(4096, 2))
    assert pts.shape == (4096, 2)
    assert abs(pts.mean() - 0.5) < 0.01
    # star-discrepancy proxy: counts in quadrants are balanced
    q = ((pts[:, 0] > 0.5).astype(int) * 2 + (pts[:, 1] > 0.5)).astype(int)
    counts = np.bincount(q, minlength=4)
    assert counts.std() / counts.mean() < 0.02


def test_sobol_stratified():
    pts = np.asarray(qmc.sobol2d(1024))
    assert abs(pts[:, 0].mean() - 0.5) < 0.01
    assert abs(pts[:, 1].mean() - 0.5) < 0.01
    s = np.asarray(qmc.stratified2d(jax.random.key(0), 8, 8))
    assert s.shape == (64, 2)
    assert (s >= 0).all() and (s < 1).all()


def test_faure_net_property():
    # (0, s)-net in base 3: each 1D projection of the first 27 points
    # hits every width-1/27 bin exactly once (faure.cpp semantics)
    pts = np.asarray(qmc.faure(27, dims=3))
    assert pts.shape == (27, 3)
    for d in range(3):
        bins = np.floor(pts[:, d] * 27).astype(int)
        assert len(set(bins.tolist())) == 27
    # offset continuation stays consistent with a longer run
    tail = np.asarray(qmc.faure(10, dims=3, offset=17))
    full = np.asarray(qmc.faure(27, dims=3))
    np.testing.assert_allclose(tail, full[17:], atol=1e-7)


def test_ld2d_is_02_sequence():
    pts = np.asarray(qmc.ld2d(64))
    for d in range(2):
        bins = np.floor(pts[:, d] * 64).astype(int)
        assert len(set(bins.tolist())) == 64


# ---------------- chi-square harness ----------------

def test_chisquare_accepts_correct_sampler():
    g = jnp.float32(0.6)
    wi = jnp.array([0.0, 0.0, 1.0])

    def sample_fn(n):
        u = rng.uniform2(jax.random.key(5), (n,))
        wo, _, _ = ph.sample_hg(g, wi, u)
        return wo

    def pdf_fn(dirs):
        return ph.eval_hg(g, wi, jnp.asarray(dirs, jnp.float32))

    ok, p, _ = chisquare.chi_square_test(sample_fn, pdf_fn, n_samples=80_000)
    assert ok, p


def test_chisquare_rejects_wrong_pdf():
    wi = jnp.array([0.0, 0.0, 1.0])

    def sample_fn(n):
        u = rng.uniform2(jax.random.key(6), (n,))
        wo, _, _ = ph.sample_hg(jnp.float32(0.8), wi, u)
        return wo

    def pdf_fn(dirs):  # claims isotropic
        return jnp.full((dirs.shape[0],), 1.0 / (4 * np.pi))

    ok, p, _ = chisquare.chi_square_test(sample_fn, pdf_fn, n_samples=80_000)
    assert not ok


# ---------------- emitters ----------------

def test_spot_emission_energy():
    """Integral of sampled spot weights over many draws equals the
    emitted power within the cone."""
    em = em_mod.make_emitters(
        [em_mod.SPOT], [[0, 0, 0]], [[1.0, 1.0, 1.0]],
        directions=[[0, 0, 1]], cutoff_deg=[30.0], beam_deg=[20.0],
    )
    n = 20000
    keys = jax.random.split(jax.random.key(0), n)
    center = jnp.zeros(3)
    _, d, w = jax.vmap(
        lambda k: em_mod.sample_emission(em, k, center, jnp.float32(1.0))
    )(keys)
    # all directions inside the cutoff cone
    cosd = np.asarray(d[:, 2])
    assert (cosd >= np.cos(np.deg2rad(30.0)) - 1e-4).all()
    # emitted power: I * int falloff dOmega — compare MC vs quadrature
    mc = float(jnp.mean(w[:, 0]))
    mu = np.linspace(np.cos(np.deg2rad(30.0)), 1.0, 20001)
    cc, cb = np.cos(np.deg2rad(30.0)), np.cos(np.deg2rad(20.0))
    falloff = np.clip((mu - cc) / (cb - cc), 0, 1)
    power = 2 * np.pi * np.trapezoid(falloff, mu)
    assert abs(mc - power) / power < 0.02


def test_nee_kinds_finite():
    for kind, kwargs in [
        (em_mod.POINT, {}),
        (em_mod.SPOT, dict(directions=[[0, -1, 0]], cutoff_deg=[40.0], beam_deg=[30.0])),
        (em_mod.DIRECTIONAL, dict(directions=[[0, -1, 0]])),
    ]:
        em = em_mod.make_emitters([kind], [[0, 0.9, 0]], [[2.0, 2.0, 2.0]], **kwargs)
        d, v, dist = em_mod.nee(em, jax.random.key(1), jnp.zeros(3), jnp.float32(2.0))
        assert bool(jnp.all(jnp.isfinite(d)))
        assert bool(jnp.all(jnp.isfinite(v)))
        assert float(dist) > 0


# ---------------- sensors ----------------

def test_sensor_kinds_ray_gen():
    scene = presets.cornell_smoke(width=8, height=8)
    base = scene.camera
    px, py = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
    px, py = px.reshape(-1), py.reshape(-1)
    for kind in [THINLENS, ORTHOGRAPHIC, SPHERICAL]:
        cam = type(base)(
            to_world=base.to_world, fov_x_deg=base.fov_x_deg,
            aperture_radius=0.05, focus_distance=1.5, ortho_scale=0.9,
            width=8, height=8, kind=kind,
        )
        o, d = perspective.sample_ray(cam, px, py)
        assert o.shape == (64, 3) and d.shape == (64, 3)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5
        )


def test_sample_position_roundtrip():
    scene = presets.cornell_smoke(width=16, height=16)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(16))
    px, py = px.reshape(-1), py.reshape(-1)
    _, d = perspective.sample_ray(cam, px, py)
    x, y = perspective.sample_position(cam, d)
    np.testing.assert_allclose(np.asarray(x), np.asarray(px) + 0.5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(py) + 0.5, atol=1e-2)


# ---------------- image io ----------------

def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    image_io.write_pfm(p, img)
    back = image_io.read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_png_written(tmp_path):
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    image_io.write_png(p, img)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_rms_utils():
    a = np.ones((4, 4, 3))
    b = np.zeros((4, 4, 3))
    assert abs(image_io.rms(a, b) - 1.0) < 1e-9
    s = image_io.add_images([a, b], [0.5, 0.5])
    np.testing.assert_allclose(s, 0.5)
    j = image_io.join_rgb(a, b, a)
    assert j.shape == (4, 4, 3)
    np.testing.assert_allclose(j[..., 1], 0.0)


# ---------------- stats ----------------

def test_stats_counters():
    STATS.reset()
    c = STATS.counter("VRL integrator", "test counter")
    c.add(5)
    c.add(7)
    with STATS.timed("phase_x"):
        pass
    table = STATS.format_table()
    assert "test counter: 12" in table
    assert "phase_x" in table
    STATS.reset()


def test_area_emitter_power():
    """Sampled emission weight integrates to L * pi * A (area.cpp)."""
    from alvrl_tpu.scene import presets

    scene = presets.cornell_area_light(width=4, height=4)
    n = 8000
    keys = jax.random.split(jax.random.key(3), n)
    c = jnp.zeros(3)
    _, d, w = jax.vmap(
        lambda k: em_mod.sample_emission(scene.emitters, k, c, jnp.float32(1.7))
    )(keys)
    mc = float(jnp.mean(w[:, 0]))
    expected = 6.0 * np.pi * 0.25  # L pi A, quad (0.5)^2
    assert abs(mc - expected) / expected < 0.05
    # all emitted directions point downward (into the box)
    assert float(d[:, 1].max()) <= 1e-5


def test_area_emitter_nee_cosine():
    """NEE value accounts for the face cosine: a point directly under
    the light sees more than a point off to the side at equal r."""
    from alvrl_tpu.scene import presets

    scene = presets.cornell_area_light(width=4, height=4)
    keys = jax.random.split(jax.random.key(4), 4000)
    below = jnp.array([0.0, 0.0, 0.0])
    _, v_below, _ = jax.vmap(
        lambda k: em_mod.nee(scene.emitters, k, below, jnp.float32(1.7))
    )(keys)
    side = jnp.array([0.95, 0.95, 0.0])
    _, v_side, _ = jax.vmap(
        lambda k: em_mod.nee(scene.emitters, k, side, jnp.float32(1.7))
    )(keys)
    assert float(v_below.mean()) > float(v_side.mean())


def test_compact_device_matches_host():
    """vrl.compact_device (the pipelined driver's sync-free compaction)
    must match the host compact exactly: same slots, same order, same
    truncated particle count."""
    import numpy as np

    from alvrl_tpu.integrators.vrl import tracer, vrl as vrl_mod
    from alvrl_tpu.scene import presets

    scene = presets.cornell_smoke(width=16, height=16)
    raw = tracer.trace(scene, jax.random.key(0), 48,
                       tracer.TracerConfig(max_depth=8))
    for cap in (64, 128, 200):
        a = vrl_mod.compact(raw, cap, slots_per_particle=8)
        b = vrl_mod.compact_device(raw, cap, 8)
        np.testing.assert_allclose(np.asarray(a.start),
                                   np.asarray(b.start))
        np.testing.assert_allclose(np.asarray(a.end), np.asarray(b.end))
        np.testing.assert_allclose(np.asarray(a.power),
                                   np.asarray(b.power))
        assert np.array_equal(np.asarray(a.valid), np.asarray(b.valid))
        assert float(a.particle_count) == float(b.particle_count)
