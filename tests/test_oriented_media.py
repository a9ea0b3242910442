"""Oriented heterogeneous media: orientation volumes, directional
extinction (microflake sigmaDir), volpath integration, .vol I/O."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators import volpath
from alvrl_tpu.media import heterogeneous as gmed
from alvrl_tpu.media import phase as ph
from alvrl_tpu.scene import presets


def _fiber_scene(width=8, height=8, axis=(0.0, 0.0, 1.0)):
    """Cornell box with a constant-orientation microflake medium."""
    base = presets.cornell_smoke(width=width, height=height,
                                 with_blocker=False)
    r = 8
    dens = np.ones((r, r, r), np.float32) * 0.8
    orient = np.broadcast_to(
        np.asarray(axis, np.float32), (r, r, r, 3)).copy()
    med = gmed.make_grid_medium(
        dens, [1.0, 1.0, 1.0], [0.9, 0.9, 0.9],
        phase_kind=ph.MICROFLAKE, orientation=orient,
        phase_params=ph.microflake_params(0.2),
    )
    return base.replace(medium=med)


def test_directional_extinction():
    scene = _fiber_scene()
    med = scene.medium
    p = jnp.zeros(3)
    # along the fiber: small projected area; perpendicular: large
    f_par = float(gmed.dir_factor(med, p, jnp.array([0.0, 0.0, 1.0])))
    f_perp = float(gmed.dir_factor(med, p, jnp.array([1.0, 0.0, 0.0])))
    assert f_perp > 1.5 * f_par, (f_perp, f_par)
    # optical depth along the two axes through the same density field
    od_par = float(gmed.optical_depth(
        med, jnp.array([0.0, 0.0, -0.9]), jnp.array([0.0, 0.0, 0.9])))
    od_perp = float(gmed.optical_depth(
        med, jnp.array([-0.9, 0.0, 0.0]), jnp.array([0.9, 0.0, 0.0])))
    assert od_perp > 1.5 * od_par, (od_perp, od_par)


def test_orientation_lookup_trilinear():
    scene = _fiber_scene(axis=(0.0, 1.0, 0.0))
    o = np.asarray(gmed.lookup_orientation(
        scene.medium, jnp.array([0.1, -0.2, 0.3])))
    np.testing.assert_allclose(o, [0.0, 1.0, 0.0], atol=1e-6)
    # outside the box -> zero vector
    o2 = np.asarray(gmed.lookup_orientation(
        scene.medium, jnp.array([5.0, 0.0, 0.0])))
    np.testing.assert_allclose(o2, 0.0)


def test_volpath_microflake_renders():
    scene = _fiber_scene(width=8, height=8)
    img = np.asarray(volpath.render_volpath(
        scene, jax.random.key(0), spp=24,
        cfg=volpath.VolpathConfig(max_depth=6, only_vrl_paths=False),
        ray_tile=64,
    ))
    assert np.isfinite(img).all()
    assert img.mean() > 0


def test_vol_roundtrip(tmp_path):
    from alvrl_tpu.io import vol

    rng = np.random.default_rng(3)
    d = rng.random((5, 6, 7)).astype(np.float32)
    p = tmp_path / "d.vol"
    vol.write_vol(p, d, (-1, -2, -3), (1, 2, 3))
    back, bmin, bmax = vol.read_vol(p)
    np.testing.assert_array_equal(back, d)
    np.testing.assert_array_equal(bmin, [-1, -2, -3])
    # 3-channel (orientation) + uint8 quantization
    v = rng.random((4, 4, 4, 3)).astype(np.float32)
    p2 = tmp_path / "v.vol"
    vol.write_vol(p2, v, encoding="uint8")
    back2, _, _ = vol.read_vol(p2)
    assert back2.shape == (4, 4, 4, 3)
    assert np.abs(back2 - v).max() < 1.0 / 255.0 + 1e-6
