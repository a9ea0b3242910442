"""Irradiance caching (misc/irrcache.cpp + librender/irrcache.cpp)."""

import jax
import numpy as np
import pytest

from alvrl_tpu.integrators import irrcache, surface
from alvrl_tpu.scene import loader


@pytest.fixture(scope="module")
def box_scene():
    """Closed diffuse box, point light — a pure indirect-GI fixture."""
    desc = {
        "camera": {"origin": [0, 0, -2.4], "target": [0, 0, 0],
                   "up": [0, 1, 0], "fov_x_deg": 55.0,
                   "width": 16, "height": 16},
        "materials": [
            {"name": "white", "type": "diffuse", "albedo": [0.7, 0.7, 0.7]},
        ],
        "shapes": [
            {"type": "cube", "material": "white", "flip_normals": True,
             "to_world": [[2.6, 0, 0, 0], [0, 2.6, 0, 0], [0, 0, 2.6, 0],
                          [0, 0, 0, 1]]},
        ],
        "emitters": [
            {"type": "point", "position": [0, 1.8, 0],
             "intensity": [8, 8, 8]},
        ],
    }
    return surface.vacuumize(loader.build_scene(desc))


def test_gather_matches_analytic_furnace(box_scene):
    """In a furnace-like setup the gather machinery must integrate a
    constant radiance field to E = pi * L exactly (stratification
    weights sum correctly)."""
    import jax.numpy as jnp

    def li_const(scene, o, d, key):
        return jnp.ones((3,)) * 2.0

    p = np.zeros((4, 3), np.float32)
    n = np.tile(np.array([0, 1, 0], np.float32), (4, 1))
    E, rgrad, tgrad, r0, hmin = irrcache.gather_hemispheres(
        box_scene, p, n, jax.random.key(0), li_const, 6)
    np.testing.assert_allclose(np.asarray(E), np.pi * 2.0, rtol=1e-5)
    # constant field: gradients vanish (cellwise differences are zero;
    # the rotational gradient cancels by the vk symmetry)
    assert np.abs(np.asarray(tgrad)).max() < 1e-4
    assert np.abs(np.asarray(rgrad)).max() < 1e-4


def test_cache_covers_and_interpolates(box_scene):
    cache = irrcache.build_cache(
        box_scene, jax.random.key(1), resolution=6, batch=64)
    assert cache.size > 0
    assert (cache.r0 > 0).all()
    # every diffuse camera hit interpolates with nonzero weight
    img, cache2 = irrcache.render_irrcache(
        box_scene, jax.random.key(2), resolution=6, cache=cache,
        spp_direct=4)
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_matches_two_bounce_path(box_scene):
    """irrcache(direct) == 2-bounce GI: compare against the path tracer
    at max_depth=2 (statistical tolerance)."""
    img_ic, _ = irrcache.render_irrcache(
        box_scene, jax.random.key(3), resolution=8, spp_direct=16)
    ref = np.asarray(surface.render_path(
        box_scene, jax.random.key(4), spp=64, max_depth=2))
    m_ic = float(img_ic.mean())
    m_ref = float(ref.mean())
    assert abs(m_ic - m_ref) / m_ref < 0.15, (m_ic, m_ref)
    # indirect must be a real contribution (not just direct)
    direct = np.asarray(surface.render_direct(
        box_scene, jax.random.key(5), spp=32))
    assert m_ic > 1.05 * float(direct.mean())
