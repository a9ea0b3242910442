"""Geometry tests (counterpart of src/tests/test_kd.cpp clipping/trace
checks, over the brute-force vectorized intersector)."""

import jax.numpy as jnp
import numpy as np

from alvrl_tpu.geometry import intersect, shapes
from alvrl_tpu.scene import presets


def test_ray_triangle_basic():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([0.2, 0.2, -1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    t, u, v, hit = intersect.ray_triangle(o, d, p0, p1, p2)
    assert bool(hit)
    assert abs(float(t) - 1.0) < 1e-6


def test_ray_triangle_miss():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([0.9, 0.9, -1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    _, _, _, hit = intersect.ray_triangle(o, d, p0, p1, p2)
    assert not bool(hit)


def test_cube_closed():
    """Rays from inside a cube always hit, at the right distance."""
    v, f = shapes.cube()
    verts = jnp.asarray(v)
    faces = jnp.asarray(f)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((256, 3))
    hit = intersect.intersect_all(o, jnp.asarray(d, jnp.float32), verts, faces)
    assert bool(jnp.all(hit.valid))
    # inside the unit cube, hit distance in [1, sqrt(3)]
    t = np.asarray(hit.t)
    assert (t >= 0.999).all() and (t <= np.sqrt(3) + 1e-3).all()
    # oriented normal faces the origin
    cosang = np.sum(np.asarray(hit.ng) * d, axis=-1)
    assert (cosang < 0).all()


def test_occlusion():
    v, f = shapes.cube()
    verts = jnp.asarray(v)
    faces = jnp.asarray(f)
    p0 = jnp.array([[0.0, 0.0, -2.0], [0.0, 0.0, 0.5]])
    p1 = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -0.5]])
    blocked = intersect.occluded(p0, p1, verts, faces)
    assert bool(blocked[0])       # crosses the cube walls
    assert not bool(blocked[1])   # interior segment


def test_occlusion_mask_pass_through():
    v, f = shapes.cube()
    mask = jnp.zeros((len(f),), bool)  # all faces transparent
    blocked = intersect.occluded(
        jnp.array([0.0, 0.0, -2.0]),
        jnp.array([0.0, 0.0, 2.0]),
        jnp.asarray(v),
        jnp.asarray(f),
        mask,
    )
    assert not bool(blocked)


def test_cornell_scene_sane():
    scene = presets.cornell_smoke(width=16, height=16)
    lo, hi = scene.aabb()
    np.testing.assert_allclose(np.asarray(lo), [-1, -1, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hi), [1, 1, 1], atol=1e-5)
    assert bool(jnp.all(scene.opaque_faces()))
