"""BVH tests: native build + device traversal vs the brute-force
intersector (counterpart of test_kd.cpp's build/trace checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.geometry import bvh as bvh_mod
from alvrl_tpu.geometry import intersect, shapes


def _random_mesh(n=200, seed=0):
    rng = np.random.default_rng(seed)
    # soup of random small triangles in [-1, 1]^3
    centers = rng.uniform(-1, 1, (n, 1, 3))
    offsets = rng.normal(0, 0.08, (n, 3, 3))
    verts = (centers + offsets).reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return verts, faces


def test_build_covers_all_prims():
    verts, faces = _random_mesh(100)
    b = bvh_mod.build(verts, faces)
    order = np.sort(np.asarray(b.prim_order))
    np.testing.assert_array_equal(order, np.arange(100))
    # root bounds contain all vertices
    lo = np.asarray(b.bounds_lo[0])
    hi = np.asarray(b.bounds_hi[0])
    assert (verts >= lo - 1e-5).all() and (verts <= hi + 1e-5).all()


def test_traversal_matches_bruteforce():
    verts, faces = _random_mesh(300, seed=1)
    b = bvh_mod.build(verts, faces)
    rng = np.random.default_rng(2)
    n_rays = 128
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit_bf = intersect.intersect_all(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(verts), jnp.asarray(faces)
    )
    t_bvh, prim_bvh, valid_bvh = jax.vmap(
        lambda oo, dd: bvh_mod.intersect(b, oo, dd)
    )(jnp.asarray(o), jnp.asarray(d))

    np.testing.assert_array_equal(
        np.asarray(valid_bvh), np.asarray(hit_bf.valid)
    )
    both = np.asarray(valid_bvh) & np.asarray(hit_bf.valid)
    np.testing.assert_allclose(
        np.asarray(t_bvh)[both], np.asarray(hit_bf.t)[both], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(prim_bvh)[both], np.asarray(hit_bf.prim)[both]
    )


def test_occlusion_matches_bruteforce():
    v, f = shapes.cube()
    b = bvh_mod.build(v, f)
    p0 = jnp.array([[0.0, 0.0, -2.0], [0.0, 0.0, 0.5], [2.0, 2.0, 2.0]])
    p1 = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -0.5], [3.0, 3.0, 3.0]])
    blocked = jax.vmap(lambda a, c: bvh_mod.occluded(b, a, c))(p0, p1)
    expected = intersect.occluded(p0, p1, jnp.asarray(v), jnp.asarray(f))
    np.testing.assert_array_equal(np.asarray(blocked), np.asarray(expected))


def test_bunny_scale_build():
    """Larger mesh build + spot-check traversal (the kdbench analog)."""
    v, f = shapes.sphere(radius=1.0, n_theta=32, n_phi=64)  # 4096 tris
    b = bvh_mod.build(v, f)
    assert b.bounds_lo.shape[0] > 100
    o = jnp.array([0.0, 0.0, -3.0])
    d = jnp.array([0.0, 0.0, 1.0])
    t, prim, valid = bvh_mod.intersect(b, o, d)
    assert bool(valid)
    assert abs(float(t) - 2.0) < 1e-2


def test_bvh_kernel_matches_smem_kernel():
    """The two-level (cluster-DMA) occlusion kernel must reproduce the
    SMEM-sweep kernel exactly at small scale: same seed => identical
    samples => identical estimator output (round-4 phase-2 regression:
    register-carry sweep + per-ray-group culling)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from alvrl_tpu.integrators.vrl import tracer, vrl as vrl_mod
    from alvrl_tpu.integrators.vrl.integrator import trace_eye_rays
    from alvrl_tpu.media import api as mapi
    from alvrl_tpu.ops import pack as pk
    from alvrl_tpu.ops import vrl_pallas as vp
    from alvrl_tpu.scene import presets
    from alvrl_tpu.sensors import perspective

    sc = mapi.prepare_scene(presets.cornell_smoke(width=16, height=8))
    vr = vrl_mod.compact(
        tracer.trace(sc, jax.random.key(0), 16,
                     tracer.TracerConfig(max_depth=6)),
        128)
    px, py = np.meshgrid(np.arange(16), np.arange(8))
    ro, rd = perspective.sample_ray(
        sc.camera, jnp.asarray(px.reshape(-1)),
        jnp.asarray(py.reshape(-1)))
    hit = trace_eye_rays(sc, ro, rd)
    rp = pk.pack_rays(sc, ro, rd, hit)
    vpk = pk.pack_vrls(vr)
    med = pk.pack_medium(sc)
    seed = jnp.asarray([3], jnp.int32)
    clb, sclb, blocks, c = vp.pack_tri_clusters(
        np.asarray(sc.vertices), np.asarray(sc.faces),
        np.asarray(sc.opaque_faces()))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(vp.vrl_sum_pallas(rp, vpk, pk.pack_tris(sc),
                                         med, seed))
        b = np.asarray(vp.vrl_sum_pallas_bvh(rp, vpk, clb, sclb, blocks,
                                             med, seed, n_clusters=c))
    nz = a > 1e-9
    assert nz.sum() > 50
    rel = np.abs(a - b)[nz] / a[nz]
    assert np.median(rel) < 1e-6, np.median(rel)
    assert rel.max() < 1e-4, rel.max()
