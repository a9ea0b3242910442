"""UV-mapped bitmap textures: interpolation, bilinear lookup, loader
wiring, and an end-to-end render showing the pattern."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.geometry import shapes
from alvrl_tpu.textures.procedural import bitmap_lookup, interp_uv


def test_interp_uv_barycentric():
    face_uv = jnp.asarray(
        [[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]], jnp.float32
    )
    prim = jnp.int32(0)
    # barycentric (u, v) maps to corner1*u + corner2*v
    uv = interp_uv(face_uv, prim, jnp.asarray([0.25, 0.5]))
    assert np.allclose(np.asarray(uv), [0.25, 0.5])


def test_bitmap_bilinear_exact_at_texel_centers():
    r = np.random.RandomState(0)
    img = r.rand(8, 16, 3).astype(np.float32)
    tex = jnp.asarray(img[None])
    for (y, x) in [(0, 0), (3, 7), (7, 15)]:
        uv = jnp.asarray([(x + 0.5) / 16, (y + 0.5) / 8])
        out = np.asarray(bitmap_lookup(tex, jnp.int32(0), uv))
        assert np.allclose(out, img[y, x], atol=1e-6), (y, x)
    # u wraps
    out_w = np.asarray(bitmap_lookup(
        tex, jnp.int32(0), jnp.asarray([1.0 + (7 + 0.5) / 16, (3 + 0.5) / 8])
    ))
    assert np.allclose(out_w, img[3, 7], atol=1e-6)


def test_auto_uvs_shapes():
    v, f = shapes.rectangle()
    uv = shapes.auto_uvs("rectangle", v, f)
    assert uv.shape == (2, 3, 2)
    assert uv.min() >= 0 and uv.max() <= 1
    v, f = shapes.sphere(n_theta=6, n_phi=8)
    uv = shapes.auto_uvs("sphere", v, f, center=(0, 0, 0))
    assert np.isfinite(uv).all()
    # v coordinate spans pole to pole
    assert uv[..., 1].min() < 0.1 and uv[..., 1].max() > 0.9


def test_obj_vt_roundtrip(tmp_path):
    from alvrl_tpu.io import mesh as mesh_io

    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    v, f, fuv = mesh_io.load_obj_uv(str(p))
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert fuv.shape == (2, 3, 2)
    assert np.allclose(fuv[0], [[0, 0], [1, 0], [1, 1]])


def test_textured_render_shows_pattern(tmp_path):
    """A half-black/half-white bitmap on the floor: the rendered floor
    must show both dark and bright regions in the right halves."""
    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.io import image as img_io
    from alvrl_tpu.scene import loader

    img = np.ones((8, 8, 3), np.float32)
    img[:, :4] = 0.05  # left half (u < 0.5) dark
    fn = str(tmp_path / "tex.npy")
    img_io.write_npy(fn, img)

    desc = {
        "camera": {"origin": [0, 2.0, 0.01], "target": [0, 0, 0],
                   "up": [0, 0, 1], "width": 16, "height": 16},
        "medium": {"type": "homogeneous", "sigma_s": [0.0] * 3,
                   "sigma_a": [0.0] * 3},
        "materials": [{"name": "floor", "type": "diffuse",
                       "albedo": [0.9, 0.9, 0.9],
                       "texture": {"type": "bitmap", "filename": fn}}],
        "shapes": [{"type": "rectangle", "material": "floor",
                    "to_world": [[1, 0, 0, 0], [0, 0, 0, 0],
                                 [0, 1, 0, 0], [0, 0, 0, 1]]}],
        "emitters": [{"type": "point", "position": [0, 3.0, 0],
                      "intensity": [20, 20, 20]}],
    }
    # rectangle in the xz plane (y=0), camera above looking down
    scene = loader.load_json(desc)
    out = np.asarray(volpath.render_volpath(
        scene, jax.random.key(0), spp=16,
        cfg=volpath.VolpathConfig(max_depth=2, only_vrl_paths=False),
        ray_tile=256,
    ))
    assert np.isfinite(out).all()
    left = out[:, :6].mean()
    right = out[:, -6:].mean()
    lo, hi = min(left, right), max(left, right)
    assert hi > 4.0 * lo, (left, right)
