"""Shape constructors (geometry/shapes.py vs src/shapes/)."""

import numpy as np

from alvrl_tpu.geometry import shapes


def _area(v, f):
    p = v[f]
    return 0.5 * np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1
    ).sum()


def test_disk_area_and_normal():
    v, f = shapes.disk(radius=2.0, n_phi=256)
    assert abs(_area(v, f) - np.pi * 4.0) / (np.pi * 4.0) < 1e-3
    p = v[f]
    n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    assert (n[:, 2] > 0).all()  # +z winding like rectangle.cpp


def test_cylinder_area():
    v, f = shapes.cylinder((0, 0, 0), (0, 0, 3.0), radius=0.5, n_phi=512)
    lateral = 2 * np.pi * 0.5 * 3.0
    assert abs(_area(v, f) - lateral) / lateral < 1e-3
    v2, f2 = shapes.cylinder((0, 0, 0), (0, 0, 3.0), 0.5, n_phi=512,
                             caps=True)
    full = lateral + 2 * np.pi * 0.25
    assert abs(_area(v2, f2) - full) / full < 1e-3


def test_heightfield_grid():
    h = np.zeros((4, 5), np.float32)
    v, f = shapes.heightfield(h, 2.0, 2.0)
    assert v.shape == (20, 3)
    assert f.shape == (2 * 3 * 4, 3)
    assert abs(_area(v, f) - 4.0) < 1e-5  # flat field spans [-1,1]^2


def test_hair_tubes_and_loader(tmp_path):
    fibers = [np.array([[0, 0, 0], [0, 0, 1], [0, 0.2, 2]], np.float32)]
    v, f = shapes.hair(fibers, radius=0.1, n_phi=6)
    assert len(f) == 2 * 6 * 2  # two segments, 6 sides, 2 tris each

    p = tmp_path / "f.hair"
    p.write_text("0 0 0\n0 0 1\n\n1 0 0\n1 0 1\n1 0 2\n")
    loaded = shapes.load_hair_file(p)
    assert len(loaded) == 2
    assert loaded[1].shape == (3, 3)


def test_serialized_roundtrip(tmp_path):
    from alvrl_tpu.io import mesh as M

    v = np.random.default_rng(0).random((10, 3)).astype(np.float32)
    f = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    n = np.tile([0.0, 0.0, 1.0], (10, 1)).astype(np.float32)
    uv = np.random.default_rng(1).random((10, 2)).astype(np.float32)
    p = tmp_path / "m.serialized"
    M.save_serialized(p, [(v, f, n, uv), (v * 2, f)])
    assert M.serialized_mesh_count(p) == 2
    v2, f2, n2, uv2 = M.load_serialized(p, 0)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)
    np.testing.assert_allclose(n2, n)
    np.testing.assert_allclose(uv2, uv)
    v3, _, n3, uv3 = M.load_serialized(p, 1)
    np.testing.assert_allclose(v3, v * 2)
    assert n3 is None and uv3 is None


def test_instance_replicates():
    v, f = shapes.rectangle()
    iv, if_ = shapes.instance(
        v, f, [shapes.translate(0, 0, 0), shapes.translate(5, 0, 0)]
    )
    assert iv.shape == (8, 3)
    assert if_.shape == (4, 3)
    assert if_.max() == 7
    np.testing.assert_allclose(iv[4:, 0] - iv[:4, 0], 5.0)
