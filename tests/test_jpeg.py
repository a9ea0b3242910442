"""Baseline JPEG encoder (the reference's libjpeg output path,
bitmap.cpp) — verified by decoding with an independent decoder (PIL)."""

import numpy as np
import pytest

from alvrl_tpu.io import jpeg

PIL = pytest.importorskip("PIL.Image")


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_roundtrip_gradient(tmp_path):
    h, w = 48, 70  # non-multiple-of-8 dims exercise edge padding
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        xx / (w - 1),
        yy / (h - 1),
        0.5 + 0.5 * np.sin(xx / 5.0) * np.cos(yy / 7.0),
    ], axis=-1).astype(np.float32)
    p = tmp_path / "t.jpg"
    jpeg.write_jpeg(p, img, quality=92)
    back = np.asarray(PIL.open(p).convert("RGB"))
    assert back.shape == (h, w, 3)
    ref = np.clip(img * 255.0, 0, 255)
    assert _psnr(ref, back) > 30.0, _psnr(ref, back)


def test_grayscale_and_quality(tmp_path):
    img = np.linspace(0, 1, 32 * 32, dtype=np.float32).reshape(32, 32)
    p_hi = tmp_path / "hi.jpg"
    p_lo = tmp_path / "lo.jpg"
    jpeg.write_jpeg(p_hi, img, quality=95)
    jpeg.write_jpeg(p_lo, img, quality=20)
    assert p_hi.stat().st_size > p_lo.stat().st_size
    back = np.asarray(PIL.open(p_hi).convert("RGB")).astype(np.float64)
    ref = np.clip(np.repeat(img[:, :, None], 3, 2) * 255, 0, 255)
    assert _psnr(ref, back) > 32.0
