"""Image I/O.

Counterpart of the reference's Bitmap I/O + film plugins:
  * write_npy / read_npy — the mfilm NumPy export used for numeric
    validation (src/films/mfilm.cpp:123-128 via bundled cnpy);
  * write_pfm / read_pfm — HDR float images (bitmap.cpp PFM support;
    our EXR-equivalent interchange format, no OpenEXR dependency);
  * write_png — 8-bit LDR preview with gamma (ldrfilm), pure
    numpy+zlib;
  * rms / relative_error — the src/utils/rms.cpp comparison utility;
  * add_images / join_rgb — src/utils/{addimages,joinrgb}.cpp.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_npy(path, img):
    np.save(path, np.asarray(img, np.float32))


def read_npy(path):
    return np.load(path)


def write_pfm(path, img):
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    color = img.ndim == 3 and img.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.flipud(img).astype("<f4").tobytes())


def read_pfm(path):
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(
            f.read(), "<f4" if scale < 0 else ">f4"
        )
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape)).copy()


def _png_chunk(tag, data):
    out = struct.pack(">I", len(data)) + tag + data
    return out + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def write_png(path, img, gamma=2.2):
    """Tonemap (gamma) + 8-bit PNG, pure numpy/zlib (ldrfilm.cpp)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    ldr = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    u8 = (ldr * 255.0 + 0.5).astype(np.uint8)
    h, w = u8.shape[:2]
    raw = b"".join(
        b"\x00" + u8[y].tobytes() for y in range(h)
    )
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        ))
        f.write(_png_chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(_png_chunk(b"IEND", b""))


def rms(a, b):
    """Root-mean-square error between two images (rms.cpp)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def relative_error(a, ref, eps=1e-2):
    a = np.asarray(a, np.float64)
    ref = np.asarray(ref, np.float64)
    return float(np.mean(np.abs(a - ref) / (np.abs(ref) + eps)))


def add_images(images, weights=None):
    """Weighted sum of images (addimages.cpp)."""
    images = [np.asarray(i, np.float64) for i in images]
    if weights is None:
        weights = [1.0] * len(images)
    out = np.zeros_like(images[0])
    for img, w in zip(images, weights):
        out += w * img
    return out.astype(np.float32)


def join_rgb(r, g, b):
    """Merge three single-channel renders into RGB (joinrgb.cpp)."""
    return np.stack(
        [np.asarray(x)[..., 0] if np.asarray(x).ndim == 3 else np.asarray(x)
         for x in (r, g, b)],
        axis=-1,
    ).astype(np.float32)


def tonemap(img, key: float = 0.18, gamma: float = 2.2,
            burn: float = 0.0):
    """Photographic (Reinhard) tonemapping + gamma — the mtsutil
    `tonemap` utility (src/utils/tonemap.cpp). Returns [0, 1] floats;
    feed to write_png for LDR output."""
    img = np.asarray(img, np.float32)
    lum = (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
           + 0.072169 * img[..., 2])
    avg = np.exp(np.log(np.maximum(lum, 1e-6)).mean())
    scaled = img * (key / max(avg, 1e-12))
    l_s = lum * (key / max(avg, 1e-12))
    if burn > 0.0:
        white2 = (burn * l_s.max()) ** 2
        mapped = l_s * (1.0 + l_s / max(white2, 1e-12)) / (1.0 + l_s)
    else:
        mapped = l_s / (1.0 + l_s)
    ratio = np.where(l_s > 0, mapped / np.maximum(l_s, 1e-12), 0.0)
    out = np.clip(scaled * ratio[..., None], 0.0, 1.0)
    return out ** (1.0 / gamma)
