"""OpenEXR scanline I/O in pure NumPy (no external libraries).

Counterpart of the reference's EXR path in Bitmap (src/libcore/
bitmap.cpp, via the OpenEXR library): `hdrfilm` writes EXR and the
validation workflow reads the reference's EXR dumps. Supports:

  * write: single-part scanline, RGB(A), HALF or FLOAT channels,
    compression NONE, ZIPS (1 line/chunk) or ZIP (16 lines/chunk);
  * read: the same subset (NONE/ZIPS/ZIP, HALF/FLOAT/UINT channels,
    arbitrary channel names, increasing-y line order).

The ZIP codec is the OpenEXR "reorder + delta + zlib" scheme
(ImfZip.cpp): compression splits bytes into even/odd streams, delta
encodes (d[i] = t[i] - t[i-1] + 384 mod 256), then deflates.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_COMP_NONE, _COMP_ZIPS, _COMP_ZIP = 0, 2, 3
_LINES_PER_CHUNK = {_COMP_NONE: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16}
_DTYPE = {_PT_UINT: np.uint32, _PT_HALF: np.float16, _PT_FLOAT: np.float32}


def _zip_compress(raw: bytes) -> bytes:
    a = np.frombuffer(raw, np.uint8)
    half = (a.size + 1) // 2
    t = np.empty_like(a)
    t[:half] = a[0::2]
    t[half:] = a[1::2]
    t = t.astype(np.int16)
    d = np.empty_like(t)
    d[0] = t[0]
    d[1:] = (t[1:] - t[:-1] + 384) & 0xFF
    return zlib.compress(d.astype(np.uint8).tobytes())


def _zip_decompress(data: bytes, raw_size: int) -> bytes:
    t = np.frombuffer(zlib.decompress(data), np.uint8)
    if t.size != raw_size:
        raise ValueError("EXR zip chunk size mismatch")
    # invert the delta predictor: u[i] = (u[i-1] + t[i] - 384) mod 256,
    # u[0] = t[0]; mod-256 distributes over the cumulative sum
    u = (np.cumsum(t.astype(np.int64) - 384) + 384) & 0xFF
    half = (raw_size + 1) // 2
    out = np.empty(raw_size, np.uint8)
    out[0::2] = u[:half]
    out[1::2] = u[half:]
    return out.tobytes()


def _attr(name: str, typ: str, data: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(data)) + data)


def write_exr(path, img, half: bool = True,
              compression: str = "zip") -> None:
    """Write an (H, W), (H, W, 3) or (H, W, 4) float image as EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[2]
    names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["R", "G", "B", "A"]}[c]
    write_exr_channels(
        path, {n: img[..., i] for i, n in enumerate(names)},
        half=half, compression=compression)


def write_exr_channels(path, channels: dict, half: bool = True,
                       compression: str = "zip") -> None:
    """Write named scalar channels {name: (H, W) f32} as one EXR part.

    The multichannel-film path (multichannel.cpp + hdrfilm channel
    naming): arbitrary channel names, stored alphabetically as the EXR
    spec requires; all channels share the data window."""
    items = [(n, np.asarray(a, np.float32)) for n, a in channels.items()]
    h, w = items[0][1].shape
    for n, a in items:
        if a.shape != (h, w):
            raise ValueError(f"channel {n!r} shape {a.shape} != {(h, w)}")
    img = np.stack([a for _, a in items], axis=-1)
    names = [n for n, _ in items]
    comp = {"none": _COMP_NONE, "zips": _COMP_ZIPS, "zip": _COMP_ZIP}[
        compression.lower()]
    pt = _PT_HALF if half else _PT_FLOAT
    dtype = _DTYPE[pt]
    order = np.argsort(names)  # channels stored alphabetically

    chlist = b""
    for i in order:
        chlist += (names[i].encode() + b"\0"
                   + struct.pack("<iBBBBii", pt, 0, 0, 0, 0, 1, 1))
    chlist += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        _attr("channels", "chlist", chlist)
        + _attr("compression", "compression", struct.pack("<B", comp))
        + _attr("dataWindow", "box2i", box)
        + _attr("displayWindow", "box2i", box)
        + _attr("lineOrder", "lineOrder", struct.pack("<B", 0))
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0"
    )
    lpc = _LINES_PER_CHUNK[comp]
    n_chunks = (h + lpc - 1) // lpc
    chunks = []
    data = img.astype(dtype)
    for ci in range(n_chunks):
        y0 = ci * lpc
        ny = min(lpc, h - y0)
        rows = []
        for y in range(y0, y0 + ny):
            for i in order:
                rows.append(data[y, :, i].tobytes())
        raw = b"".join(rows)
        if comp == _COMP_NONE:
            payload = raw
        else:
            z = _zip_compress(raw)
            payload = z if len(z) < len(raw) else raw
        chunks.append((y0, payload))

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, 2))
        f.write(header)
        offset_pos = f.tell()
        f.write(b"\0" * (8 * n_chunks))
        offsets = []
        for y0, payload in chunks:
            offsets.append(f.tell())
            f.write(struct.pack("<ii", y0, len(payload)))
            f.write(payload)
        f.seek(offset_pos)
        f.write(struct.pack(f"<{n_chunks}Q", *offsets))


def _read_cstr(buf: bytes, pos: int):
    end = buf.index(b"\0", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def read_exr(path):
    """Read a scanline EXR -> (H, W, C) float32 array + channel names.
    Returns (img, names); RGB(A) inputs come back in R,G,B(,A) order."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("tiled EXR not supported")
    pos = 8
    attrs = {}
    while True:
        name, pos = _read_cstr(buf, pos)
        if not name:
            break
        typ, pos = _read_cstr(buf, pos)
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        attrs[name] = (typ, buf[pos:pos + size])
        pos += size

    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    if comp not in _LINES_PER_CHUNK:
        raise ValueError(f"unsupported EXR compression {comp}")
    lpc = _LINES_PER_CHUNK[comp]

    # channel list (already alphabetical per spec)
    ch, cpos = [], 0
    cbuf = attrs["channels"][1]
    while cbuf[cpos] != 0:
        cname, cpos = _read_cstr(cbuf, cpos)
        ptype, _pl, _r0, _r1, _r2, _xs, _ys = struct.unpack_from(
            "<iBBBBii", cbuf, cpos)
        cpos += 16
        ch.append((cname, ptype))
    n_chunks = (h + lpc - 1) // lpc
    offsets = struct.unpack_from(f"<{n_chunks}Q", buf, pos)

    out = {name: np.empty((h, w), np.float32) for name, _ in ch}
    bpp = {_PT_UINT: 4, _PT_HALF: 2, _PT_FLOAT: 4}
    row_bytes = sum(w * bpp[pt] for _, pt in ch)
    for off in offsets:
        y, size = struct.unpack_from("<ii", buf, off)
        payload = buf[off + 8:off + 8 + size]
        ny = min(lpc, y1 - y + 1)
        raw_size = row_bytes * ny
        raw = (payload if comp == _COMP_NONE or size == raw_size
               else _zip_decompress(payload, raw_size))
        rpos = 0
        for yy in range(y, y + ny):
            for cname, pt in ch:
                nb = w * bpp[pt]
                arr = np.frombuffer(raw[rpos:rpos + nb], _DTYPE[pt])
                out[cname][yy - y0] = arr.astype(np.float32)
                rpos += nb
    names = [n for n, _ in ch]
    rgba = [n for n in ("R", "G", "B", "A", "Y") if n in out]
    if rgba:
        names = rgba + [n for n in names if n not in rgba]
    img = np.stack([out[n] for n in names], axis=-1)
    return img, names
