"""Procedural triangle-mesh shape constructors (host-side, numpy).

Counterpart of the reference's analytic shape plugins
(src/shapes/{rectangle,cube,sphere}.cpp) — here every shape is
triangulated up front so the device-side intersector sees one uniform
triangle soup. Runs at scene-build time on host; not traced.
"""

from __future__ import annotations

import numpy as np


def rectangle(to_world=None):
    """Unit xy rectangle [-1,1]^2 at z=0, normal +z (rectangle.cpp)."""
    v = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], dtype=np.float32
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    if to_world is not None:
        v = apply_transform(to_world, v)
    return v, f


def cube(to_world=None, flip_normals=False):
    """[-1,1]^3 cube with outward normals (cube.cpp)."""
    verts = []
    faces = []
    # Each face as a rectangle transformed into place.
    axes = [
        # (permutation to place rect, offset along normal axis)
        (np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]]), np.array([0, 0, 1.0])),
        (np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1]]), np.array([0, 0, -1.0])),
        (np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]]), np.array([1.0, 0, 0])),
        (np.array([[0, 0, -1], [0, 1, 0], [-1, 0, 0]]), np.array([-1.0, 0, 0])),
        (np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]]), np.array([0, 1.0, 0])),
        (np.array([[1, 0, 0], [0, 0, -1], [0, -1, 0]]), np.array([0, -1.0, 0])),
    ]
    for rot, off in axes:
        v, f = rectangle()
        v = v @ np.asarray(rot, dtype=np.float32).T + off.astype(np.float32)
        faces.append(f + sum(len(x) for x in verts))
        verts.append(v)
    v = np.concatenate(verts, axis=0)
    f = np.concatenate(faces, axis=0)
    if flip_normals:
        f = f[:, ::-1]
    if to_world is not None:
        v = apply_transform(to_world, v)
    return v, f.copy()


def sphere(center=(0, 0, 0), radius=1.0, n_theta=16, n_phi=32):
    """UV-sphere triangulation (sphere.cpp approximated by a mesh)."""
    center = np.asarray(center, dtype=np.float32)
    thetas = np.linspace(0, np.pi, n_theta + 1)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    ring_v = []
    for th in thetas:
        st, ct = np.sin(th), np.cos(th)
        ring = np.stack(
            [st * np.cos(phis), st * np.sin(phis), np.full_like(phis, ct)],
            axis=-1,
        )
        ring_v.append(ring)
    v = np.concatenate(ring_v, axis=0).astype(np.float32)
    faces = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append([a, b, d])
            faces.append([a, d, c])
    f = np.asarray(faces, dtype=np.int32)
    v = v * np.float32(radius) + center
    return v, f


def apply_transform(mat4, verts):
    """Apply a 4x4 homogeneous transform to (N, 3) vertices."""
    mat4 = np.asarray(mat4, dtype=np.float32)
    vh = np.concatenate([verts, np.ones((len(verts), 1), np.float32)], axis=1)
    out = vh @ mat4.T
    return (out[:, :3] / out[:, 3:4]).astype(np.float32)


def translate(x, y, z):
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [x, y, z]
    return t


def scale(x, y=None, z=None):
    if y is None:
        y = z = x
    s = np.eye(4, dtype=np.float32)
    s[0, 0], s[1, 1], s[2, 2] = x, y, z
    return s


def auto_uvs(kind: str, v, f, center=None):
    """Per-face-corner texture coordinates (F, 3, 2) for the analytic
    shapes, computed from CANONICAL (pre-to_world) vertices — the UV
    parameterizations of src/shapes/{rectangle,cube,sphere}.cpp:
      * rectangle: (x, y) in [-1,1]^2 -> [0,1]^2;
      * cube: dominant-axis box projection per face;
      * sphere: equirectangular (phi/2pi, theta/pi) about `center`.
    Unknown kinds get zeros (untextured)."""
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int32)
    corners = v[f]  # (F, 3, 3)
    if kind == "rectangle":
        return ((corners[..., :2] + 1.0) * 0.5).astype(np.float32)
    if kind == "cube":
        n = np.cross(corners[:, 1] - corners[:, 0],
                     corners[:, 2] - corners[:, 0])
        axis = np.argmax(np.abs(n), axis=-1)  # (F,)
        uv = np.zeros((len(f), 3, 2), np.float32)
        for a, (i0, i1) in enumerate([(1, 2), (0, 2), (0, 1)]):
            sel = axis == a
            uv[sel] = (corners[sel][..., [i0, i1]] + 1.0) * 0.5
        return uv
    if kind == "sphere":
        c = np.zeros(3, np.float32) if center is None else np.asarray(
            center, np.float32)
        d = corners - c
        d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        theta = np.arccos(np.clip(d[..., 2], -1, 1))
        phi = np.arctan2(d[..., 1], d[..., 0])
        u = (phi / (2 * np.pi) + 0.5)
        # avoid the seam jump inside one triangle: rebase to corner 0
        u = u - np.round(u - u[:, :1])
        return np.stack([u, theta / np.pi], axis=-1).astype(np.float32)
    return np.zeros((len(f), 3, 2), np.float32)


def merge(parts):
    """Merge [(verts, faces, material_id[, face_uv]), ...] into one
    soup. Returns (verts, faces, mats, face_uvs (T, 3, 2))."""
    all_v, all_f, all_m, all_uv = [], [], [], []
    off = 0
    for part in parts:
        v, f, mat = part[0], part[1], part[2]
        uv = part[3] if len(part) > 3 and part[3] is not None else (
            np.zeros((len(f), 3, 2), np.float32)
        )
        all_v.append(v)
        all_f.append(f + off)
        all_m.append(np.full((len(f),), mat, dtype=np.int32))
        all_uv.append(np.asarray(uv, np.float32))
        off += len(v)
    return (
        np.concatenate(all_v, axis=0),
        np.concatenate(all_f, axis=0),
        np.concatenate(all_m, axis=0),
        np.concatenate(all_uv, axis=0),
    )
