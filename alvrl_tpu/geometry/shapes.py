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


def merge(parts):
    """Merge [(verts, faces, material_id), ...] into one soup."""
    all_v, all_f, all_m = [], [], []
    off = 0
    for v, f, mat in parts:
        all_v.append(v)
        all_f.append(f + off)
        all_m.append(np.full((len(f),), mat, dtype=np.int32))
        off += len(v)
    return (
        np.concatenate(all_v, axis=0),
        np.concatenate(all_f, axis=0),
        np.concatenate(all_m, axis=0),
    )
