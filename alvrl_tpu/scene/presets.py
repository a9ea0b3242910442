"""Benchmark scene constructors (BASELINE.json configs).

The reference ships no scenes in-repo (they live on the project website),
so these are self-contained reconstructions of the benchmark
configurations: a Cornell box filled with a homogeneous scattering
medium, a single point emitter, camera inside the medium.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from alvrl_tpu.geometry import shapes
from alvrl_tpu.media.homogeneous import make_medium
from alvrl_tpu.scene.scene import (
    DIFFUSE,
    Camera,
    Materials,
    Scene,
    look_at,
    make_point_emitters,
)

# material ids used by the cornell scene
M_WHITE, M_RED, M_GREEN, M_BOX = 0, 1, 2, 3


def cornell_smoke(
    width=128,
    height=128,
    sigma_s=(0.8, 0.8, 0.8),
    sigma_a=(0.05, 0.05, 0.05),
    g=0.0,
    intensity=(8.0, 8.0, 8.0),
    with_blocker=True,
):
    """Cornell box [-1,1]^3 filled with a homogeneous medium.

    Walls: white floor/ceiling/back, red left (-x), green right (+x);
    a short box blocker creates shadowed regions so clustering and
    occlusion both matter. Point light near the ceiling. Camera at the
    open front face looking down +z... (the front face is absent so the
    camera, which sits inside the medium extent, sees the interior).
    """
    parts = []

    def wall(v, f, mat):
        parts.append((v, f, mat))

    # floor y=-1 (normal +y)
    v, f = shapes.rectangle()
    v = v @ np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32).T
    wall(v + np.array([0, -1, 0], np.float32), f, M_WHITE)
    # ceiling y=+1 (normal -y)
    wall(v + np.array([0, 1, 0], np.float32), f[:, ::-1].copy(), M_WHITE)
    # back wall z=+1 (normal -z)
    v, f = shapes.rectangle()
    wall(v + np.array([0, 0, 1], np.float32), f[:, ::-1].copy(), M_WHITE)
    # front wall z=-1 (normal +z, behind the camera) — closes the box so
    # light paths stay bounded (the global medium fills the interior)
    wall(v + np.array([0, 0, -1], np.float32), f.copy(), M_WHITE)
    # left wall x=-1 (normal +x)
    v, f = shapes.rectangle()
    v = v @ np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.float32).T
    wall(v + np.array([-1, 0, 0], np.float32), f, M_RED)
    # right wall x=+1 (normal -x)
    wall(v + np.array([1, 0, 0], np.float32), f[:, ::-1].copy(), M_GREEN)

    if with_blocker:
        bv, bf = shapes.cube()
        bv = bv * np.array([0.25, 0.5, 0.25], np.float32) + np.array(
            [-0.35, -0.5, 0.3], np.float32
        )
        parts.append((bv, bf, M_BOX))

    verts, faces, mat = shapes.merge(parts)

    materials = Materials(
        kind=jnp.full((4,), DIFFUSE, jnp.int32),
        albedo=jnp.asarray(
            [
                [0.725, 0.71, 0.68],   # white
                [0.63, 0.065, 0.05],   # red
                [0.14, 0.45, 0.091],   # green
                [0.725, 0.71, 0.68],   # blocker
            ],
            jnp.float32,
        ),
        eta=jnp.ones((4,), jnp.float32),
    )

    emitters = make_point_emitters([[0.0, 0.75, 0.2]], [list(intensity)])
    medium = make_medium(sigma_a, sigma_s, g=g)
    # Camera just inside the (open) front face, looking down +z: every
    # eye segment lies inside the medium and no ray escapes to infinity
    # (whose contribution the reference drops, vrlIntegrator.cpp:418-423).
    camera = Camera(
        to_world=look_at([0, 0, -0.99], [0, 0, 1], [0, 1, 0]),
        fov_x_deg=jnp.float32(90.0),
        width=width,
        height=height,
    )
    return Scene(
        vertices=jnp.asarray(verts),
        faces=jnp.asarray(faces),
        material=jnp.asarray(mat),
        materials=materials,
        emitters=emitters,
        medium=medium,
        camera=camera,
    )
