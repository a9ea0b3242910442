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
    Scene,
    look_at,
    make_materials,
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

    materials = make_materials(
        [DIFFUSE] * 4,
        [
            [0.725, 0.71, 0.68],   # white
            [0.63, 0.065, 0.05],   # red
            [0.14, 0.45, 0.091],   # green
            [0.725, 0.71, 0.68],   # blocker
        ],
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


def cornell_smoke_hg(width=256, height=256, g=0.8):
    """BASELINE config 3: anisotropic HG phase (g=0.8) exercising the
    volSurfSamples surface-coupling path."""
    return cornell_smoke(
        width=width, height=height, g=g,
        sigma_s=(0.6, 0.6, 0.6), sigma_a=(0.04, 0.04, 0.04),
    )


def cornell_grid_smoke(width=512, height=512, grid_res=48):
    """BASELINE config 4: heterogeneous grid-volume smoke with textured
    sigma_t (a turbulent plume-like density), clustered VRLs."""
    import numpy as _np

    from alvrl_tpu.media.heterogeneous import make_grid_medium

    base = cornell_smoke(width=width, height=height, with_blocker=False)
    r = grid_res
    z, y, x = _np.meshgrid(
        _np.linspace(-1, 1, r), _np.linspace(-1, 1, r),
        _np.linspace(-1, 1, r), indexing="ij",
    )
    # plume: vertical gaussian column + pseudo-turbulence harmonics
    rad2 = x ** 2 + z ** 2
    plume = _np.exp(-6.0 * rad2 / (0.35 + 0.65 * (y + 1) / 2))
    turb = (
        0.5 * _np.sin(7 * x + 5 * y) * _np.cos(6 * z - 4 * y)
        + 0.3 * _np.sin(13 * z + 11 * x)
    )
    dens = _np.clip(plume * (1.0 + 0.5 * turb), 0.0, None) * 2.5
    medium = make_grid_medium(
        dens.astype(_np.float32), [1.0, 1.05, 1.1], [0.92, 0.92, 0.92],
        g=0.3,
    )
    return base.replace(medium=medium)
