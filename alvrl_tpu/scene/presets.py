"""Benchmark scene constructors (BASELINE.json configs).

The reference ships no scenes in-repo (they live on the project website),
so these are self-contained reconstructions of the benchmark
configurations: a Cornell box filled with a homogeneous scattering
medium, a single point emitter, camera inside the medium.
"""

from __future__ import annotations

import jax
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

    verts, faces, mat, _ = shapes.merge(parts)

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


def cornell_nested_smoke(width=64, height=64, cube_half=0.5,
                         sigma_s=(0.8, 0.8, 0.8),
                         sigma_a=(0.05, 0.05, 0.05), g=0.0,
                         exterior=None, **kwargs):
    """Cornell box with VACUUM (or `exterior`) outside and a smoke-filled
    null-boundary cube at the center — the per-shape nested-media
    fixture (interior/exterior medium references of the reference's
    Shape + null BSDF, scene.cpp:619-679)."""
    from alvrl_tpu.media.table import make_media_table
    from alvrl_tpu.scene.scene import NULL

    base = cornell_smoke(width=width, height=height,
                         with_blocker=False, **kwargs)

    cv, cf = shapes.cube()
    cv = cv * np.float32(cube_half)
    n_v = base.vertices.shape[0]
    n_f = base.faces.shape[0]
    verts = jnp.concatenate([base.vertices, jnp.asarray(cv)], axis=0)
    faces = jnp.concatenate(
        [base.faces, jnp.asarray(cf) + n_v], axis=0)

    mats = base.materials
    null_id = mats.kind.shape[0]
    mats = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a[-1:]], axis=0), mats
    ).replace(
        kind=jnp.concatenate(
            [mats.kind, jnp.asarray([NULL], jnp.int32)]),
    )
    material = jnp.concatenate(
        [base.material, jnp.full((cf.shape[0],), null_id, jnp.int32)])

    if exterior is None:
        ext_a = ext_s = (0.0, 0.0, 0.0)
        ext_g = 0.0
    else:
        ext_a, ext_s, ext_g = exterior
    media = make_media_table(
        sigma_a=[list(ext_a), list(sigma_a)],
        sigma_s=[list(ext_s), list(sigma_s)],
        g=[ext_g, g],
    )
    face_med_int = jnp.concatenate([
        jnp.zeros((n_f,), jnp.int32),
        jnp.ones((cf.shape[0],), jnp.int32),
    ])
    face_med_ext = jnp.zeros((faces.shape[0],), jnp.int32)
    from alvrl_tpu.integrators.surface import vacuumize

    return vacuumize(base).replace(
        vertices=verts, faces=faces, material=material,
        materials=mats, media=media,
        face_med_int=face_med_int, face_med_ext=face_med_ext,
        face_emitter=jnp.full((faces.shape[0],), -1, jnp.int32),
        face_uv=jnp.zeros((faces.shape[0], 3, 2), jnp.float32),
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


def cornell_area_light(width=64, height=64, radiance=(6.0, 6.0, 6.0),
                       half=0.25, **kwargs):
    """Cornell smoke with a ceiling quad area light (area.cpp analog):
    the emitter quad is real geometry (eye rays see it) and two AREA
    entries in the emitter table."""
    import numpy as _np

    from alvrl_tpu.emitters.emitters import AREA, make_emitters

    base = cornell_smoke(width=width, height=height, **kwargs)
    y = 0.999
    p0 = _np.array([-half, y, -half], _np.float32)
    e1 = _np.array([2 * half, 0, 0], _np.float32)
    e2 = _np.array([0, 0, 2 * half], _np.float32)
    # quad -> two triangles, both wound so the face normal
    # cross(edge1, edge2) points DOWN (-y, into the box)
    quad_v = _np.stack([p0, p0 + e1, p0 + e2, p0 + e1 + e2])
    quad_f = _np.array([[0, 1, 2], [3, 2, 1]], _np.int32)

    n_v = base.vertices.shape[0]
    verts = jnp.concatenate([base.vertices, jnp.asarray(quad_v)], axis=0)
    faces = jnp.concatenate(
        [base.faces, jnp.asarray(quad_f) + n_v], axis=0
    )
    # emitter quad surface: black diffuse (material 0 with zero albedo
    # would dim walls; append a dedicated material)
    mats = base.materials
    mats = mats.replace(
        kind=jnp.concatenate([mats.kind, jnp.asarray([DIFFUSE])]),
        albedo=jnp.concatenate([mats.albedo, jnp.zeros((1, 3))]),
        eta=jnp.concatenate([mats.eta, jnp.ones((1,))]),
        alpha=jnp.concatenate([mats.alpha, jnp.asarray([0.1])]),
        tex_kind=jnp.concatenate([mats.tex_kind, jnp.asarray([0], jnp.int32)]),
        tex_scale=jnp.concatenate([mats.tex_scale, jnp.ones((1,))]),
        albedo2=jnp.concatenate([mats.albedo2, jnp.zeros((1, 3))]),
    )
    mat_ids = jnp.concatenate(
        [base.material,
         jnp.full((2,), mats.kind.shape[0] - 1, jnp.int32)]
    )
    # emitter-entry edges match the geometry winding: cross(e1, e2) = -y
    emitters = make_emitters(
        [AREA, AREA],
        [p0, p0 + e1 + e2],
        [list(radiance)] * 2,
        tri_e1=[e1, -e1],
        tri_e2=[e2, -e2],
    )
    face_emitter = jnp.concatenate([
        jnp.full((base.faces.shape[0],), -1, jnp.int32),
        jnp.asarray([0, 1], jnp.int32),
    ])
    return base.replace(
        vertices=verts, faces=faces, material=mat_ids, materials=mats,
        emitters=emitters, face_emitter=face_emitter,
    )
