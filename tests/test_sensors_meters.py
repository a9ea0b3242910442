"""New sensor kinds (telecentric, perspective_rdist) + measurement
sensors (irradiancemeter/fluencemeter), and the .serialized loader."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.scene.scene import (
    PERSPECTIVE_RDIST,
    TELECENTRIC,
    Camera,
    look_at,
)
from alvrl_tpu.sensors import perspective


def _cam(kind, **kw):
    return Camera(
        to_world=look_at([0, 0, -2], [0, 0, 0], [0, 1, 0]),
        fov_x_deg=jnp.float32(60.0), width=8, height=8, kind=kind, **kw)


def test_telecentric_rays():
    cam = _cam(TELECENTRIC, ortho_scale=1.0, aperture_radius=0.0,
               focus_distance=2.0)
    px = jnp.asarray([0.0, 7.0])
    py = jnp.asarray([0.0, 7.0])
    o, d = perspective.sample_ray(cam, px, py)
    # zero aperture: parallel rays along +z, offset origins
    np.testing.assert_allclose(np.asarray(d), [[0, 0, 1], [0, 0, 1]],
                               atol=1e-5)
    assert abs(float(o[0, 0]) - float(o[1, 0])) > 0.5
    # finite aperture: rays from different lens points converge at the
    # focus plane
    cam2 = _cam(TELECENTRIC, ortho_scale=1.0, aperture_radius=0.2,
                focus_distance=2.0)
    o1, d1 = perspective.sample_ray(
        cam2, px[:1], py[:1], lens_uv=jnp.asarray([[0.9, 0.1]]))
    o2, d2 = perspective.sample_ray(
        cam2, px[:1], py[:1], lens_uv=jnp.asarray([[0.9, 0.7]]))
    t1 = (0.0 - o1[0, 2]) / d1[0, 2]
    t2 = (0.0 - o2[0, 2]) / d2[0, 2]
    f1 = o1[0] + t1 * d1[0]
    f2 = o2[0] + t2 * d2[0]
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_perspective_rdist():
    cam0 = _cam(PERSPECTIVE_RDIST, kc0=0.0, kc1=0.0)
    camd = _cam(PERSPECTIVE_RDIST, kc0=0.3, kc1=0.0)
    px = jnp.asarray([7.0])
    py = jnp.asarray([7.0])
    o0, d0 = perspective.sample_ray(cam0, px, py)
    od, dd = perspective.sample_ray(camd, px, py)
    # center ray unchanged, corner ray pushed outward (barrel)
    pc = jnp.asarray([4.0])  # ndc exactly 0 with zero jitter
    _, dc0 = perspective.sample_ray(cam0, pc, pc, jitter=jnp.zeros((1, 2)))
    _, dcd = perspective.sample_ray(camd, pc, pc, jitter=jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(dc0), np.asarray(dcd), atol=1e-6)
    ang0 = np.arccos(float(d0[0, 2]))
    angd = np.arccos(float(dd[0, 2]))
    assert angd > ang0 + 0.02, (ang0, angd)


def test_irradiance_closed_form():
    """Point light in a vacuum box: E at a floor point facing the light
    must be I * cos(theta) / d^2."""
    from alvrl_tpu.integrators.surface import vacuumize
    from alvrl_tpu.scene import presets
    from alvrl_tpu.sensors import meters

    scene = vacuumize(presets.cornell_smoke(
        width=4, height=4, with_blocker=False, intensity=(5.0, 5.0, 5.0)))
    p = jnp.asarray([0.0, -0.999, 0.2])
    n = jnp.asarray([0.0, 1.0, 0.0])
    light = np.asarray([0.0, 0.75, 0.2])
    e = np.asarray(meters.irradiance(scene, p, n, jax.random.key(0),
                                     spp=2048))
    d2 = np.sum((light - np.asarray(p)) ** 2)
    cos = (light[1] - float(p[1])) / np.sqrt(d2)
    direct = 5.0 * cos / d2
    # the delta-direct term is exact; hemisphere MC adds the (positive,
    # bounded) interreflection on top
    assert (e > direct).all(), (e, direct)
    assert (e < direct * 4.0).all(), (e, direct)


def test_fluence_positive_and_finite():
    from alvrl_tpu.scene import presets
    from alvrl_tpu.sensors import meters

    scene = presets.cornell_smoke(width=4, height=4, with_blocker=False)
    phi = np.asarray(meters.fluence(
        scene, jnp.zeros(3), jax.random.key(1), spp=512))
    assert np.isfinite(phi).all() and (phi > 0).all()
