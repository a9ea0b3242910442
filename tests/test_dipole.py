"""Dipole subsurface scattering (src/subsurface/dipole.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators import dipole
from alvrl_tpu.scene import presets


def _params(sig_s=(2.0, 2.0, 2.0), sig_a=(0.05, 0.1, 0.2), g=0.0,
            eta=1.3):
    return dipole.DipoleParams(
        sigma_s=jnp.asarray(sig_s), sigma_a=jnp.asarray(sig_a),
        g=jnp.float32(g), eta=jnp.float32(eta))


def test_rd_profile_integrates_to_total_reflectance():
    """int Rd(r) 2 pi r dr must match the closed-form total diffuse
    reflectance of the dipole."""
    p = _params()
    r = np.linspace(1e-4, 40.0, 200_000)
    rd = np.asarray(jax.vmap(lambda rr: dipole.rd_profile(p, rr))(
        jnp.asarray(r, jnp.float32)))
    integral = (rd * (2 * np.pi * r)[:, None]).sum(0) * (r[1] - r[0])
    total = np.asarray(dipole.rd_total(p))
    np.testing.assert_allclose(integral, total, rtol=0.02)


def test_rd_profile_monotone_decreasing():
    p = _params()
    r = jnp.asarray([0.01, 0.1, 0.5, 1.0, 3.0])
    rd = np.asarray(jax.vmap(lambda rr: dipole.rd_profile(p, rr))(r))
    assert (np.diff(rd[:, 0]) < 0).all()
    assert (rd > 0).all()


def test_render_dipole_blocker_translucent():
    """Mark the cornell blocker box as subsurface: the render is
    finite, the marked region glows, and more absorption darkens it."""
    scene = presets.cornell_smoke(width=16, height=16,
                                  with_blocker=True)
    from alvrl_tpu.integrators.surface import vacuumize

    scene = vacuumize(scene)
    mask = (scene.material == 3).astype(jnp.float32)  # M_BOX faces
    img = np.asarray(dipole.render_dipole(
        scene, mask, _params(), jax.random.key(0), n_samples=1024,
        chunk=512))
    assert np.isfinite(img).all()
    assert img.mean() > 0
    # the subsurface region must carry energy (the blocker occupies
    # the lower-left image area in this fixture)
    assert img[8:, :8].mean() > 0
    # absorption ordering holds analytically (the discrete Mo sum near
    # the r->0 peak is sample-limited, so assert on rd_total)
    t_light = np.asarray(dipole.rd_total(_params()))
    t_dark = np.asarray(dipole.rd_total(_params(sig_a=(1.5, 1.5, 1.5))))
    assert (t_dark < t_light).all()
