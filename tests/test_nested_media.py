"""Per-shape nested media (media/table.py): boundary-crossing
transmittance and medium tracking in volpath, validated against an
analytic chord and against two independent oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from alvrl_tpu.integrators import volpath
from alvrl_tpu.media import table as mtbl
from alvrl_tpu.scene import presets

CFG = volpath.VolpathConfig(max_depth=8, only_vrl_paths=False)


def test_nested_transmittance_analytic():
    """Straight segment through the centered absorbing cube: tau must
    be exp(-sigma_t * chord) with chord = cube edge."""
    sig = (0.7, 0.5, 0.3)
    scene = presets.cornell_nested_smoke(
        width=8, height=8, cube_half=0.5, sigma_a=sig,
        sigma_s=(0.0, 0.0, 0.0),
    )
    p0 = jnp.array([0.0, 0.0, -0.9])
    p1 = jnp.array([0.0, 0.0, 0.9])
    tau = np.asarray(
        mtbl.eval_transmittance_nested(scene, p0, p1, jnp.int32(0)))
    expect = np.exp(-np.asarray(sig) * 1.0)  # chord = 2*0.5
    np.testing.assert_allclose(tau, expect, rtol=2e-3)

    # start INSIDE the cube: half chord
    p_in = jnp.array([0.0, 0.0, 0.0])
    tau2 = np.asarray(
        mtbl.eval_transmittance_nested(scene, p_in, p1, jnp.int32(1)))
    np.testing.assert_allclose(
        tau2, np.exp(-np.asarray(sig) * 0.5), rtol=2e-3)

    # opaque wall in between -> 0
    p_out = jnp.array([0.0, 0.0, 2.5])
    tau3 = np.asarray(
        mtbl.eval_transmittance_nested(scene, p0, p_out, jnp.int32(0)))
    np.testing.assert_allclose(tau3, 0.0)


def test_nested_noop_crossing_matches_global():
    """Null cube whose interior medium EQUALS the exterior: the
    crossing machinery must reproduce the single-global-medium render."""
    sig_s, sig_a = (0.8, 0.8, 0.8), (0.05, 0.05, 0.05)
    nested = presets.cornell_nested_smoke(
        width=10, height=10, sigma_s=sig_s, sigma_a=sig_a,
        exterior=(sig_a, sig_s, 0.0),
    )
    ref = presets.cornell_smoke(width=10, height=10, with_blocker=False,
                                sigma_s=sig_s, sigma_a=sig_a)
    img_n = np.mean([np.asarray(volpath.render_volpath(
        nested, jax.random.key(i), spp=160, cfg=CFG, ray_tile=100))
        for i in range(3)], axis=0)
    img_r = np.mean([np.asarray(volpath.render_volpath(
        ref, jax.random.key(10 + i), spp=160, cfg=CFG, ray_tile=100))
        for i in range(3)], axis=0)
    assert np.isfinite(img_n).all()
    ratio = img_n.mean() / img_r.mean()
    # single-seed ratios spread ~0.92-1.02 at this budget (NEE 1/d^2
    # spikes near the point light); 3-seed averages tighten to ~3%
    assert 0.90 < ratio < 1.10, ratio


def test_nested_smoke_cube_vs_grid_oracle():
    """Smoke confined to a null cube (nested homogeneous) vs the SAME
    density as a global grid medium — two independent code paths."""
    from alvrl_tpu.media.heterogeneous import make_grid_medium

    sig_s, sig_a = (0.9, 0.9, 0.9), (0.1, 0.1, 0.1)
    nested = presets.cornell_nested_smoke(
        width=10, height=10, cube_half=0.5, sigma_s=sig_s, sigma_a=sig_a)

    # grid: density 1 inside [-0.5, 0.5]^3, 0 outside; boundary lands
    # exactly on voxel centers of a box-aligned grid
    r = 64
    xs = np.linspace(-1, 1, r)
    inside = (np.abs(xs) <= 0.5).astype(np.float32)
    dens = (inside[:, None, None] * inside[None, :, None]
            * inside[None, None, :])
    sigma_t = np.asarray(sig_s) + np.asarray(sig_a)
    grid_scene = presets.cornell_smoke(
        width=10, height=10, with_blocker=False).replace(
        medium=make_grid_medium(
            dens, sigma_t.tolist(),
            (np.asarray(sig_s) / sigma_t).tolist(), g=0.0),
    )
    img_n = np.asarray(volpath.render_volpath(
        nested, jax.random.key(0), spp=200, cfg=CFG, ray_tile=100))
    img_g = np.asarray(volpath.render_volpath(
        grid_scene, jax.random.key(1), spp=200, cfg=CFG, ray_tile=100))
    assert np.isfinite(img_n).all() and np.isfinite(img_g).all()
    ratio = img_n.mean() / img_g.mean()
    # trilinear smoothing softens the grid's cube edge -> wider band
    assert 0.85 < ratio < 1.15, ratio
