"""Photon mapping tests: the progressive estimator must agree with the
volumetric path tracer (consistency of density estimation)."""

import jax
import numpy as np

from alvrl_tpu.integrators import photonmap, volpath
from alvrl_tpu.integrators.vrl.tracer import TracerConfig
from alvrl_tpu.scene import presets


def test_photon_tracing_deposits():
    scene = presets.cornell_smoke(width=8, height=8)
    pm = photonmap.trace_photons(scene, jax.random.key(0), 64,
                                 TracerConfig(max_depth=8))
    assert int(np.asarray(pm.v_valid).sum()) > 50
    assert int(np.asarray(pm.s_valid).sum()) > 10
    for a in [pm.v_power, pm.s_power]:
        v = np.asarray(a)
        assert np.isfinite(v).all() and (v >= 0).all()


def test_ppm_matches_volpath():
    scene = presets.cornell_smoke(width=10, height=10)
    img = photonmap.render_ppm(
        scene, jax.random.key(0), n_passes=5, photons_per_pass=1024,
        r0_surface=0.15, r0_volume=0.22,
        cfg=TracerConfig(max_depth=10), march_steps=16,
    )
    o = np.asarray(volpath.render_volpath(
        scene, jax.random.key(9), spp=128,
        cfg=volpath.VolpathConfig(max_depth=10, only_vrl_paths=False),
        ray_tile=100,
    ))
    assert np.isfinite(img).all()
    ratio = img.mean() / o.mean()
    assert 0.88 < ratio < 1.12, ratio


def test_hash_grid_matches_dense_gather():
    """The hash-grid gather must reproduce the dense O(B*N) sweep
    exactly when k_per_cell is large enough."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alvrl_tpu.integrators import photonmap as pmod
    from alvrl_tpu.scene import presets
    from alvrl_tpu.integrators.surface import vacuumize

    scene = vacuumize(presets.cornell_smoke(width=8, height=8))
    rng_np = np.random.default_rng(3)
    n = 600
    pos = rng_np.uniform(-1, 1, (n, 3)).astype(np.float32)
    wi = rng_np.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    power = rng_np.uniform(0, 1, (n, 3)).astype(np.float32)
    valid = rng_np.uniform(size=n) < 0.9
    pm = pmod.PhotonMap(
        s_pos=jnp.asarray(pos), s_wi=jnp.asarray(wi),
        s_power=jnp.asarray(power), s_valid=jnp.asarray(valid),
        v_pos=jnp.asarray(pos), v_wi=jnp.asarray(wi),
        v_power=jnp.asarray(power), v_valid=jnp.asarray(valid),
        n_emitted=jnp.float32(64.0),
    )
    radius = 0.25
    q = rng_np.uniform(-0.9, 0.9, (40, 3)).astype(np.float32)
    q_w = rng_np.normal(size=(40, 3)).astype(np.float32)
    q_w /= np.linalg.norm(q_w, axis=1, keepdims=True)
    dense = np.asarray(pmod.volume_estimate(
        scene, pm, jnp.asarray(q), jnp.asarray(q_w), radius))
    grid = pmod.build_hash_grid(pm.v_pos, pm.v_valid, radius)
    fast = np.asarray(pmod.volume_estimate_grid(
        scene, pm, grid, jnp.asarray(q), jnp.asarray(q_w), radius,
        k_per_cell=64))
    np.testing.assert_allclose(fast, dense, rtol=2e-4, atol=1e-7)

    # surface variant
    q_ng = np.tile(np.array([0, 1, 0], np.float32), (40, 1))
    q_mat = jnp.zeros((40,), jnp.int32)
    dense_s = np.asarray(pmod.surface_estimate(
        scene, pm, jnp.asarray(q), jnp.asarray(q_w), jnp.asarray(q_ng),
        q_mat, radius))
    grid_s = pmod.build_hash_grid(pm.s_pos, pm.s_valid, radius)
    fast_s = np.asarray(pmod.surface_estimate_grid(
        scene, pm, grid_s, jnp.asarray(q), jnp.asarray(q_w),
        jnp.asarray(q_ng), q_mat, radius, k_per_cell=64))
    np.testing.assert_allclose(fast_s, dense_s, rtol=2e-4, atol=1e-7)
