"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: the environment pre-imports jax via a sitecustomize hook that
registers the TPU tunnel backend and pins JAX_PLATFORMS=axon, so plain
env-var overrides are too late — we must go through jax.config before
the first backend use. Tests must run on CPU: the tunnel admits one
client at a time, and a second process deadlocks it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; reconfigure)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()


# ---------------------------------------------------------------------------
# Suite split (VERDICT r03 "what's weak" #5): heavy files carry a
# `slow` marker so `pytest -m "not slow"` is a fast smoke subset and
# the full suite can be chunked deliberately. The list is measured, not
# guessed — see VALIDATION.md "test-suite recipe" for per-file wall
# times; re-measure with `pytest --durations=0` when adding heavy
# tests.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

SLOW_FILES = {
    # >2 min each on the 2-vCPU CI box (measured round 4)
    "test_ab_oracle.py",
    "test_adaptive.py",
    "test_bdpt.py",
    "test_bvh.py",
    "test_components.py",
    "test_dipole.py",
    "test_erpt.py",
    "test_hetero_pallas.py",
    "test_heterogeneous.py",
    "test_irawan.py",
    "test_irrcache.py",
    "test_media.py",
    "test_mlt.py",
    "test_sds.py",
    "test_multihost.py",
    "test_nested_media.py",
    "test_oriented_media.py",
    "test_pallas_bwd.py",
    "test_parallel.py",
    "test_photonmap.py",
    "test_pssmlt.py",
    "test_render.py",
    "test_round3_plugins.py",
    "test_volpath.py",
    "test_volpath_mis.py",
    "test_vpl.py",
    # measured >30 s in the round-4 smoke run (pytest --durations);
    # moved here so the smoke subset stays a genuine quick gate
    "test_tracer_gradients.py",
    "test_solvers_quadrature.py",
    "test_ptracer.py",
    "test_bsdf.py",
    "test_motion.py",
    "test_sensors_meters.py",
    "test_loader_extended.py",
    "test_image_decode.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tests excluded from the smoke subset "
        "(run `pytest -m 'not slow'` for <5 min feedback)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
