"""Surface-only integrators: `path` and `direct`.

Counterpart of src/integrators/path/path.cpp and
src/integrators/direct/direct.cpp. In this framework a vacuum medium
(sigma_t = 0, samplingWeight 0) makes the volumetric path tracer
degenerate exactly into a surface path tracer — medium events never
fire — so `path` is volpath over the vacuumized scene, and `direct` is
the same with max_depth=2 (camera vertex + one surface vertex + NEE).
"""

from __future__ import annotations

import jax.numpy as jnp

from alvrl_tpu.integrators import volpath
from alvrl_tpu.media.homogeneous import HomogeneousMedium
from alvrl_tpu.scene.scene import Scene


def vacuumize(scene: Scene) -> Scene:
    """Replace the medium with vacuum (no absorption, no scattering)."""
    vac = HomogeneousMedium(
        sigma_a=jnp.zeros(3),
        sigma_s=jnp.zeros(3),
        g=jnp.float32(0.0),
        sampling_weight=jnp.float32(0.0),
    )
    return scene.replace(medium=vac)


def render_path(scene: Scene, key, spp: int = 16, max_depth: int = 16,
                ray_tile: int = 4096):
    """Surface path tracing with NEE (the `path` plugin)."""
    cfg = volpath.VolpathConfig(
        max_depth=max_depth, only_vrl_paths=False,
    )
    return volpath.render_volpath(
        vacuumize(scene), key, spp=spp, cfg=cfg, ray_tile=ray_tile
    )


def render_direct(scene: Scene, key, spp: int = 16, ray_tile: int = 4096):
    """Direct illumination only (the `direct` plugin)."""
    cfg = volpath.VolpathConfig(
        max_depth=1, only_vrl_paths=False,
    )
    return volpath.render_volpath(
        vacuumize(scene), key, spp=spp, cfg=cfg, ray_tile=ray_tile
    )
