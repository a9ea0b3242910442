"""Deformable shapes + motion blur + motion vectors
(shapes/deformable.cpp, misc/motion.cpp)."""

import jax
import numpy as np
import pytest

from alvrl_tpu.integrators import motion
from alvrl_tpu.scene import loader


def _moving_scene(dx=0.6, w=24, h=24):
    """A small rectangle that translates by dx in x over the shutter."""
    t0 = [[0.5, 0, 0, 0], [0, 0.5, 0, 0], [0, 0, 1, 2.0], [0, 0, 0, 1]]
    t1 = [[0.5, 0, 0, dx], [0, 0.5, 0, 0], [0, 0, 1, 2.0], [0, 0, 0, 1]]
    desc = {
        "camera": {"origin": [0, 0, 0], "target": [0, 0, 1],
                   "up": [0, 1, 0], "fov_x_deg": 60.0,
                   "width": w, "height": h},
        "materials": [{"name": "m", "type": "diffuse",
                       "albedo": [0.8, 0.8, 0.8]}],
        "shapes": [{"type": "rectangle", "material": "m",
                    "to_world": t0, "to_world_t1": t1}],
        "emitters": [{"type": "point", "position": [0, 1, 0.5],
                      "intensity": [6, 6, 6]}],
    }
    return loader.build_scene(desc)


def test_loader_builds_keyframe():
    scene = _moving_scene()
    assert scene.vertices_t1 is not None
    v0 = np.asarray(scene.vertices)
    v1 = np.asarray(scene.vertices_t1)
    np.testing.assert_allclose(v1 - v0,
                               np.broadcast_to([0.6, 0, 0], v0.shape),
                               atol=1e-5)


def test_motion_vectors_primary_hit():
    scene = _moving_scene(dx=0.6)
    mv = np.asarray(motion.render_motion_vectors(scene))
    hitm = np.isfinite(mv[..., 0])
    assert hitm.any() and (~hitm).any()
    # the quad moves +x in world => its image moves right => positive
    # pixel-x motion, ~zero y motion, camera distance increases
    assert mv[..., 0][hitm].min() > 0
    assert np.abs(mv[..., 1][hitm]).max() < np.abs(mv[..., 0][hitm]).mean()
    # net +x translation moves the quad off-axis: distance to the camera
    # grows on average (left-edge points may move closer; that's correct)
    assert mv[..., 2][hitm].mean() > 0
    # magnitude sanity: dx=0.6 at z=2 with fov 60, w=24:
    # pixels-per-world-x at depth 2 = w / (2*2*tan30) ~ 10.4 -> ~6.2 px
    mean_px = mv[..., 0][hitm].mean()
    assert 3.0 < mean_px < 10.0, mean_px


def test_motion_blur_smears():
    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.integrators.surface import vacuumize

    scene = vacuumize(_moving_scene(dx=1.2, w=16, h=8))

    def render_one(s, key):
        return volpath.render_volpath(
            s, key, spp=1,
            cfg=volpath.VolpathConfig(max_depth=2, only_vrl_paths=False))

    img_blur = np.asarray(motion.render_motion_blur(
        scene, jax.random.key(0), render_one, spp=8))
    img_t0 = np.asarray(render_one(motion.scene_at_time(scene, 0.0),
                                   jax.random.key(1)))
    assert np.isfinite(img_blur).all()
    # the smeared image covers columns the t0 frame leaves dark
    col_t0 = img_t0.mean(axis=(0, 2))
    col_bl = img_blur.mean(axis=(0, 2))
    right = col_t0 < 1e-6  # columns with no geometry at t0
    assert right.any()
    assert col_bl[right].max() > 1e-4
