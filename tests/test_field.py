"""Field-extraction + multichannel integrators
(misc/field.cpp, misc/multichannel.cpp)."""

import numpy as np
import pytest

from alvrl_tpu.integrators import field as field_mod
from alvrl_tpu.integrators import multichannel as mc
from alvrl_tpu.io import exr
from alvrl_tpu.scene import loader


@pytest.fixture(scope="module")
def open_scene():
    """A floor rectangle + a small sphere; rays at the image top escape."""
    desc = {
        "camera": {
            "origin": [0, 1.0, -3.0], "target": [0, 0.0, 0.0],
            "up": [0, 1, 0], "fov_x_deg": 60.0,
            "width": 24, "height": 24,
        },
        "materials": [
            {"name": "white", "type": "diffuse", "albedo": [0.7, 0.5, 0.3]},
        ],
        "shapes": [
            {"type": "rectangle", "material": "white",
             "to_world": [[4, 0, 0, 0], [0, 0, 4, 0], [0, -1, 0, -1],
                          [0, 0, 0, 1]]},
            {"type": "sphere", "material": "white", "center": [0, -0.4, 0],
             "radius": 0.6},
        ],
        "emitters": [
            {"type": "point", "position": [0, 3, 0], "intensity": [5, 5, 5]},
        ],
    }
    return loader.build_scene(desc)


def test_distance_and_position_consistent(open_scene):
    pos = np.asarray(field_mod.render_field(open_scene, "position"))
    dist = np.asarray(field_mod.render_field(open_scene, "distance",
                                             undefined=-1.0))
    sid = np.asarray(field_mod.render_field(open_scene, "shapeIndex",
                                            undefined=-1.0))
    valid = dist[..., 0] > 0
    assert valid.any() and (~valid).any()  # some rays escape
    assert (dist[..., 0][~valid] == -1.0).all()
    # position distance from the camera origin == reported distance
    cam_o = np.array([0, 1.0, -3.0])
    d = np.linalg.norm(pos - cam_o, axis=-1)
    np.testing.assert_allclose(d[valid], dist[..., 0][valid], rtol=2e-3)
    # both shapes visible, ids are 0 (floor) and 1 (sphere)
    ids = set(np.unique(sid[..., 0][valid]).tolist())
    assert ids == {0.0, 1.0}


def test_normals_unit_and_facing(open_scene):
    gn = np.asarray(field_mod.render_field(open_scene, "geoNormal"))
    sn = np.asarray(field_mod.render_field(open_scene, "shNormal"))
    dist = np.asarray(field_mod.render_field(open_scene, "distance"))
    valid = dist[..., 0] > 0
    norms = np.linalg.norm(gn[valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # no normal maps in this scene: shNormal is the oriented geo normal
    assert np.abs(np.abs(sn[valid]) - np.abs(gn[valid])).max() < 1e-5


def test_albedo_and_uv(open_scene):
    alb = np.asarray(field_mod.render_field(open_scene, "albedo"))
    uv = np.asarray(field_mod.render_field(open_scene, "uv"))
    dist = np.asarray(field_mod.render_field(open_scene, "distance"))
    valid = dist[..., 0] > 0
    np.testing.assert_allclose(
        alb[valid], np.broadcast_to([0.7, 0.5, 0.3], alb[valid].shape),
        atol=1e-6)
    assert (uv[valid][:, :2] >= -1e-5).all()
    assert (uv[valid][:, :2] <= 1.0 + 1e-5).all()
    assert (uv[..., 2] == 0).all()


def test_multichannel_exr_roundtrip(open_scene, tmp_path):
    channels = mc.render_multichannel(
        open_scene,
        [
            ("depth", "field:distance"),
            ("normal", "field:geoNormal"),
            ("albedo", "field:albedo"),
        ],
    )
    assert set(channels) == {
        "depth.R", "depth.G", "depth.B",
        "normal.R", "normal.G", "normal.B",
        "albedo.R", "albedo.G", "albedo.B",
    }
    p = tmp_path / "mc.exr"
    mc.write_multichannel_exr(p, channels)
    back, names = exr.read_exr(p)
    assert sorted(names) == names  # EXR stores channels alphabetically
    i = names.index("depth.R")
    np.testing.assert_allclose(
        back[..., i],
        np.asarray(channels["depth.R"], np.float32).astype(
            np.float16).astype(np.float32))
