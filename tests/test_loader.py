"""Scene loader + mesh I/O tests."""

import numpy as np

from alvrl_tpu.io import mesh as mesh_io
from alvrl_tpu.scene import loader

SCENE = {
    "camera": {"type": "perspective", "origin": [0, 0, -0.99],
               "target": [0, 0, 1], "fov": 90, "width": 8, "height": 8},
    "medium": {"type": "homogeneous", "sigma_s": [0.6] * 3,
               "sigma_a": [0.05] * 3, "g": 0.3},
    "materials": [
        {"name": "white", "type": "diffuse", "albedo": [0.7, 0.7, 0.7]},
        {"name": "glass", "type": "dielectric", "eta": 1.5},
    ],
    "shapes": [
        {"type": "cube", "material": "white", "flip_normals": True},
        {"type": "sphere", "material": "glass", "center": [0, 0, 0.3],
         "radius": 0.2, "n_theta": 4, "n_phi": 8},
    ],
    "emitters": [
        {"type": "point", "position": [0, 0.8, 0], "intensity": [5, 5, 5]},
    ],
}


def test_build_scene_from_dict():
    scene = loader.load_json(SCENE)
    assert scene.camera.width == 8
    assert scene.num_tris > 12
    assert float(scene.medium.g) == np.float32(0.3)
    assert scene.materials.kind.shape[0] == 2


def test_scene_renders(tmp_path):
    import jax

    from alvrl_tpu.integrators.vrl import integrator, tracer
    from alvrl_tpu.integrators.vrl.integrate import VRLConfig

    scene = loader.load_json(SCENE)
    img, vrls = integrator.render_unclustered(
        scene, jax.random.key(0), num_particles=16,
        cfg=VRLConfig(vrl_chunk=16),
        tracer_cfg=tracer.TracerConfig(max_depth=4), ray_tile=64,
    )
    assert bool(np.isfinite(np.asarray(img)).all())


def test_defines_substitution(tmp_path):
    import json

    p = tmp_path / "s.json"
    desc = dict(SCENE)
    p.write_text(json.dumps(desc).replace('"fov": 90', '"fov": $fov'))
    scene = loader.load_json(str(p), defines={"fov": 45})
    assert abs(float(scene.camera.fov_x_deg) - 45.0) < 1e-6


def test_obj_roundtrip(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2/1 4/2 3/3\n"
    )
    v, f = mesh_io.load_obj(str(p))
    assert v.shape == (4, 3)
    assert f.shape == (2, 3)
    np.testing.assert_array_equal(f[1], [1, 3, 2])


def test_ply_ascii(tmp_path):
    p = tmp_path / "tri.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
    )
    v, f = mesh_io.load_ply(str(p))
    assert v.shape == (3, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_ply_binary(tmp_path):
    import struct

    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"element face 1\nproperty list uchar int vertex_indices\n"
        b"end_header\n"
    )
    body = b"".join(
        struct.pack("<fff", *v) for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    ) + struct.pack("<Biii", 3, 0, 1, 2)
    p = tmp_path / "b.ply"
    p.write_bytes(header + body)
    v, f = mesh_io.load_ply(str(p))
    assert v.shape == (3, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_mitsuba_xml_convert(tmp_path):
    xml = """<scene version="0.5.0">
    <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
            <lookat origin="0, 0, -1" target="0, 0, 1" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="16"/>
            <integer name="height" value="16"/>
        </film>
    </sensor>
    <bsdf type="diffuse" id="walls">
        <rgb name="reflectance" value="0.7, 0.6, 0.5"/>
    </bsdf>
    <shape type="cube">
        <ref id="walls"/>
    </shape>
    <emitter type="point">
        <point name="position" x="0" y="0.5" z="0"/>
        <rgb name="intensity" value="4, 4, 4"/>
    </emitter>
    <medium type="homogeneous" id="med">
        <rgb name="sigmaS" value="0.5, 0.5, 0.5"/>
        <rgb name="sigmaA" value="0.02, 0.02, 0.02"/>
        <phase type="hg"><float name="g" value="0.4"/></phase>
    </medium>
    </scene>"""
    p = tmp_path / "scene.xml"
    p.write_text(xml)
    desc = loader.convert_mitsuba_xml(str(p))
    scene = loader.build_scene(desc)
    assert scene.camera.width == 16
    assert abs(float(scene.medium.g) - 0.4) < 1e-6
    assert scene.num_tris == 12
