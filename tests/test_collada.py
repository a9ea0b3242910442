"""COLLADA import subset (scene/collada.py — mtsimport parity,
VERDICT r03 item 7; reference: src/converter/collada.cpp)."""

import numpy as np

DAE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis></asset>
  <library_effects>
    <effect id="red-fx">
      <profile_COMMON><technique sid="common">
        <lambert>
          <diffuse><color>0.8 0.1 0.1 1</color></diffuse>
        </lambert>
      </technique></profile_COMMON>
    </effect>
    <effect id="shiny-fx">
      <profile_COMMON><technique sid="common">
        <phong>
          <diffuse><color>0.2 0.2 0.7 1</color></diffuse>
          <specular><color>0.9 0.9 0.9 1</color></specular>
          <shininess><float>40</float></shininess>
        </phong>
      </technique></profile_COMMON>
    </effect>
  </library_effects>
  <library_materials>
    <material id="red" name="red"><instance_effect url="#red-fx"/></material>
    <material id="shiny" name="shiny"><instance_effect url="#shiny-fx"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="quad-geo"><mesh>
      <source id="quad-pos">
        <float_array id="quad-pos-array" count="12">
          -1 -1 0  1 -1 0  1 1 0  -1 1 0
        </float_array>
        <technique_common><accessor source="#quad-pos-array" count="4" stride="3">
          <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
        </accessor></technique_common>
      </source>
      <vertices id="quad-verts"><input semantic="POSITION" source="#quad-pos"/></vertices>
      <polylist material="redref" count="1">
        <input semantic="VERTEX" source="#quad-verts" offset="0"/>
        <vcount>4</vcount>
        <p>0 1 2 3</p>
      </polylist>
    </mesh></geometry>
    <geometry id="tri-geo"><mesh>
      <source id="tri-pos">
        <float_array id="tri-pos-array" count="9">
          0 0 1  1 0 1  0 1 1
        </float_array>
      </source>
      <vertices id="tri-verts"><input semantic="POSITION" source="#tri-pos"/></vertices>
      <triangles material="shinyref" count="1">
        <input semantic="VERTEX" source="#tri-verts" offset="0"/>
        <p>0 1 2</p>
      </triangles>
    </mesh></geometry>
  </library_geometries>
  <library_cameras>
    <camera id="cam"><optics><technique_common>
      <perspective><yfov>45</yfov><aspect_ratio>1.0</aspect_ratio></perspective>
    </technique_common></optics></camera>
  </library_cameras>
  <library_lights>
    <light id="lamp"><technique_common>
      <point><color>40 38 35</color></point>
    </technique_common></light>
  </library_lights>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="quad-node">
        <translate>0 0 -0.5</translate>
        <instance_geometry url="#quad-geo">
          <bind_material><technique_common>
            <instance_material symbol="redref" target="#red"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
      <node id="tri-node">
        <instance_geometry url="#tri-geo">
          <bind_material><technique_common>
            <instance_material symbol="shinyref" target="#shiny"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
      <node id="cam-node">
        <translate>0 -4 1</translate>
        <rotate>1 0 0 90</rotate>
        <instance_camera url="#cam"/>
      </node>
      <node id="light-node">
        <translate>0 -1 3</translate>
        <instance_light url="#lamp"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""


def _write(tmp_path):
    p = tmp_path / "test.dae"
    p.write_text(DAE)
    return str(p)


def test_convert_collada_structure(tmp_path):
    from alvrl_tpu.scene.collada import convert_collada

    desc = convert_collada(_write(tmp_path), width=16, height=16)
    assert len(desc["shapes"]) == 2
    quad = desc["shapes"][0]
    assert quad["type"] == "trimesh"
    # polylist quad fan-triangulated into 2 faces
    assert len(quad["faces"]) == 2
    assert len(quad["vertices"]) == 4
    tri = desc["shapes"][1]
    assert len(tri["faces"]) == 1
    # materials: lambert -> diffuse, phong -> phong
    mats = {md["name"]: md for md in desc["materials"]}
    assert mats["dae_red"]["type"] == "diffuse"
    np.testing.assert_allclose(mats["dae_red"]["albedo"],
                               [0.8, 0.1, 0.1])
    assert mats["dae_shiny"]["type"] == "phong"
    assert mats["dae_shiny"]["exponent"] == 40
    # camera: yfov 45 at aspect 1 -> fov_x 45; Z_UP: the camera sits at
    # z-up (0,-4,1) -> y-up (0, 1, 4)
    cam = desc["camera"]
    assert abs(cam["fov"] - 45.0) < 1e-6
    np.testing.assert_allclose(cam["origin"], [0, 1, 4], atol=1e-6)
    # point light position converted the same way
    em = desc["emitters"][0]
    assert em["type"] == "point"
    np.testing.assert_allclose(em["position"], [0, 3, 1], atol=1e-6)
    np.testing.assert_allclose(em["intensity"], [40, 38, 35])


def test_collada_renders(tmp_path):
    import jax

    from alvrl_tpu.integrators import volpath
    from alvrl_tpu.scene.collada import load_collada

    scene = load_collada(_write(tmp_path), width=16, height=16)
    img = np.asarray(volpath.render_volpath(
        scene, jax.random.key(0), spp=8,
        cfg=volpath.VolpathConfig(max_depth=3, only_vrl_paths=False),
        ray_tile=64))
    assert np.isfinite(img).all()
    assert img.mean() > 0


def test_collada_rejects_unsupported(tmp_path):
    import pytest

    from alvrl_tpu.scene.collada import convert_collada

    bad = DAE.replace("<perspective><yfov>45</yfov>"
                      "<aspect_ratio>1.0</aspect_ratio></perspective>",
                      "<orthographic><xmag>1</xmag></orthographic>")
    p = tmp_path / "bad.dae"
    p.write_text(bad)
    with pytest.raises(ValueError):
        convert_collada(str(p))
