"""Widened scene system: XML transforms, nested-area emitters, bsdf
trees, .vol heterogeneous media, and the JSON-side additions (area
emitters, per-shape media, new shapes/cameras/materials)."""

import os

import jax
import numpy as np
import pytest

from alvrl_tpu.scene import loader

XML = """<scene version="0.5.0">
  <integrator type="volpath"><integer name="maxDepth" value="8"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="70"/>
    <transform name="toWorld">
      <lookat origin="0, 1, -4" target="0, 0.5, 0" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="12"/>
    </film>
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
  </sensor>
  <bsdf type="twosided" id="white">
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7, 0.7, 0.7"/></bsdf>
  </bsdf>
  <bsdf type="coating" id="coated">
    <float name="thickness" value="1.0"/>
    <rgb name="sigmaA" value="0.1, 0.1, 0.1"/>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.4, 0.2, 0.1"/></bsdf>
  </bsdf>
  <shape type="rectangle">
    <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="3"/></transform>
    <ref id="white"/>
  </shape>
  <shape type="sphere">
    <point name="center" x="0" y="0.5" z="0"/>
    <float name="radius" value="0.5"/><ref id="coated"/>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="90"/><scale value="0.5"/><translate y="2.5"/>
    </transform>
    <ref id="white"/>
    <emitter type="area"><rgb name="radiance" value="8, 8, 8"/></emitter>
  </shape>
  <emitter type="point">
    <point name="position" x="1" y="2" z="-1"/>
    <rgb name="intensity" value="2, 2, 2"/>
  </emitter>
  <medium type="heterogeneous" id="smoke">
    <volume name="density" type="gridvolume">
      <string name="filename" value="dens.vol"/>
    </volume>
    <rgb name="sigmaT" value="0.4, 0.4, 0.4"/>
    <rgb name="albedo" value="0.9, 0.9, 0.9"/>
    <phase type="hg"><float name="g" value="0.3"/></phase>
  </medium>
</scene>"""


def test_xml_full_pipeline(tmp_path):
    from alvrl_tpu.io.vol import write_vol

    write_vol(tmp_path / "dens.vol", np.ones((8, 8, 8), np.float32) * 0.5)
    xp = tmp_path / "s.xml"
    xp.write_text(XML)
    desc = loader.convert_mitsuba_xml(xp)
    assert desc["_integrator"] == "volpath"
    assert desc["_spp"] == 8
    assert [e["type"] for e in desc["emitters"]] == ["area", "point"]
    assert any(m["type"] == "coating" for m in desc["materials"])

    sc = loader.build_scene(desc)
    assert int((np.asarray(sc.face_emitter) >= 0).sum()) == 2
    from alvrl_tpu.integrators import volpath

    img = np.asarray(volpath.render_volpath(
        sc, jax.random.key(0), spp=4,
        cfg=volpath.VolpathConfig(max_depth=3, only_vrl_paths=False),
        ray_tile=64))
    assert np.isfinite(img).all() and img.mean() > 0


def test_xml_transform_order(tmp_path):
    """rotate then scale then translate must compose in document
    order (mitsuba semantics)."""
    xml = """<scene version="0.5.0">
      <shape type="rectangle">
        <transform name="toWorld">
          <scale value="2"/><translate x="5"/>
        </transform>
      </shape>
      <sensor type="perspective">
        <lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/>
      </sensor>
    </scene>"""
    p = tmp_path / "t.xml"
    p.write_text(xml)
    desc = loader.convert_mitsuba_xml(p)
    sc = loader.build_scene(desc)
    v = np.asarray(sc.vertices)
    # unit rect scaled x2 then moved +5: x in [3, 7]
    assert abs(v[:, 0].min() - 3.0) < 1e-5
    assert abs(v[:, 0].max() - 7.0) < 1e-5


def test_json_area_emitter_and_media():
    desc = {
        "camera": {"origin": [0, 0, -3], "target": [0, 0, 0],
                   "width": 8, "height": 8},
        "materials": [{"name": "w", "type": "diffuse",
                       "albedo": [0.7, 0.7, 0.7]},
                      {"name": "glass", "type": "null"}],
        "shapes": [{"type": "disk", "material": "w"},
                   {"type": "cube", "material": "glass",
                    "interior_medium": 1}],
        "emitters": [{"type": "area", "p0": [-0.3, 0.9, -0.3],
                      "e1": [0.6, 0, 0], "e2": [0, 0, 0.6],
                      "radiance": [5, 5, 5]}],
        "media": [{"sigma_a": [0, 0, 0], "sigma_s": [0, 0, 0]},
                  {"sigma_a": [0.1, 0.1, 0.1],
                   "sigma_s": [0.4, 0.4, 0.4]}],
    }
    sc = loader.build_scene(desc)
    assert sc.media is not None
    assert int(np.asarray(sc.face_med_int).max()) == 1
    assert int((np.asarray(sc.face_emitter) >= 0).sum()) == 2
    kinds = np.asarray(sc.emitters.kind)
    from alvrl_tpu.emitters.emitters import AREA

    assert (kinds == AREA).sum() == 2


def test_unsupported_raises(tmp_path):
    p = tmp_path / "bad.xml"
    p.write_text('<scene version="0.5.0">'
                 '<shape type="instancedthing"/></scene>')
    with pytest.raises(ValueError):
        loader.convert_mitsuba_xml(p)
