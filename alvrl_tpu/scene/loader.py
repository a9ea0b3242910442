"""Scene description loader.

Counterpart of the reference's XML scene system (SceneHandler,
src/librender/scenehandler.cpp + PluginManager): a declarative JSON
(or python-dict) scene format mapping onto the Scene pytree, plus a
converter for the subset of Mitsuba 0.5 XML that the shared validation
scenes use. `$var` substitution mirrors the -D flag
(mitsuba.cpp:52-86).

Format:
{
  "camera": {"type": "perspective", "origin":[..], "target":[..],
             "up":[..], "fov": 90, "width": 128, "height": 128},
  "medium": {"type": "homogeneous", "sigma_s":[..], "sigma_a":[..],
             "g": 0.0}
           | {"type": "grid", "density_npy": "path", "sigma_t": [..],
              "albedo": [..], "g": 0.0, "box_min": [..], "box_max":[..]},
  "materials": [{"name": "white", "type": "diffuse", "albedo": [..]},
                {"name": "glass", "type": "dielectric", "eta": 1.5}, ...],
  "shapes": [{"type": "rectangle"|"cube"|"sphere"|"obj"|"ply",
              "material": "white", "to_world": 4x4 | null,
              "filename": ..., "center": [..], "radius": ..}, ...],
  "emitters": [{"type": "point"|"spot"|"directional", "position": [..],
                "intensity": [..], "direction": [..],
                "cutoff": deg, "beam": deg}, ...]
}
"""

from __future__ import annotations

import json
import re

import jax.numpy as jnp
import numpy as np

from alvrl_tpu.emitters import emitters as em_mod
from alvrl_tpu.geometry import shapes as shp
from alvrl_tpu.io import mesh as mesh_io
from alvrl_tpu.media.heterogeneous import make_grid_medium
from alvrl_tpu.media.homogeneous import make_medium
from alvrl_tpu.scene.scene import (
    DIELECTRIC,
    DIFFTRANS,
    DIFFUSE,
    MASK,
    MIRROR,
    MIXTURE,
    NULL,
    ORTHOGRAPHIC,
    PERSPECTIVE,
    PHONG,
    PLASTIC,
    ROUGH_CONDUCTOR,
    ROUGH_PLASTIC,
    SPHERICAL,
    THINLENS,
    WARD,
    Camera,
    Scene,
    look_at,
    make_materials,
)

_MAT_KINDS = {
    "diffuse": DIFFUSE, "null": NULL, "mirror": MIRROR,
    "conductor": MIRROR, "dielectric": DIELECTRIC,
    "thindielectric": DIELECTRIC, "twosided": DIFFUSE,
    "roughconductor": ROUGH_CONDUCTOR, "roughplastic": ROUGH_PLASTIC,
    "plastic": PLASTIC, "phong": PHONG, "ward": WARD,
    "difftrans": DIFFTRANS, "mask": MASK, "mixturebsdf": MIXTURE,
    "blendbsdf": MIXTURE, "mixture": MIXTURE,
}
_CAM_KINDS = {
    "perspective": PERSPECTIVE, "thinlens": THINLENS,
    "orthographic": ORTHOGRAPHIC, "spherical": SPHERICAL,
}
_EM_KINDS = {
    "point": em_mod.POINT, "spot": em_mod.SPOT,
    "directional": em_mod.DIRECTIONAL, "constant": em_mod.CONSTANT,
}


def _substitute(text: str, defines: dict) -> str:
    """$key -> value substitution (the -D flag, mitsuba.cpp:80)."""
    for k, v in (defines or {}).items():
        text = text.replace(f"${k}", str(v))
    return text


def load_json(path_or_dict, defines=None) -> Scene:
    if isinstance(path_or_dict, dict):
        desc = path_or_dict
    else:
        with open(path_or_dict) as f:
            desc = json.loads(_substitute(f.read(), defines))
    return build_scene(desc)


def build_scene(desc: dict) -> Scene:
    # materials
    mats = desc.get("materials", [{"name": "default", "type": "diffuse",
                                   "albedo": [0.5, 0.5, 0.5]}])
    name_to_id = {}
    for i, mdesc in enumerate(mats):
        name_to_id[mdesc.get("name", f"mat{i}")] = i
    kinds, albedos, etas, alphas = [], [], [], []
    speculars, exponents, alpha_vs, opacities = [], [], [], []
    nesteds, nested2s = [], []
    tex_kinds, tex_scales, albedo2s, tex_ids = [], [], [], []
    bitmap_imgs = []
    _TEX_KINDS = {"none": 0, "checker": 1, "grid": 2, "noise": 3,
                  "bitmap": 4}
    for i, mdesc in enumerate(mats):
        kinds.append(_MAT_KINDS[mdesc["type"]])
        albedos.append(mdesc.get("albedo", [1.0, 1.0, 1.0]))
        etas.append(mdesc.get("eta", 1.0))
        alphas.append(mdesc.get("alpha", 0.1))
        speculars.append(mdesc.get("specular", [0.2] * 3))
        exponents.append(mdesc.get("exponent", 30.0))
        alpha_vs.append(mdesc.get("alpha_v", mdesc.get("alpha", 0.1)))
        # mask opacity / mixture first-lobe weight
        opacities.append(mdesc.get("opacity", mdesc.get("weight", 1.0)))
        nesteds.append(name_to_id[mdesc["nested"]]
                       if "nested" in mdesc else 0)
        nested2s.append(name_to_id[mdesc["nested2"]]
                        if "nested2" in mdesc else 0)
        tdesc = mdesc.get("texture")
        if tdesc is None:
            tex_kinds.append(0)
            tex_scales.append(1.0)
            albedo2s.append([0.0] * 3)
            tex_ids.append(0)
        else:
            tex_kinds.append(_TEX_KINDS[tdesc["type"]])
            tex_scales.append(tdesc.get("scale", 1.0))
            albedo2s.append(tdesc.get("albedo2", [0.0] * 3))
            if tdesc["type"] == "bitmap":
                from alvrl_tpu.io import image as img_io

                fn = tdesc["filename"]
                img = np.asarray(
                    img_io.read_npy(fn) if fn.endswith(".npy")
                    else img_io.read_pfm(fn), np.float32,
                )
                if img.ndim == 2:
                    img = img[..., None].repeat(3, axis=-1)
                tex_ids.append(len(bitmap_imgs))
                bitmap_imgs.append(img)
            else:
                tex_ids.append(0)
    materials = make_materials(
        kinds, albedos, etas, alphas,
        tex_kinds=tex_kinds, tex_scales=tex_scales, albedo2=albedo2s,
        specular=speculars, exponent=exponents, alpha_v=alpha_vs,
        opacity=opacities, nested=nesteds, nested2=nested2s,
        tex_id=tex_ids,
    )
    if bitmap_imgs:
        shapes_set = {im.shape[:2] for im in bitmap_imgs}
        if len(shapes_set) > 1:
            raise ValueError(
                "all bitmap textures in one scene must share a "
                f"resolution (got {sorted(shapes_set)}): the texture "
                "stack is a single (K, H, W, 3) array"
            )
        textures = np.stack(bitmap_imgs).astype(np.float32)
    else:
        textures = np.zeros((1, 1, 1, 3), np.float32)

    # shapes (UVs: analytic parameterizations for rectangle/cube/sphere,
    # vt records for OBJ; PLY untextured for now)
    parts = []
    for sdesc in desc.get("shapes", []):
        st = sdesc["type"]
        tw = sdesc.get("to_world")
        tw = np.asarray(tw, np.float32) if tw is not None else None
        face_uv = None
        if st == "rectangle":
            v0, f = shp.rectangle()
            face_uv = shp.auto_uvs("rectangle", v0, f)
            v = shp.apply_transform(tw, v0) if tw is not None else v0
        elif st == "cube":
            v0, f = shp.cube(flip_normals=sdesc.get("flip_normals", False))
            face_uv = shp.auto_uvs("cube", v0, f)
            v = shp.apply_transform(tw, v0) if tw is not None else v0
        elif st == "sphere":
            center = sdesc.get("center", (0, 0, 0))
            v, f = shp.sphere(
                center, sdesc.get("radius", 1.0),
                n_theta=sdesc.get("n_theta", 16), n_phi=sdesc.get("n_phi", 32),
            )
            face_uv = shp.auto_uvs("sphere", v, f, center=center)
            if tw is not None:
                v = shp.apply_transform(tw, v)
        elif st == "obj":
            v, f, face_uv = mesh_io.load_obj_uv(sdesc["filename"])
            if tw is not None:
                v = shp.apply_transform(tw, v)
        elif st == "ply":
            v, f = mesh_io.load_ply(sdesc["filename"])
            if tw is not None:
                v = shp.apply_transform(tw, v)
        else:
            raise ValueError(f"unknown shape type {st}")
        parts.append((v, f, name_to_id[sdesc.get("material", "default")],
                      face_uv))
    verts, faces, mat_ids, face_uvs = shp.merge(parts)

    # emitters (sky/sun/sunsky/envmap expand per src/emitters/: sky and
    # envmap bake into the importance-sampled EnvMap; sun becomes a
    # directional emitter with atmosphere-attenuated irradiance)
    edescs = []
    env = None
    for e in desc.get("emitters", []):
        et = e["type"]
        if et in ("sky", "sunsky", "envmap"):
            from alvrl_tpu.emitters import sunsky as ss_mod
            from alvrl_tpu.emitters.envmap import make_envmap

            if env is not None:
                raise ValueError("only one environment emitter supported")
            if et == "envmap":
                from alvrl_tpu.io import image as img_io

                fn = e["filename"]
                img = (img_io.read_npy(fn) if fn.endswith(".npy")
                       else img_io.read_pfm(fn))
                env = make_envmap(img, scale=e.get("scale", 1.0),
                                  azimuth_deg=e.get("azimuth", 0.0))
            else:
                env = ss_mod.sky_envmap(
                    e.get("sun_direction", [0.3, 0.8, 0.2]),
                    turbidity=e.get("turbidity", 3.0),
                    width=e.get("resolution", 256),
                    height=e.get("resolution", 256) // 2,
                    scale=e.get("scale", 1.0),
                    with_sun=(et == "sunsky"),
                    sun_scale=e.get("sun_scale", 1.0),
                )
            edescs.append({"type": "_envmap"})
        if et in ("sun", "sunsky"):
            from alvrl_tpu.emitters import sunsky as ss_mod

            if et == "sun":  # sunsky's disk is baked into the map
                sd = e.get("sun_direction", [0.3, 0.8, 0.2])
                rad = ss_mod.sun_rgb_radiance(
                    sd, e.get("turbidity", 3.0), e.get("sun_scale", 1.0)
                )
                sd = np.asarray(sd, np.float64)
                edescs.append({
                    "type": "directional",
                    "direction": list(-sd / np.linalg.norm(sd)),
                    "intensity": list(rad * ss_mod.SUN_SOLID_ANGLE),
                })
        elif et not in ("sky", "envmap"):
            edescs.append(e)
    _EK = dict(_EM_KINDS, _envmap=em_mod.ENVMAP)
    ekinds = [_EK[e["type"]] for e in edescs]
    epos = [e.get("position", [0, 0, 0]) for e in edescs]
    eint = [e.get("intensity", e.get("irradiance", [1, 1, 1])) for e in edescs]
    edir = [e.get("direction", [0, 0, 1]) for e in edescs]
    ecut = [e.get("cutoff", 20.0) for e in edescs]
    ebeam = [e.get("beam", 15.0) for e in edescs]
    emitters = em_mod.make_emitters(ekinds, epos, eint, edir, ecut, ebeam,
                                    env=env)

    # medium
    mdesc = desc.get("medium", {"type": "homogeneous",
                                "sigma_s": [0.5] * 3, "sigma_a": [0.05] * 3})
    phase_kind = {"hg": 0, "isotropic": 0, "rayleigh": 1}[
        mdesc.get("phase", "hg")
    ]
    if mdesc["type"] == "homogeneous":
        strat = {"balance": 0, "single": 1, "manual": 2, "maximum": 3}[
            mdesc.get("strategy", "balance")
        ]
        medium = make_medium(
            mdesc.get("sigma_a", [0.0] * 3), mdesc.get("sigma_s", [0.5] * 3),
            g=mdesc.get("g", 0.0), phase_kind=phase_kind,
            strategy=strat, channel=mdesc.get("channel", 0),
            density=mdesc.get("density", 1.0),
        )
    elif mdesc["type"] == "grid":
        if "density_npy" in mdesc:
            density = np.load(mdesc["density_npy"])
        else:
            density = np.asarray(mdesc["density"], np.float32)
        medium = make_grid_medium(
            density, mdesc.get("sigma_t", [1.0] * 3),
            mdesc.get("albedo", [0.9] * 3), g=mdesc.get("g", 0.0),
            box_min=mdesc.get("box_min", (-1, -1, -1)),
            box_max=mdesc.get("box_max", (1, 1, 1)),
            scale=mdesc.get("scale", 1.0), phase_kind=phase_kind,
        )
    else:
        raise ValueError(f"unknown medium type {mdesc['type']}")

    # camera
    cdesc = desc["camera"]
    camera = Camera(
        to_world=look_at(
            cdesc["origin"], cdesc["target"], cdesc.get("up", [0, 1, 0])
        ),
        fov_x_deg=jnp.float32(cdesc.get("fov", 60.0)),
        aperture_radius=cdesc.get("aperture_radius", 0.0),
        focus_distance=cdesc.get("focus_distance", 1.0),
        ortho_scale=cdesc.get("ortho_scale", 1.0),
        width=int(cdesc.get("width", 128)),
        height=int(cdesc.get("height", 128)),
        kind=_CAM_KINDS[cdesc.get("type", "perspective")],
    )

    return Scene(
        vertices=jnp.asarray(verts),
        faces=jnp.asarray(faces),
        material=jnp.asarray(mat_ids),
        materials=materials,
        emitters=emitters,
        medium=medium,
        camera=camera,
        face_uv=jnp.asarray(face_uvs),
        textures=jnp.asarray(textures),
    )


# ---------------------------------------------------------------------------
# Mitsuba 0.5 XML subset converter
# ---------------------------------------------------------------------------

def convert_mitsuba_xml(path, defines=None) -> dict:
    """Convert the subset of Mitsuba 0.5 scene XML the shared validation
    scenes use (perspective sensor, point emitters, homogeneous medium,
    diffuse/dielectric/null BSDFs, rectangle/cube/sphere/obj/ply shapes)
    into the JSON scene dict. Raises on unsupported constructs rather
    than silently dropping them."""
    import xml.etree.ElementTree as ET

    with open(path) as f:
        text = _substitute(f.read(), defines)
    root = ET.fromstring(text)
    if root.tag != "scene":
        raise ValueError("not a mitsuba scene file")

    desc = {"materials": [], "shapes": [], "emitters": []}

    def get_props(node):
        props = {}
        for child in node:
            n = child.get("name")
            if child.tag == "float":
                props[n] = float(child.get("value"))
            elif child.tag == "integer":
                props[n] = int(child.get("value"))
            elif child.tag in ("spectrum", "rgb", "srgb"):
                val = child.get("value")
                if "," in val or " " in val:
                    props[n] = [float(x) for x in re.split(r"[ ,]+", val.strip())]
                else:
                    props[n] = [float(val)] * 3
            elif child.tag == "point":
                props[n] = [float(child.get(a, 0)) for a in "xyz"]
            elif child.tag == "boolean":
                props[n] = child.get("value") == "true"
            elif child.tag == "string":
                props[n] = child.get("value")
        return props

    for node in root:
        if node.tag == "sensor":
            props = get_props(node)
            cam = {"type": node.get("type", "perspective"),
                   "fov": props.get("fov", 60.0)}
            lookat = node.find(".//lookat")
            if lookat is not None:
                cam["origin"] = [float(x) for x in re.split(r"[ ,]+", lookat.get("origin").strip())]
                cam["target"] = [float(x) for x in re.split(r"[ ,]+", lookat.get("target").strip())]
                cam["up"] = [float(x) for x in re.split(r"[ ,]+", lookat.get("up", "0, 1, 0").strip())]
            film = node.find("film")
            if film is not None:
                fprops = get_props(film)
                cam["width"] = fprops.get("width", 128)
                cam["height"] = fprops.get("height", 128)
            desc["camera"] = cam
        elif node.tag == "emitter":
            et = node.get("type")
            props = get_props(node)
            if et == "point":
                desc["emitters"].append({
                    "type": "point",
                    "position": props.get("position", [0, 0, 0]),
                    "intensity": props.get("intensity", [1, 1, 1]),
                })
            elif et in ("spot", "directional"):
                desc["emitters"].append({
                    "type": et,
                    "position": props.get("position", [0, 0, 0]),
                    "intensity": props.get(
                        "intensity", props.get("irradiance", [1, 1, 1])
                    ),
                    "direction": props.get("direction", [0, 0, 1]),
                })
            else:
                raise ValueError(f"unsupported emitter type {et}")
        elif node.tag == "medium":
            props = get_props(node)
            desc["medium"] = {
                "type": "homogeneous",
                "sigma_s": props.get("sigmaS", [0.5] * 3),
                "sigma_a": props.get("sigmaA", [0.0] * 3),
            }
            phase = node.find("phase")
            if phase is not None:
                pt = phase.get("type")
                desc["medium"]["phase"] = pt
                if pt == "hg":
                    desc["medium"]["g"] = get_props(phase).get("g", 0.0)
        elif node.tag == "bsdf":
            bt = node.get("type")
            if bt not in _MAT_KINDS:
                raise ValueError(f"unsupported bsdf type {bt}")
            props = get_props(node)
            desc["materials"].append({
                "name": node.get("id", f"mat{len(desc['materials'])}"),
                "type": bt,
                "albedo": props.get("reflectance", props.get(
                    "diffuseReflectance", [0.5] * 3)),
                "eta": props.get("intIOR", 1.5) if bt == "dielectric" else 1.0,
            })
        elif node.tag == "shape":
            st = node.get("type")
            props = get_props(node)
            ref = node.find("ref")
            mat = ref.get("id") if ref is not None else "default"
            sdesc = {"type": st, "material": mat}
            if st in ("obj", "ply"):
                sdesc["filename"] = props["filename"]
            elif st == "sphere":
                sdesc["center"] = props.get("center", [0, 0, 0])
                sdesc["radius"] = props.get("radius", 1.0)
            elif st not in ("rectangle", "cube"):
                raise ValueError(f"unsupported shape type {st}")
            desc["shapes"].append(sdesc)
    return desc
