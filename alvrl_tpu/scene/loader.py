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
    COATING,
    DIELECTRIC,
    DIFFTRANS,
    DIFFUSE,
    HK,
    IRAWAN,
    MASK,
    MIRROR,
    MIXTURE,
    NORMALMAP,
    NULL,
    ORTHOGRAPHIC,
    PERSPECTIVE,
    PERSPECTIVE_RDIST,
    PHONG,
    PLASTIC,
    ROUGH_COATING,
    ROUGH_CONDUCTOR,
    ROUGH_DIELECTRIC,
    ROUGH_PLASTIC,
    SPHERICAL,
    TELECENTRIC,
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
    "blendbsdf": MIXTURE, "mixture": MIXTURE, "coating": COATING,
    "roughdielectric": ROUGH_DIELECTRIC,
    "roughcoating": ROUGH_COATING, "normalmap": NORMALMAP,
    "bumpmap": NORMALMAP, "hk": HK, "irawan": IRAWAN,
}
_CAM_KINDS = {
    "perspective": PERSPECTIVE, "thinlens": THINLENS,
    "orthographic": ORTHOGRAPHIC, "spherical": SPHERICAL,
    "telecentric": TELECENTRIC, "perspective_rdist": PERSPECTIVE_RDIST,
    "radiancemeter": PERSPECTIVE,
}
_EM_KINDS = {
    "point": em_mod.POINT, "spot": em_mod.SPOT,
    "directional": em_mod.DIRECTIONAL, "constant": em_mod.CONSTANT,
    "collimated": em_mod.COLLIMATED,
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
    mats = list(desc.get("materials", [{"name": "default",
                                        "type": "diffuse",
                                        "albedo": [0.5, 0.5, 0.5]}]))
    # area emitters are real geometry (area.cpp): give their faces a
    # black diffuse material unless one is named
    area_emitters = [e for e in desc.get("emitters", [])
                     if e["type"] == "area"]
    if area_emitters and not any(
            mdesc.get("name") == "_emitter_black" for mdesc in mats):
        mats.append({"name": "_emitter_black", "type": "diffuse",
                     "albedo": [0.0, 0.0, 0.0]})
    # shapes without an explicit material fall back to "default"
    names = {mdesc.get("name", f"mat{i}") for i, mdesc in enumerate(mats)}
    if "default" not in names and any(
            s.get("material", "default") == "default"
            for s in desc.get("shapes", [])):
        mats.append({"name": "default", "type": "diffuse",
                     "albedo": [0.5, 0.5, 0.5]})
    name_to_id = {}
    for i, mdesc in enumerate(mats):
        name_to_id[mdesc.get("name", f"mat{i}")] = i
    kinds, albedos, etas, alphas = [], [], [], []
    speculars, exponents, alpha_vs, opacities = [], [], [], []
    dists = []
    _DIST_KINDS = {"beckmann": 0, "ggx": 1, "as": 2, "phong": 2}
    nesteds, nested2s = [], []
    tex_kinds, tex_scales, albedo2s, tex_ids = [], [], [], []
    bitmap_imgs = []
    _TEX_KINDS = {"none": 0, "checker": 1, "grid": 2, "noise": 3,
                  "bitmap": 4}
    for i, mdesc in enumerate(mats):
        kinds.append(_MAT_KINDS[mdesc["type"]])
        # hk slabs store sigma_s in the albedo column
        albedos.append(mdesc.get("albedo",
                                 mdesc.get("sigma_s", [1.0, 1.0, 1.0])))
        etas.append(mdesc.get("eta", 1.0))
        # hk phase g rides the alpha column
        alphas.append(mdesc.get("alpha", mdesc.get("g", 0.1)))
        speculars.append(mdesc.get("specular", [0.2] * 3))
        # coating/hk thickness rides the exponent column
        exponents.append(mdesc.get("exponent",
                                   mdesc.get("thickness", 30.0)))
        alpha_vs.append(mdesc.get("alpha_v", mdesc.get("alpha", 0.1)))
        # mask opacity / mixture first-lobe weight
        opacities.append(mdesc.get("opacity", mdesc.get("weight", 1.0)))
        dists.append(_DIST_KINDS[mdesc.get("distribution", "ggx")])
        nesteds.append(name_to_id[mdesc["nested"]]
                       if "nested" in mdesc else 0)
        nested2s.append(name_to_id[mdesc["nested2"]]
                        if "nested2" in mdesc else 0)
        tdesc = mdesc.get("texture")
        if tdesc is None:
            tex_kinds.append(0)
            tex_scales.append(1.0)
            # coating/hk absorption sigma_a rides the albedo2 column
            albedo2s.append(mdesc.get("sigma_a",
                                      mdesc.get("albedo2", [0.0] * 3)))
            tex_ids.append(0)
        else:
            tex_kinds.append(_TEX_KINDS[tdesc["type"]])
            tex_scales.append(tdesc.get("scale", 1.0))
            albedo2s.append(tdesc.get("albedo2", [0.0] * 3))
            if tdesc["type"] == "bitmap":
                from alvrl_tpu.io import image as img_io

                fn = tdesc["filename"]
                # extension dispatch incl. PNG/JPEG decode (LDR
                # bitmap textures load end-to-end since round 4)
                img = np.asarray(img_io.read_image(fn), np.float32)
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
        tex_id=tex_ids, dist=dists,
    )
    # woven-cloth weave pattern (one per scene; irawan.cpp's external
    # pattern file becomes a preset name or an inline dict)
    weave = None
    for mdesc in mats:
        if mdesc["type"] != "irawan":
            continue
        from alvrl_tpu.bsdf import irawan as irw

        wd = mdesc.get("weave", "plain")
        if wd == "plain":
            weave = irw.plain_weave(
                kd=mdesc.get("kd", (0.3, 0.3, 0.45)),
                ks=mdesc.get("ks", (0.4, 0.4, 0.5)),
                repeat_u=mdesc.get("repeat_u", 8.0),
                repeat_v=mdesc.get("repeat_v", 8.0))
        elif wd == "silk":
            weave = irw.silk_like_weave(
                kd=mdesc.get("kd", (0.1, 0.1, 0.15)),
                ks=mdesc.get("ks", (0.9, 0.9, 1.0)),
                repeat_u=mdesc.get("repeat_u", 12.0),
                repeat_v=mdesc.get("repeat_v", 12.0))
        elif isinstance(wd, dict) and "filename" in wd:
            # the reference's external weave-pattern DSL file
            # (irawan.cpp `filename` + $param substitution)
            weave = irw.load_weave_file(
                wd["filename"], params=wd.get("params"),
                repeat_u=wd.get("repeat_u", mdesc.get("repeat_u", 4.0)),
                repeat_v=wd.get("repeat_v", mdesc.get("repeat_v", 4.0)))
        elif isinstance(wd, dict):
            weave = irw.make_pattern(**wd)
        else:
            raise ValueError(f"unknown weave {wd!r}")
        weave = irw.normalize_pattern(weave)
        break

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
    parts_v1 = []
    any_deform = False
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
            v, f, face_uv = mesh_io.load_ply_uv(sdesc["filename"])
            if tw is not None:
                v = shp.apply_transform(tw, v)
        elif st == "serialized":
            v, f, _, vuv = mesh_io.load_serialized(
                sdesc["filename"], sdesc.get("shape_index", 0))
            if vuv is not None:
                face_uv = vuv[np.asarray(f)]
            if tw is not None:
                v = shp.apply_transform(tw, v)
        elif st == "trimesh":
            # inline triangle mesh (vertex/face lists in the dict) —
            # the converter target for formats without a native loader
            # (COLLADA import, scene/collada.py)
            v = np.asarray(sdesc["vertices"], np.float32).reshape(-1, 3)
            f = np.asarray(sdesc["faces"], np.int32).reshape(-1, 3)
            if tw is not None:
                v = shp.apply_transform(tw, v)
        elif st == "disk":
            v, f = shp.disk(n_phi=sdesc.get("n_phi", 48), to_world=tw)
        elif st == "cylinder":
            v, f = shp.cylinder(
                sdesc.get("p0", (0, 0, 0)), sdesc.get("p1", (0, 0, 1)),
                sdesc.get("radius", 1.0), n_phi=sdesc.get("n_phi", 32))
            if tw is not None:
                v = shp.apply_transform(tw, v)
        elif st == "heightfield":
            h = (np.load(sdesc["heights_npy"]) if "heights_npy" in sdesc
                 else np.asarray(sdesc["heights"], np.float32))
            v, f = shp.heightfield(h, sdesc.get("x_extent", 2.0),
                                   sdesc.get("y_extent", 2.0),
                                   to_world=tw)
        elif st == "hair":
            fibers = shp.load_hair_file(sdesc["filename"])
            v, f = shp.hair(fibers, radius=sdesc.get("radius", 0.025))
            if tw is not None:
                v = shp.apply_transform(tw, v)
        else:
            raise ValueError(f"unknown shape type {st}")
        parts.append((v, f, name_to_id[sdesc.get("material", "default")],
                      face_uv))
        # deformable shapes (deformable.cpp): a time-1 keyframe from a
        # second rigid transform (v = (tw or I) @ base, so the relative
        # transform tw1 @ inv(tw) maps the stored verts to time 1)
        tw1 = sdesc.get("to_world_t1")
        if tw1 is not None:
            tw1 = np.asarray(tw1, np.float32)
            rel = tw1 @ np.linalg.inv(tw) if tw is not None else tw1
            parts_v1.append(shp.apply_transform(rel, v))
            any_deform = True
        else:
            parts_v1.append(v)
    part_media = [
        (sdesc.get("interior_medium", 0), sdesc.get("exterior_medium", 0),
         len(parts[i][1]))
        for i, sdesc in enumerate(desc.get("shapes", []))
    ]
    verts, faces, mat_ids, face_uvs = shp.merge(parts)
    verts_t1 = (np.concatenate(parts_v1, axis=0)
                if any_deform and parts_v1 else None)
    face_emitter = np.full((len(faces),), -1, np.int32)
    # high-level shape index per face (the field integrator's shapeIndex
    # AOV, misc/field.cpp) — shapes in declaration order, then one index
    # per area-emitter quad
    face_shape = np.concatenate(
        [np.full((len(p[1]),), i, np.int32) for i, p in enumerate(parts)]
    ) if parts else np.zeros((0,), np.int32)
    n_shapes = len(parts)

    # append area-emitter quads as geometry (two triangles / two
    # emitter-table entries each, like the reference's area.cpp shapes)
    area_entries = []
    for e in area_emitters:
        p0 = np.asarray(e["p0"], np.float32)
        e1 = np.asarray(e["e1"], np.float32)
        e2 = np.asarray(e["e2"], np.float32)
        n_v = len(verts)
        quad_v = np.stack([p0, p0 + e1, p0 + e2, p0 + e1 + e2])
        quad_f = np.asarray([[0, 1, 2], [3, 2, 1]], np.int32) + n_v
        verts = np.concatenate([verts, quad_v])
        if verts_t1 is not None:
            verts_t1 = np.concatenate([verts_t1, quad_v])
        faces = np.concatenate([faces, quad_f])
        m_id = name_to_id.get(e.get("material", "_emitter_black"),
                              name_to_id.get("_emitter_black", 0))
        mat_ids = np.concatenate(
            [mat_ids, np.full((2,), m_id, np.int32)])
        face_uvs = np.concatenate(
            [face_uvs, np.zeros((2, 3, 2), np.float32)])
        eid0 = len(area_entries)
        face_emitter = np.concatenate(
            [face_emitter,
             np.asarray([eid0, eid0 + 1], np.int32)])
        face_shape = np.concatenate(
            [face_shape, np.full((2,), n_shapes, np.int32)])
        n_shapes += 1
        rad = e.get("radiance", [1.0, 1.0, 1.0])
        area_entries.append({"type": "_area", "position": list(p0),
                             "intensity": rad, "e1": list(e1),
                             "e2": list(e2)})
        area_entries.append({
            "type": "_area", "position": list(p0 + e1 + e2),
            "intensity": rad, "e1": list(-e1), "e2": list(-e2)})

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
                img = img_io.read_image(fn)
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
        elif et not in ("sky", "envmap", "area"):
            edescs.append(e)
    # area entries go LAST so the face_emitter ids recorded above can
    # be offset by the count of non-area entries
    n_base = len(edescs)
    face_emitter[face_emitter >= 0] += n_base
    edescs.extend(area_entries)
    _EK = dict(_EM_KINDS, _envmap=em_mod.ENVMAP, _area=em_mod.AREA)
    ekinds = [_EK[e["type"]] for e in edescs]
    epos = [e.get("position", [0, 0, 0]) for e in edescs]
    eint = [e.get("intensity", e.get("irradiance", e.get("power", [1, 1, 1])))
            for e in edescs]
    edir = [e.get("direction", [0, 0, 1]) for e in edescs]
    ecut = [e.get("cutoff", 20.0) for e in edescs]
    ebeam = [e.get("beam", 15.0) for e in edescs]
    etri1 = [e.get("e1", [0, 0, 0]) for e in edescs]
    etri2 = [e.get("e2", [0, 0, 0]) for e in edescs]
    emitters = em_mod.make_emitters(ekinds, epos, eint, edir, ecut, ebeam,
                                    tri_e1=etri1, tri_e2=etri2, env=env)

    # medium
    mdesc = desc.get("medium", {"type": "homogeneous",
                                "sigma_s": [0.5] * 3, "sigma_a": [0.05] * 3})
    phase_desc = mdesc.get("phase", "hg")
    phase_params = None
    if isinstance(phase_desc, dict):
        # {"type": "mixture", "components":
        #   [{"type": "hg"|"rayleigh", "g": .., "weight": ..}, ...]}
        # (src/phase/mixturephase.cpp)
        from alvrl_tpu.media import phase as ph_mod

        if phase_desc.get("type") != "mixture":
            raise ValueError(f"unsupported phase dict {phase_desc}")
        comps = phase_desc["components"]
        phase_kind = ph_mod.MIXTURE
        phase_params = ph_mod.mixture_params(
            weights=[c.get("weight", 1.0 / len(comps)) for c in comps],
            kinds=[{"hg": ph_mod.HG, "isotropic": ph_mod.HG,
                    "rayleigh": ph_mod.RAYLEIGH}[c.get("type", "hg")]
                   for c in comps],
            gs=[c.get("g", 0.0) for c in comps],
        )
    else:
        phase_kind = {"hg": 0, "isotropic": 0, "rayleigh": 1}[phase_desc]
    if mdesc["type"] == "homogeneous":
        strat = {"balance": 0, "single": 1, "manual": 2, "maximum": 3}[
            mdesc.get("strategy", "balance")
        ]
        medium = make_medium(
            mdesc.get("sigma_a", [0.0] * 3), mdesc.get("sigma_s", [0.5] * 3),
            g=mdesc.get("g", 0.0), phase_kind=phase_kind,
            strategy=strat, channel=mdesc.get("channel", 0),
            density=mdesc.get("density", 1.0),
            phase_params=phase_params,
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

    # per-shape nested media (media/table.py): "media" lists the
    # homogeneous table (id 0 = exterior), shapes carry
    # interior_medium/exterior_medium ids
    media_tbl = None
    face_med_int = None
    face_med_ext = None
    if "media" in desc:
        from alvrl_tpu.media.table import make_media_table

        mlist = desc["media"]
        media_tbl = make_media_table(
            sigma_a=[mm.get("sigma_a", [0.0] * 3) for mm in mlist],
            sigma_s=[mm.get("sigma_s", [0.0] * 3) for mm in mlist],
            g=[mm.get("g", 0.0) for mm in mlist],
        )
        fmi, fme = [], []
        for mi, me, n_f in part_media:
            fmi += [mi] * n_f
            fme += [me] * n_f
        n_extra = len(faces) - len(fmi)  # area-emitter quads
        face_med_int = np.asarray(fmi + [0] * n_extra, np.int32)
        face_med_ext = np.asarray(fme + [0] * n_extra, np.int32)

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
        kc0=cdesc.get("kc0", 0.0),
        kc1=cdesc.get("kc1", 0.0),
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
        face_emitter=jnp.asarray(face_emitter),
        face_uv=jnp.asarray(face_uvs),
        textures=jnp.asarray(textures),
        media=media_tbl,
        face_med_int=(None if face_med_int is None
                      else jnp.asarray(face_med_int)),
        face_med_ext=(None if face_med_ext is None
                      else jnp.asarray(face_med_ext)),
        face_shape=jnp.asarray(face_shape),
        weave=weave,
        vertices_t1=(None if verts_t1 is None else jnp.asarray(verts_t1)),
    )


# ---------------------------------------------------------------------------
# Mitsuba 0.5 XML subset converter
# ---------------------------------------------------------------------------

def convert_mitsuba_xml(path, defines=None) -> dict:
    """Convert Mitsuba 0.5 scene XML into the JSON scene dict.

    Covered subset (scenehandler.cpp vocabulary): perspective/thinlens/
    orthographic/spherical sensors with <transform name="toWorld">
    (lookat/translate/rotate/scale/matrix) or <lookat>; point/spot/
    directional/constant/envmap/sky/sun/sunsky emitters + area emitters
    nested in rectangle shapes; the full material-kind table incl.
    twosided unwrapping and nested refs (mask/coating/normalmap);
    rectangle/cube/sphere/disk/cylinder/obj/ply/serialized/hair shapes;
    homogeneous and heterogeneous (gridvolume .vol) media; integrator
    and sampler nodes are carried as metadata ("_integrator", "_spp").
    Raises on constructs outside this subset rather than silently
    dropping them."""
    import os
    import xml.etree.ElementTree as ET

    base_dir = os.path.dirname(os.path.abspath(path))

    with open(path) as f:
        text = _substitute(f.read(), defines)
    root = ET.fromstring(text)
    if root.tag != "scene":
        raise ValueError("not a mitsuba scene file")

    desc = {"materials": [], "shapes": [], "emitters": []}

    def vec(s):
        return [float(x) for x in re.split(r"[ ,]+", s.strip())]

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
                    props[n] = vec(val)
                else:
                    props[n] = [float(val)] * 3
            elif child.tag in ("point", "vector"):
                if child.get("value") is not None:
                    props[n] = vec(child.get("value"))
                else:
                    props[n] = [float(child.get(a, 0)) for a in "xyz"]
            elif child.tag == "boolean":
                props[n] = child.get("value") == "true"
            elif child.tag == "string":
                props[n] = child.get("value")
        return props

    def parse_transform(node):
        """<transform> children -> 4x4 (applied in document order)."""
        mat = np.eye(4, dtype=np.float64)
        for t in node:
            if t.tag == "translate":
                m_ = np.eye(4)
                m_[:3, 3] = [float(t.get(a, 0)) for a in "xyz"]
            elif t.tag == "scale":
                m_ = np.eye(4)
                if t.get("value") is not None:
                    s = float(t.get("value"))
                    m_[0, 0] = m_[1, 1] = m_[2, 2] = s
                else:
                    for i, a in enumerate("xyz"):
                        m_[i, i] = float(t.get(a, 1))
            elif t.tag == "rotate":
                ax = np.asarray(
                    [float(t.get(a, 0)) for a in "xyz"], np.float64)
                ax /= max(np.linalg.norm(ax), 1e-12)
                th = np.deg2rad(float(t.get("angle", 0)))
                c, s = np.cos(th), np.sin(th)
                x, y, z = ax
                r = np.array([
                    [c + x * x * (1 - c), x * y * (1 - c) - z * s,
                     x * z * (1 - c) + y * s],
                    [y * x * (1 - c) + z * s, c + y * y * (1 - c),
                     y * z * (1 - c) - x * s],
                    [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s,
                     c + z * z * (1 - c)],
                ])
                m_ = np.eye(4)
                m_[:3, :3] = r
            elif t.tag == "matrix":
                vals = vec(t.get("value"))
                m_ = np.asarray(vals, np.float64).reshape(4, 4)
            elif t.tag == "lookat":
                # sensor-style lookat inside a toWorld transform
                o = np.asarray(vec(t.get("origin")))
                tg = np.asarray(vec(t.get("target")))
                up = np.asarray(vec(t.get("up", "0,1,0")))
                m_ = np.asarray(look_at(o, tg, up), np.float64)
            else:
                raise ValueError(f"unsupported transform op {t.tag}")
            mat = m_ @ mat
        return mat

    def resolve_path(fn):
        if not os.path.isabs(fn):
            return os.path.join(base_dir, fn)
        return fn

    def convert_bsdf(node, name_hint):
        """One <bsdf> -> one or more material dicts; returns the
        top-level name. twosided unwraps; mask/coating/normalmap/
        mixture recurse into nested children."""
        bt = node.get("type")
        name = node.get("id", name_hint)
        if bt == "twosided":
            inner = node.find("bsdf")
            return convert_bsdf(inner, name)
        if bt not in _MAT_KINDS:
            raise ValueError(f"unsupported bsdf type {bt}")
        props = get_props(node)
        mdesc = {"name": name, "type": bt}
        alb = props.get("reflectance", props.get(
            "diffuseReflectance", props.get("sigmaS")))
        if alb is not None:
            mdesc["albedo"] = alb
        if "intIOR" in props:
            mdesc["eta"] = props["intIOR"]
        if "alpha" in props:
            mdesc["alpha"] = props["alpha"]
        if "alphaU" in props:
            mdesc["alpha"] = props["alphaU"]
        if "alphaV" in props:
            mdesc["alpha_v"] = props["alphaV"]
        if bt in ("roughconductor", "roughplastic", "roughdielectric",
                  "roughcoating"):
            # the reference's XML default distribution is Beckmann
            # (microfacet.h:99-107)
            mdesc["distribution"] = props.get("distribution", "beckmann")
        if "exponent" in props:
            mdesc["exponent"] = props["exponent"]
        if "specularReflectance" in props:
            mdesc["specular"] = props["specularReflectance"]
        if "opacity" in props:
            op = props["opacity"]
            mdesc["opacity"] = op[0] if isinstance(op, list) else op
        if "weight" in props:
            mdesc["opacity"] = props["weight"]
        if "sigmaA" in props:
            mdesc["sigma_a"] = props["sigmaA"]
        if "thickness" in props:
            mdesc["thickness"] = props["thickness"]
        inner_bsdfs = node.findall("bsdf")
        if inner_bsdfs:
            nested_names = [
                convert_bsdf(b, f"{name}_n{i}")
                for i, b in enumerate(inner_bsdfs)
            ]
            mdesc["nested"] = nested_names[0]
            if len(nested_names) > 1:
                mdesc["nested2"] = nested_names[1]
        refs = node.findall("ref")
        if refs and "nested" not in mdesc:
            mdesc["nested"] = refs[0].get("id")
            if len(refs) > 1:
                mdesc["nested2"] = refs[1].get("id")
        desc["materials"].append(mdesc)
        return name

    def convert_emitter(node):
        et = node.get("type")
        props = get_props(node)
        if et == "point":
            desc["emitters"].append({
                "type": "point",
                "position": props.get("position", [0, 0, 0]),
                "intensity": props.get("intensity", [1, 1, 1]),
            })
        elif et in ("spot", "directional", "collimated"):
            desc["emitters"].append({
                "type": et,
                "position": props.get("position", [0, 0, 0]),
                "intensity": props.get(
                    "intensity", props.get(
                        "irradiance", props.get("power", [1, 1, 1]))),
                "direction": props.get("direction", [0, 0, 1]),
            })
        elif et == "constant":
            desc["emitters"].append({
                "type": "constant",
                "intensity": props.get("radiance", [1, 1, 1]),
            })
        elif et == "envmap":
            desc["emitters"].append({
                "type": "envmap",
                "filename": resolve_path(props["filename"]),
                "scale": props.get("scale", 1.0),
            })
        elif et in ("sky", "sun", "sunsky"):
            e = {"type": et,
                 "turbidity": props.get("turbidity", 3.0),
                 "scale": props.get("scale", 1.0)}
            if "sunDirection" in props:
                e["sun_direction"] = props["sunDirection"]
            desc["emitters"].append(e)
        else:
            raise ValueError(f"unsupported emitter type {et}")

    def convert_medium(node):
        mt = node.get("type")
        props = get_props(node)
        if mt == "homogeneous":
            mdesc = {
                "type": "homogeneous",
                "sigma_s": props.get("sigmaS", [0.5] * 3),
                "sigma_a": props.get("sigmaA", [0.0] * 3),
            }
        elif mt == "heterogeneous":
            vol = None
            for v in node.findall("volume"):
                if v.get("name") == "density":
                    vol = v
            if vol is None or vol.get("type") != "gridvolume":
                raise ValueError(
                    "heterogeneous medium needs a gridvolume density")
            from alvrl_tpu.io.vol import read_vol

            data, bmin, bmax = read_vol(
                resolve_path(get_props(vol)["filename"]))
            mdesc = {
                "type": "grid",
                "density": data.tolist(),
                "box_min": bmin.tolist(),
                "box_max": bmax.tolist(),
                "sigma_t": props.get("sigmaT", [1.0] * 3),
                "albedo": props.get("albedo", [0.9] * 3),
                "scale": props.get("scale", 1.0),
            }
        else:
            raise ValueError(f"unsupported medium type {mt}")
        phase = node.find("phase")
        if phase is not None:
            pt = phase.get("type")
            mdesc["phase"] = {"isotropic": "isotropic", "hg": "hg",
                              "rayleigh": "rayleigh"}.get(pt)
            if mdesc["phase"] is None:
                raise ValueError(f"unsupported phase type {pt}")
            if pt == "hg":
                mdesc["g"] = get_props(phase).get("g", 0.0)
        desc["medium"] = mdesc

    _SHAPE_KINDS = ("rectangle", "cube", "sphere", "disk", "cylinder",
                    "obj", "ply", "serialized", "hair")

    def convert_shape(node):
        st = node.get("type")
        if st not in _SHAPE_KINDS:
            raise ValueError(f"unsupported shape type {st}")
        props = get_props(node)
        sdesc = {"type": st}
        tr = node.find("transform")
        if tr is not None:
            sdesc["to_world"] = parse_transform(tr).tolist()
        if st in ("obj", "ply", "serialized", "hair"):
            sdesc["filename"] = resolve_path(props["filename"])
            if "shapeIndex" in props:
                sdesc["shape_index"] = props["shapeIndex"]
        if st == "sphere":
            sdesc["center"] = props.get("center", [0, 0, 0])
            sdesc["radius"] = props.get("radius", 1.0)
        if st == "cylinder":
            sdesc["p0"] = props.get("p0", [0, 0, 0])
            sdesc["p1"] = props.get("p1", [0, 0, 1])
            sdesc["radius"] = props.get("radius", 1.0)

        inner = node.find("bsdf")
        ref = node.find("ref")
        if inner is not None:
            sdesc["material"] = convert_bsdf(
                inner, f"shape{len(desc['shapes'])}_mat")
        elif ref is not None:
            sdesc["material"] = ref.get("id")
        else:
            sdesc["material"] = "default"

        # area emitter nested in a rectangle shape -> quad light
        em = node.find("emitter")
        if em is not None:
            if em.get("type") != "area" or st != "rectangle":
                raise ValueError(
                    "only area emitters on rectangle shapes convert")
            rad = get_props(em).get("radiance", [1, 1, 1])
            tw = np.asarray(sdesc.get("to_world", np.eye(4)), np.float64)
            corners = shp.apply_transform(
                tw, np.asarray([[-1, -1, 0], [1, -1, 0], [-1, 1, 0]],
                               np.float32))
            p0 = corners[0]
            desc["emitters"].append({
                "type": "area", "p0": p0.tolist(),
                "e1": (corners[1] - p0).tolist(),
                "e2": (corners[2] - p0).tolist(),
                "radiance": rad,
            })
            return  # the loader emits the quad geometry itself
        desc["shapes"].append(sdesc)

    for node in root:
        if node.tag == "sensor":
            props = get_props(node)
            cam = {"type": node.get("type", "perspective"),
                   "fov": props.get("fov", 60.0)}
            if "apertureRadius" in props:
                cam["aperture_radius"] = props["apertureRadius"]
            if "focusDistance" in props:
                cam["focus_distance"] = props["focusDistance"]
            lookat = node.find(".//lookat")
            if lookat is not None:
                cam["origin"] = vec(lookat.get("origin"))
                cam["target"] = vec(lookat.get("target"))
                cam["up"] = vec(lookat.get("up", "0, 1, 0"))
            film = node.find("film")
            if film is not None:
                fprops = get_props(film)
                cam["width"] = fprops.get("width", 128)
                cam["height"] = fprops.get("height", 128)
            sampler = node.find("sampler")
            if sampler is not None:
                desc["_spp"] = get_props(sampler).get("sampleCount", 16)
            desc["camera"] = cam
        elif node.tag == "integrator":
            desc["_integrator"] = node.get("type")
            desc["_integrator_props"] = get_props(node)
        elif node.tag == "emitter":
            convert_emitter(node)
        elif node.tag == "medium":
            convert_medium(node)
        elif node.tag == "bsdf":
            convert_bsdf(node, f"mat{len(desc['materials'])}")
        elif node.tag == "shape":
            convert_shape(node)
    return desc
