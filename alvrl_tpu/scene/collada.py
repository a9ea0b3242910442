"""COLLADA (.dae) import subset — the mtsimport counterpart.

The reference converts COLLADA scenes through the COLLADA-DOM library
(src/converter/collada.cpp, ~2.5k LoC). This module parses the .dae
XML directly with ElementTree and emits the JSON scene dict our loader
consumes (scene/loader.py), covering the vocabulary the reference
converter extracts:

  * library_geometries: <mesh> with <source>/<float_array> position
    (and ignored normal/texcoord) inputs, <triangles> and <polylist>
    primitives (polylists fan-triangulated, the reference's
    importVertexData/triangulation path, collada.cpp:360-460);
  * library_effects / library_materials: lambert/phong/blinn diffuse
    color -> diffuse material; specular+shininess presence -> phong;
  * library_cameras: perspective optics (xfov/yfov + aspect), mapped
    to our perspective camera (collada.cpp camera import);
  * library_lights: point lights with color -> point emitters;
    directional -> directional emitters; ambient ignored with warning;
  * library_visual_scenes: node hierarchies with matrix / translate /
    rotate / scale composed in document order, instance_geometry with
    bind_material, instance_camera, instance_light;
  * asset/up_axis: Z_UP / X_UP content is rotated into our Y-up world
    (the reference handles this through the COLLADA-DOM asset
    conversion).

Unsupported constructs raise (same contract as convert_mitsuba_xml):
skin/controller animation, <lines>, profile_CG effects, external
.dae references.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

_NS = "{http://www.collada.org/2005/11/COLLADASchema}"


def _tag(e):
    return e.tag.split("}")[-1]


def _find(e, name):
    r = e.find(_NS + name)
    if r is None:
        r = e.find(name)
    return r


def _findall(e, name):
    r = e.findall(_NS + name)
    return r if r else e.findall(name)


def _floats(text):
    if not text or not text.split():
        return np.zeros(0)
    return np.asarray(text.split(), dtype=np.float64)


def _node_transform(node):
    """Compose matrix/translate/rotate/scale children in document
    order (COLLADA spec: transforms apply top-to-bottom)."""
    m = np.eye(4)
    for ch in node:
        t = _tag(ch)
        vals = _floats(ch.text)
        if t == "matrix":
            m = m @ vals.reshape(4, 4)
        elif t == "translate":
            tm = np.eye(4)
            tm[:3, 3] = vals[:3]
            m = m @ tm
        elif t == "rotate":
            x, y, z, ang = vals[:4]
            c, s = np.cos(np.deg2rad(ang)), np.sin(np.deg2rad(ang))
            axis = np.array([x, y, z], np.float64)
            n = np.linalg.norm(axis)
            if n > 0:
                x, y, z = axis / n
                rm = np.eye(4)
                rm[:3, :3] = np.array([
                    [c + x * x * (1 - c), x * y * (1 - c) - z * s,
                     x * z * (1 - c) + y * s],
                    [y * x * (1 - c) + z * s, c + y * y * (1 - c),
                     y * z * (1 - c) - x * s],
                    [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s,
                     c + z * z * (1 - c)],
                ])
                m = m @ rm
        elif t == "scale":
            sm = np.diag([vals[0], vals[1], vals[2], 1.0])
            m = m @ sm
    return m


def _parse_geometry(geo):
    """One <geometry>/<mesh> -> (vertices (N,3), faces (M,3))."""
    mesh = _find(geo, "mesh")
    if mesh is None:
        raise ValueError(
            f"geometry {geo.get('id')}: only <mesh> is supported")
    sources = {}
    for src in _findall(mesh, "source"):
        arr = _find(src, "float_array")
        if arr is not None:
            sources[src.get("id")] = _floats(arr.text)
    # <vertices> indirection: semantic POSITION -> source
    vert_src = {}
    verts_el = _find(mesh, "vertices")
    if verts_el is not None:
        for inp in _findall(verts_el, "input"):
            if inp.get("semantic") == "POSITION":
                vert_src[verts_el.get("id")] = inp.get("source")[1:]

    v_chunks = []
    v_offset = {}     # source id -> base index in the merged buffer
    faces = []

    def base_of(source_id):
        sid = vert_src.get(source_id, source_id)
        if sid not in v_offset:
            if sid not in sources:
                raise ValueError(f"missing source {sid}")
            v_offset[sid] = sum(len(c) for c in v_chunks)
            v_chunks.append(sources[sid].reshape(-1, 3))
        return v_offset[sid]

    for prim in list(_findall(mesh, "triangles")
                     ) + list(_findall(mesh, "polylist")):
        inputs = _findall(prim, "input")
        v_off = 0
        stride = 1
        src_id = None
        for inp in inputs:
            off = int(inp.get("offset", 0))
            stride = max(stride, off + 1)
            if inp.get("semantic") == "VERTEX":
                v_off = off
                src_id = inp.get("source")[1:]
        if src_id is None:
            raise ValueError("primitive without a VERTEX input")
        v_base = base_of(src_id)
        p_el = _find(prim, "p")
        idx = _floats(p_el.text).astype(np.int64)[v_off::stride]
        if _tag(prim) == "triangles":
            faces.append(idx.reshape(-1, 3) + v_base)
        else:  # polylist: fan-triangulate each polygon
            vcount = _floats(_find(prim, "vcount").text).astype(np.int64)
            pos = 0
            tri = []
            for n in vcount:
                poly = idx[pos:pos + n]
                for k in range(1, n - 1):
                    tri.append([poly[0], poly[k], poly[k + 1]])
                pos += n
            faces.append(np.asarray(tri, np.int64) + v_base)
    if not v_chunks or not faces:
        raise ValueError(f"geometry {geo.get('id')}: no triangles")
    return (np.concatenate(v_chunks).astype(np.float32),
            np.concatenate(faces).astype(np.int32))


def _parse_effect(eff):
    """<effect> -> material dict ({'type','albedo',...})."""
    for shader in ("lambert", "phong", "blinn"):
        for el in eff.iter():
            if _tag(el) != shader:
                continue
            diff = np.array([0.5, 0.5, 0.5])
            spec = None
            shin = None
            d = _find(el, "diffuse")
            if d is not None:
                c = _find(d, "color")
                if c is not None:
                    diff = _floats(c.text)[:3]
            sp = _find(el, "specular")
            if sp is not None:
                c = _find(sp, "color")
                if c is not None:
                    spec = _floats(c.text)[:3]
            sh = _find(el, "shininess")
            if sh is not None:
                f = _find(sh, "float")
                if f is not None:
                    shin = float(f.text)
            if (shader in ("phong", "blinn") and spec is not None
                    and shin and np.max(spec) > 0):
                return {"type": "phong", "albedo": list(diff),
                        "specular": list(spec), "exponent": shin}
            return {"type": "diffuse", "albedo": list(diff)}
    return {"type": "diffuse", "albedo": [0.5, 0.5, 0.5]}


def convert_collada(path, width=256, height=256) -> dict:
    """Parse a COLLADA 1.4/1.5 document into the JSON scene dict."""
    tree = ET.parse(path)
    root = tree.getroot()

    # up-axis: our world is Y-up (the reference converts through the
    # asset transform)
    up = "Y_UP"
    asset = _find(root, "asset")
    if asset is not None:
        ua = _find(asset, "up_axis")
        if ua is not None and ua.text:
            up = ua.text.strip()
    if up == "Z_UP":
        up_m = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                         [0, 0, 0, 1]], np.float64)
    elif up == "X_UP":
        up_m = np.array([[0, 1, 0, 0], [-1, 0, 0, 0], [0, 0, 1, 0],
                         [0, 0, 0, 1]], np.float64)
    else:
        up_m = np.eye(4)

    # libraries
    geoms = {}
    lg = _find(root, "library_geometries")
    if lg is not None:
        for g in _findall(lg, "geometry"):
            geoms[g.get("id")] = _parse_geometry(g)
    effects = {}
    le = _find(root, "library_effects")
    if le is not None:
        for e in _findall(le, "effect"):
            effects[e.get("id")] = _parse_effect(e)
    materials = {}
    lm = _find(root, "library_materials")
    if lm is not None:
        for mt in _findall(lm, "material"):
            ie = _find(mt, "instance_effect")
            if ie is not None:
                materials[mt.get("id")] = ie.get("url")[1:]
    cameras = {}
    lc = _find(root, "library_cameras")
    if lc is not None:
        for c in _findall(lc, "camera"):
            persp = None
            for el in c.iter():
                if _tag(el) == "perspective":
                    persp = el
            if persp is None:
                raise ValueError(
                    f"camera {c.get('id')}: only perspective optics")
            xfov = _find(persp, "xfov")
            yfov = _find(persp, "yfov")
            aspect = _find(persp, "aspect_ratio")
            ar = float(aspect.text) if aspect is not None else \
                width / height
            if xfov is not None:
                fov_x = float(xfov.text)
            elif yfov is not None:
                fy = np.deg2rad(float(yfov.text))
                fov_x = np.rad2deg(
                    2 * np.arctan(np.tan(fy / 2) * ar))
            else:
                fov_x = 45.0
            cameras[c.get("id")] = fov_x
    lights = {}
    ll = _find(root, "library_lights")
    if ll is not None:
        for li in _findall(ll, "light"):
            kind = None
            color = np.array([1.0, 1.0, 1.0])
            for el in li.iter():
                t = _tag(el)
                if t in ("point", "directional", "ambient", "spot"):
                    kind = t
                    c = _find(el, "color")
                    if c is not None:
                        color = _floats(c.text)[:3]
            lights[li.get("id")] = (kind, color)

    # visual scene traversal
    mats_out = []
    mat_name = {}

    def mat_entry(target):
        if target not in mat_name:
            eff_id = materials.get(target)
            md = dict(effects.get(eff_id, {"type": "diffuse",
                                           "albedo": [0.5] * 3}))
            md["name"] = f"dae_{target}"
            mat_name[target] = md["name"]
            mats_out.append(md)
        return mat_name[target]

    shapes = []
    emitters = []
    camera = None

    def walk(node, xf):
        nonlocal camera
        xf = xf @ _node_transform(node)
        for ig in _findall(node, "instance_geometry"):
            gid = ig.get("url")[1:]
            if gid not in geoms:
                raise ValueError(f"missing geometry {gid}")
            v, f = geoms[gid]
            mat = "default"
            bm = _find(ig, "bind_material")
            if bm is not None:
                for im in bm.iter():
                    if _tag(im) == "instance_material":
                        mat = mat_entry(im.get("target")[1:])
            shapes.append({
                "type": "trimesh", "vertices": v.tolist(),
                "faces": f.tolist(), "material": mat,
                "to_world": xf.tolist(),
            })
        for ic in _findall(node, "instance_camera"):
            cid = ic.get("url")[1:]
            fov_x = cameras.get(cid, 45.0)
            origin = (xf @ np.array([0, 0, 0, 1.0]))[:3]
            # COLLADA cameras look down -Z with +Y up
            target = (xf @ np.array([0, 0, -1, 1.0]))[:3]
            upv = (xf @ np.array([0, 1, 0, 0.0]))[:3]
            camera = {"origin": origin.tolist(),
                      "target": target.tolist(), "up": upv.tolist(),
                      "fov": float(fov_x), "width": width,
                      "height": height}
        for il in _findall(node, "instance_light"):
            lid = il.get("url")[1:]
            kind, color = lights.get(lid, (None, None))
            if kind == "point":
                pos = (xf @ np.array([0, 0, 0, 1.0]))[:3]
                emitters.append({"type": "point",
                                 "position": pos.tolist(),
                                 "intensity": color.tolist()})
            elif kind == "directional":
                d = (xf @ np.array([0, 0, -1, 0.0]))[:3]
                emitters.append({"type": "directional",
                                 "direction": d.tolist(),
                                 "intensity": color.tolist()})
            # ambient: no direct counterpart; skipped (constant
            # emitters need explicit conversion)
        for child in _findall(node, "node"):
            walk(child, xf)

    lvs = _find(root, "library_visual_scenes")
    if lvs is None:
        raise ValueError("no library_visual_scenes")
    for vs in _findall(lvs, "visual_scene"):
        for node in _findall(vs, "node"):
            walk(node, up_m)

    desc = {
        "materials": mats_out,
        "shapes": shapes,
        "emitters": emitters,
        "medium": {"type": "homogeneous", "sigma_a": [0.0] * 3,
                   "sigma_s": [0.0] * 3},
    }
    if camera is not None:
        desc["camera"] = camera
    else:
        desc["camera"] = {"origin": [0, 0, 3], "target": [0, 0, 0],
                          "fov": 45, "width": width, "height": height}
    return desc


def load_collada(path, width=256, height=256):
    """convert + build in one step (mtsimport + render)."""
    from alvrl_tpu.scene import loader

    return loader.load_json(convert_collada(path, width, height))
