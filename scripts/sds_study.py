"""SDS stress study (VERDICT r04 next-round item 5).

The round-4 caustic justification was a 12x12 image-mean gate; the
judge asked for the family manifold exploration actually exists for: a
caustic seen THROUGH a specular surface (SDS), at >= 64^2, compared
REGION-wise (caustic crop, not image mean).

Scene: glass sphere over the floor casts an area-light caustic; a
glass pane stands between the camera and the caustic, so every camera
ray to the caustic crosses S...S — the eye side of every caustic path
is specular-bounded (reference: the SDS discussion around
/root/reference/src/libbidir/manifold.cpp, mut_manifold.cpp).

Arms (k independent runs each):
  gt   — long-run path tracer (the unbiased reference)
  bdpt — render_bdpt at a matched long budget (cross-check)
  mlt  — PSS-over-BDPT Metropolis (the machinery that replaces the
         reference's path-space mutations)

Metric: per 4x4-pixel block inside the CAUSTIC CROP (blocks whose gt
mean exceeds 1.5x the floor median): z-score of (mlt - gt) against
the runs' self-noise. A mean-level test cannot see a mis-weighted
caustic that redistributes energy spatially; this can.

Writes data/sds_study.json. Run: python scripts/sds_study.py [quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401

import jax
import numpy as np

from alvrl_tpu.integrators import bdpt, mlt
from alvrl_tpu.integrators import surface
from alvrl_tpu.scene import loader


def sds_scene(size=64):
    pane = [[0.9, 0, 0, 0.0],
            [0, 0.7, 0, -0.3],
            [0, 0, 0.02, -0.35],
            [0, 0, 0, 1.0]]
    desc = {
        "camera": {"origin": [0, 0.45, -0.95], "target": [0, -0.9, 0.25],
                   "fov": 55, "width": size, "height": size},
        "medium": {"type": "homogeneous", "sigma_s": [0.0] * 3,
                   "sigma_a": [0.0] * 3},
        "materials": [
            {"name": "white", "type": "diffuse",
             "albedo": [0.7, 0.7, 0.7]},
            {"name": "glass", "type": "dielectric", "eta": 1.5},
        ],
        "shapes": [
            {"type": "cube", "material": "white", "flip_normals": True},
            {"type": "sphere", "material": "glass",
             "center": [0.0, -0.55, 0.35], "radius": 0.28,
             "n_theta": 24, "n_phi": 48},
            {"type": "cube", "material": "glass", "to_world": pane},
        ],
        "emitters": [
            # small bright light BEYOND the sphere (z=0.8): the
            # refracted focus lands IN FRONT of the sphere on the
            # visible floor (a light above/behind throws the caustic
            # behind the sphere where the camera cannot see it)
            {"type": "area", "p0": [-0.125, 0.998, 0.775],
             "e1": [0.25, 0, 0], "e2": [0, 0, 0.25],
             "radiance": [60, 60, 60]},
        ],
    }
    return loader.load_json(desc)


def block_means(img, bs=4):
    h, w = img.shape[:2]
    lum = img.mean(axis=-1)
    return lum.reshape(h // bs, bs, w // bs, bs).mean(axis=(1, 3))


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    size = 64
    k_runs = 3 if quick else 4
    spp_gt = 256 if quick else 1024
    spp_bdpt = 64 if quick else 192
    n_mut = 192 if quick else 512
    n_chains = 2048 if quick else 4096

    scene = sds_scene(size)
    cfg_b = bdpt.BDPTConfig(n_eye=5, n_light=4, ray_tile=1024)
    cfg_m = mlt.MLTConfig(n_eye=5, n_light=4, n_chains=n_chains,
                          n_mutations=n_mut)

    def timed(label, fn, keys):
        runs = []
        t0 = time.time()
        for k in keys:
            runs.append(np.asarray(fn(k)))
        dt = time.time() - t0
        print(f"{label}: {dt:.1f}s for {len(keys)} runs", file=sys.stderr)
        return runs, dt

    runs_gt, t_gt = timed(
        "gt path", lambda k: surface.render_path(
            scene, k, spp=spp_gt, max_depth=8, ray_tile=1024),
        [jax.random.key(100 + i) for i in range(k_runs)])
    if not quick:
        runs_bd, t_bd = timed(
            "bdpt", lambda k: bdpt.render_bdpt(scene, k, spp=spp_bdpt,
                                               cfg=cfg_b),
            [jax.random.key(200 + i) for i in range(k_runs)])
    else:  # quick: gt + mlt only (the bdpt arm alone costs ~13 min)
        runs_bd, t_bd = None, 0.0
    runs_ml, t_ml = timed(
        "pss-mlt", lambda k: mlt.render_mlt(scene, k, cfg_m),
        [jax.random.key(300 + i) for i in range(k_runs)])

    bs = 4
    gt_blocks = np.stack([block_means(r, bs) for r in runs_gt])
    gt_mean = gt_blocks.mean(axis=0)
    # caustic crop: lower image half, blocks brighter than 1.5x the
    # median of that half (the focused light)
    hh = gt_mean.shape[0] // 2
    floor_med = np.median(gt_mean[hh:])
    crop = np.zeros_like(gt_mean, bool)
    crop[hh:] = gt_mean[hh:] > 1.5 * floor_med
    n_crop = int(crop.sum())
    print(f"caustic crop: {n_crop} blocks (floor median "
          f"{floor_med:.3f}, crop mean {gt_mean[crop].mean():.3f})",
          file=sys.stderr)

    def region_z(runs):
        b = np.stack([block_means(r, bs) for r in runs])
        m = b.mean(axis=0)
        v = b.var(axis=0, ddof=1) / len(runs)
        v_gt = gt_blocks.var(axis=0, ddof=1) / len(runs_gt)
        z = (m - gt_mean) / np.sqrt(np.maximum(v + v_gt, 1e-12))
        zc = z[crop]
        return dict(
            max_abs_z=float(np.abs(zc).max()),
            frac_z_gt3=float((np.abs(zc) > 3).mean()),
            mean_ratio=float(m[crop].mean() / gt_mean[crop].mean()),
        )

    res_bd = region_z(runs_bd) if runs_bd is not None else None
    res_ml = region_z(runs_ml)
    out = dict(size=size, quick=quick, k_runs=k_runs, spp_gt=spp_gt,
               spp_bdpt=spp_bdpt, n_chains=n_chains, n_mut=n_mut,
               n_crop_blocks=n_crop,
               bdpt=res_bd, mlt=res_ml,
               seconds=dict(gt=t_gt, bdpt=t_bd, mlt=t_ml))
    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "sds_study.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
