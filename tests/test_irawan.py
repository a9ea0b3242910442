"""Irawan-Marschner woven cloth (src/bsdfs/irawan.{h,cpp})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alvrl_tpu.bsdf import irawan as irw
from alvrl_tpu.core import warp


@pytest.fixture(scope="module")
def patterns():
    plain = irw.normalize_pattern(irw.plain_weave())
    silk = irw.normalize_pattern(irw.silk_like_weave())
    return plain, silk


def _cosine_pairs(key, n):
    k1, k2, k3 = jax.random.split(key, 3)
    wi = warp.square_to_cosine_hemisphere(jax.random.uniform(k1, (n, 2)))
    wo = warp.square_to_cosine_hemisphere(jax.random.uniform(k2, (n, 2)))
    uv = jax.random.uniform(k3, (n, 2))
    return uv, wi, wo


def test_nonnegative_and_front_only(patterns):
    for pat in patterns:
        uv, wi, wo = _cosine_pairs(jax.random.key(0), 4096)
        f = np.asarray(irw.eval_raw(pat, uv, wi, wo))
        assert np.isfinite(f).all()
        assert (f >= 0).all()
        assert f.max() > 0  # some highlight fires
        # back-facing wo must be zero
        wo_back = wo * jnp.asarray([1.0, 1.0, -1.0])
        fb = np.asarray(irw.eval_raw(pat, uv, wi, wo_back))
        assert (fb == 0).all()


def test_normalization_identity(patterns):
    """norm = N / (max_c sum f_raw/cos * pi) implies the cosine/cosine
    MC mean of eval_spec/cos is ~1/pi in the max channel (with ks=1,
    kd=0) — the reference's normalization contract
    (irawan.cpp:150-171)."""
    pat = irw.plain_weave(kd=(0, 0, 0), ks=(1, 1, 1))
    pat = irw.normalize_pattern(pat)
    uv, wi, wo = _cosine_pairs(jax.random.key(7), 20000)
    f = np.asarray(irw.eval_raw(pat, uv, wi, wo))
    mean = (f[:, 0] / np.maximum(np.asarray(wo)[:, 2], 1e-6)).mean()
    assert abs(mean - 1.0 / np.pi) / (1.0 / np.pi) < 0.35, mean


def test_filament_and_staple_paths(patterns):
    plain, silk = patterns
    # plain weave is staple (psi != 0), silk is filament (psi == 0)
    assert (np.asarray(plain.psi) != 0).all()
    assert (np.asarray(silk.psi) == 0).all()
    uv, wi, wo = _cosine_pairs(jax.random.key(3), 8192)
    f_p = np.asarray(irw.eval_raw(plain, uv, wi, wo, with_kd=False))
    f_s = np.asarray(irw.eval_raw(silk, uv, wi, wo, with_kd=False))
    assert f_p.max() > 0
    assert f_s.max() > 0


def test_sampling_weight_identity(patterns):
    pat = patterns[0]
    uv, wi, _ = _cosine_pairs(jax.random.key(5), 512)
    u2 = jax.random.uniform(jax.random.key(6), (512, 2))
    wo, weight, pdf = irw.sample_cosine(pat, uv, wi, u2)
    f = irw.eval_raw(pat, uv, wi, wo)
    expect = np.asarray(f) / np.asarray(pdf)[:, None]
    np.testing.assert_allclose(np.asarray(weight), expect, rtol=1e-4,
                               atol=1e-6)


def test_render_cloth_scene():
    from alvrl_tpu.integrators import surface
    from alvrl_tpu.scene import loader

    desc = {
        "camera": {"origin": [0, 1.2, -2.2], "target": [0, 0, 0],
                   "up": [0, 1, 0], "fov_x_deg": 55.0,
                   "width": 12, "height": 12},
        "materials": [
            {"name": "cloth", "type": "irawan", "weave": "plain"},
        ],
        "shapes": [
            {"type": "rectangle", "material": "cloth",
             "to_world": [[1.5, 0, 0, 0], [0, 0, 1.5, 0], [0, -1, 0, 0],
                          [0, 0, 0, 1]]},
        ],
        "emitters": [
            {"type": "point", "position": [1, 2.5, -1],
             "intensity": [10, 10, 10]},
        ],
    }
    scene = loader.build_scene(desc)
    assert scene.weave is not None
    img = np.asarray(surface.render_path(
        scene, jax.random.key(0), spp=8, max_depth=3))
    assert np.isfinite(img).all()
    assert img.max() > 0


DENIM_LIKE = """
/* A denim-like twill in the reference's weave-pattern DSL
   (irawan.h grammar): 3x6 tile, staple yarns, $param substitution. */
weave {
    name = "Cotton denim (test)",
    tileWidth = 3,
    tileHeight = 6,
    alpha = $alpha,          /* uniform scattering */
    beta = 12,
    ss = 0.5,
    hWidth = 0.5,
    warpArea = 8,
    weftArea = 1,
    fineness = 0,
    period = 0,
    pattern {
        1, 3, 8,
        1, 3, 5,
        1, 7, 5,
        1, 4, 5,
        6, 4, 5,
        2, 4, 5
    },
    yarn { type = warp, psi = 38, umax = 46, kappa = 2,
           width = 2.7, length = 5.1, centerU = 0.5, centerV = 0.7,
           kd = {0.1, 0.11, 0.4}, ks = {0.4, 0.4, 0.5} },
    yarn { type = warp, psi = 38, umax = 46, kappa = 2,
           width = 2.7, length = 5.1, centerU = 0.1667, centerV = 0.37,
           kd = {0.1, 0.11, 0.4}, ks = {0.4, 0.4, 0.5} },
    yarn { type = warp, psi = 38, umax = 46, kappa = 2,
           width = 2.7, length = 5.1, centerU = 0.8333, centerV = 0.03,
           kd = {0.1, 0.11, 0.4}, ks = {0.4, 0.4, 0.5} },
    yarn { type = warp, psi = 38, umax = 46, kappa = 2,
           width = 2.7, length = 5.1, centerU = 0.1667, centerV = 0.87,
           kd = {0.1, 0.11, 0.4}, ks = {0.4, 0.4, 0.5} },
    yarn { type = warp, psi = 38, umax = 46, kappa = 2,
           width = 2.7, length = 5.1, centerU = 0.8333, centerV = 0.53,
           kd = {0.1, 0.11, 0.4}, ks = {0.4, 0.4, 0.5} },
    yarn { type = weft, psi = 38, umax = 46, kappa = 2,
           width = 1, length = 3, centerU = 0.1667, centerV = 0.2537,
           kd = {0.2, 0.2, 0.5}, ks = {0.5, 0.5, 0.6} },
    yarn { type = weft, psi = 38, umax = 46, kappa = 2,
           width = 1, length = 3, centerU = 0.5, centerV = 0.5871,
           kd = {0.2, 0.2, 0.5}, ks = {0.5, 0.5, 0.6} },
    yarn { type = weft, psi = 38, umax = 46, kappa = 2,
           width = 1, length = 3, centerU = 0.8333, centerV = 0.9204,
           kd = {0.2, 0.2, 0.5}, ks = {0.5, 0.5, 0.6} }
}
"""


def test_parse_weave_dsl():
    pat = irw.parse_weave(DENIM_LIKE, params={"alpha": 0.02})
    assert pat.tile.shape == (6, 3)
    assert int(np.asarray(pat.tile).min()) == 0
    assert int(np.asarray(pat.tile).max()) == 7
    assert pat.yarn_type.shape == (8,)
    # 5 warps then 3 wefts
    assert np.asarray(pat.yarn_type)[:5].sum() == 0
    assert np.asarray(pat.yarn_type)[5:].sum() == 3
    np.testing.assert_allclose(float(pat.alpha), 0.02)
    np.testing.assert_allclose(float(pat.warp_area), 8.0)
    # degrees -> radians
    np.testing.assert_allclose(np.asarray(pat.psi),
                               np.full(8, 38 * np.pi / 180), rtol=1e-6)
    # eval works on the parsed pattern
    pat = irw.normalize_pattern(pat)
    uv, wi, wo = _cosine_pairs(jax.random.key(11), 2048)
    f = np.asarray(irw.eval_raw(pat, uv, wi, wo))
    assert np.isfinite(f).all() and (f >= 0).all() and f.max() > 0


def test_parse_weave_unresolved_param():
    with pytest.raises(ValueError, match="unresolved"):
        irw.parse_weave(DENIM_LIKE)


def test_load_weave_file(tmp_path):
    p = tmp_path / "denim.wift"
    p.write_text(DENIM_LIKE.replace("$alpha", "0.01"))
    pat = irw.load_weave_file(p, repeat_u=6.0, repeat_v=6.0)
    assert float(pat.repeat_u) == 6.0
    assert pat.tile.shape == (6, 3)
