"""Backward Pallas kernel (ops/vrl_pallas_bwd) — AD vs same-seed FD.

Under the Pallas interpreter the on-core PRNG yields zeros on BOTH the
forward and the replaying backward kernel, so the estimator is a
deterministic function of the parameters and central finite
differences of the FORWARD must match the custom-VJP gradients
exactly (to FD truncation)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from alvrl_tpu.geometry import intersect
from alvrl_tpu.integrators.vrl import tracer
from alvrl_tpu.ops import pack as pk
from alvrl_tpu.ops.vrl_pallas_bwd import vrl_sum_diff
from alvrl_tpu.scene import presets
from alvrl_tpu.sensors import perspective


def _setup():
    scene = presets.cornell_smoke(width=16, height=8)
    scene = scene.replace(medium=scene.medium.replace(g=jnp.float32(0.4)))
    vrls = tracer.trace(scene, jax.random.key(0), 24)
    cam = scene.camera
    px, py = jnp.meshgrid(jnp.arange(16), jnp.arange(8))
    px, py = px.reshape(-1), py.reshape(-1)
    ray_o, ray_d = perspective.sample_ray(cam, px, py)
    hit = intersect.intersect_all(ray_o, ray_d, scene.vertices,
                                  scene.faces)
    tri_flat = pk.pack_tris(scene)
    seed = jnp.asarray([123], jnp.int32)

    def loss(params):
        med = scene.medium.replace(
            sigma_a=params["sa"], sigma_s=params["ss"], g=params["g"])
        sc = scene.replace(medium=med)
        v2 = vrls.replace(power=vrls.power * params["pscale"])
        ray_pack = pk.pack_rays(sc, ray_o, ray_d, hit)
        vrl_pack = pk.pack_vrls(v2)
        med_pack = pk.pack_medium(sc)
        out = vrl_sum_diff(ray_pack, vrl_pack, med_pack, tri_flat, seed,
                           2, 1, True, 0)
        return jnp.mean(out)

    p0 = {"sa": scene.medium.sigma_a, "ss": scene.medium.sigma_s,
          "g": scene.medium.g, "pscale": jnp.float32(1.0)}
    return loss, p0


def test_bwd_kernel_matches_fd():
    loss, p0 = _setup()
    with pltpu.force_tpu_interpret_mode():
        g_ad = jax.grad(loss)(p0)
        l0 = float(loss(p0))
        assert np.isfinite(l0) and l0 > 0

        def fd(name, idx=None, eps=2e-3):
            def shift(s):
                q = dict(p0)
                if idx is None:
                    q[name] = p0[name] + s
                else:
                    q[name] = p0[name].at[idx].add(s)
                return float(loss(q))
            return (shift(eps) - shift(-eps)) / (2 * eps)

        checks = [("g", None), ("pscale", None), ("sa", 0), ("ss", 1)]
        for name, idx in checks:
            v_fd = fd(name, idx)
            v_ad = float(g_ad[name] if idx is None else g_ad[name][idx])
            denom = max(abs(v_fd), 1e-6)
            assert abs(v_ad - v_fd) / denom < 5e-3, (name, idx, v_ad, v_fd)
