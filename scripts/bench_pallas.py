"""Compare the Pallas VRL kernel against the XLA path on TPU."""
import sys, time, timeit
sys.path.insert(0, "/root/repo")
import scripts._cache  # noqa: F401
import jax, numpy as np
from alvrl_tpu.scene import presets
from alvrl_tpu.integrators.vrl import tracer, integrator, vrl as vrl_mod
from alvrl_tpu.integrators.vrl.integrate import VRLConfig

W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NV = int(sys.argv[2]) if len(sys.argv) > 2 else 256

t0 = time.time()
scene = presets.cornell_smoke(width=W, height=W)
raw = tracer.trace(scene, jax.random.key(0), max(NV // 6, 16), tracer.TracerConfig(max_depth=8))
vrls = vrl_mod.compact(raw, NV, slots_per_particle=8)
cfg = VRLConfig(vrl_chunk=128)
print("traced", time.time() - t0, flush=True)

img_ref = integrator.render_with_vrls(scene, vrls, jax.random.key(1), cfg, ray_tile=4096)
img_ref.block_until_ready(); print("xla compiled", time.time() - t0, flush=True)
img_pl = integrator.render_with_vrls_pallas(scene, vrls, jax.random.key(1), cfg)
img_pl.block_until_ready(); print("pallas compiled", time.time() - t0, flush=True)

f = lambda: integrator.render_with_vrls_pallas(scene, vrls, jax.random.key(2), cfg).block_until_ready()
tp = timeit.timeit(f, number=3) / 3
g = lambda: integrator.render_with_vrls(scene, vrls, jax.random.key(2), cfg, ray_tile=4096).block_until_ready()
tx = timeit.timeit(g, number=3) / 3
print(f"pallas {tp*1e3:.1f}ms  xla {tx*1e3:.1f}ms  speedup {tx/tp:.2f}x", flush=True)
pair_evals = W * W * NV * 4
print(f"pallas pair-sample evals/s: {pair_evals/tp:.3g}  xla: {pair_evals/tx:.3g}", flush=True)

a, b = np.asarray(img_ref), np.asarray(img_pl)
rel = np.abs(a - b) / (np.abs(a) + 1e-2)
print(f"mean ratio {b.mean()/max(a.mean(),1e-9):.4f}  relerr mean {rel.mean():.3f}  finite {np.isfinite(b).all()}")
