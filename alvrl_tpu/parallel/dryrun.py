"""Multi-chip dryrun: build an n-device mesh, jit the full differentiable
render step over it (rays x vrls shardings), run one step on tiny shapes.
Executed by the driver with virtual CPU devices to validate the sharded
path compiles and runs without real chips."""

from __future__ import annotations


def run_dryrun(n_devices: int) -> None:
    import jax

    if len(jax.devices()) < n_devices:
        # started without enough devices: re-init on CPU with a forced
        # host device count (driver normally sets this for us)
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices} JAX_PLATFORMS=cpu"
        )

    import jax.numpy as jnp

    from alvrl_tpu.integrators.vrl import tracer
    from alvrl_tpu.integrators.vrl.integrate import VRLConfig
    from alvrl_tpu.parallel import render as prender
    from alvrl_tpu.parallel.mesh import make_mesh
    from alvrl_tpu.scene import presets

    mesh = make_mesh(n_devices)
    scene = presets.cornell_smoke(width=16, height=16)
    cfg = VRLConfig(vrl_chunk=16, vol_vol_samples=2, vol_surf_samples=2)
    target = jnp.zeros((16, 16, 3))

    step = jax.jit(
        lambda sc, k, t: prender.train_step(
            mesh, sc, k, t, cfg, num_particles=8,
            tracer_cfg=tracer.TracerConfig(max_depth=4),
        )
    )
    loss, grads = step(scene, jax.random.key(1), target)
    jax.block_until_ready((loss, grads))
    assert jnp.isfinite(loss), loss
    for name, g in grads.items():
        assert bool(jnp.all(jnp.isfinite(g))), (name, g)
    print(
        f"dryrun_multichip ok on mesh {dict(mesh.shape)}: "
        f"loss={float(loss):.6g}, "
        + ", ".join(f"|d{k}|={float(jnp.abs(v).sum()):.3g}" for k, v in grads.items())
    )
