"""Multi-host runtime entry.

Counterpart of the reference's node bring-up (mtssrv + the -c host list,
mitsuba.cpp:296-314): on TPU pods there is no user-level message loop —
`jax.distributed.initialize` joins the processes, a global Mesh spans
every chip, and the same shard_map render step (parallel.render) runs
SPMD; XLA routes intra-slice reductions over ICI and cross-slice over
DCN.

Usage on each host:
    from alvrl_tpu.parallel import multihost
    multihost.initialize()           # env-driven on TPU pods
    mesh = multihost.global_mesh()   # ('rays', 'vrls') over all chips
"""

from __future__ import annotations

import jax

from alvrl_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Join the multi-host runtime. On TPU pods all arguments come from
    the environment; pass them explicitly for CPU/GPU multiprocess
    testing (jax.distributed semantics)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(shape=None):
    """Mesh over every device of every process."""
    return make_mesh(len(jax.devices()), shape=shape)


def is_primary() -> bool:
    return jax.process_index() == 0
