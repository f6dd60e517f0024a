"""Multi-host initialization (BASELINE config 5, SURVEY.md §2.4/§5.8).

On a multi-host pod slice every host runs the same program; call
``init_multihost()`` before building the mesh so jax.distributed wires the
DCN coordination layer, then build the ('hosts', 'chips') mesh with
``make_host_chip_mesh``.  The render/grad code in dist/sharding.py is
expressed purely with NamedShardings, so it runs unchanged: XLA routes
the lane-sharded image over all chips and the gradient all-reduce over
ICI within hosts and DCN across them.

This module cannot be exercised in the single-host dev image (the test
suite validates the sharding semantics on a virtual 8-device CPU mesh
instead); it is the production entry point.
"""

from __future__ import annotations

import numpy as np


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks (standard TPU pod
    metadata auto-detection when no arguments are given)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_host_chip_mesh():
    """Mesh(('hosts', 'chips')) over all devices, hosts-major.

    Delegates to dist.sharding.make_mesh_2d — the SAME constructor the
    virtual-8-CPU test suite exercises (tests/test_sharding.py 2-D cases),
    so the production multi-host shape is not a faith-based code path.
    dist/sharding.py's layouts shard lanes over both axes
    (P(('hosts', 'chips'))); scene stays fully replicated."""
    import jax

    from .sharding import make_mesh_2d

    n_hosts = jax.process_count()
    per_host = len(jax.devices()) // n_hosts
    return make_mesh_2d(n_hosts, per_host)
