"""Multi-host (multi-process) execution path.

The reference's only multi-worker compute is the Postgres parallel index
build — real OS processes coordinating through shared memory
(reference: pgvectorscale/src/access_method/build.rs:616-716,
build/parallel.rs).  The TPU analog of "more workers" is "more hosts":
a v5e pod slice runs one JAX process per host, each owning its local
chips, with jax.distributed coordinating process membership and XLA
routing collectives over ICI within a host-block and DCN across hosts.

This environment exposes a single tunneled chip, so a real multi-process
run cannot execute here — but the code path exists and is exercised in
single-process form (``initialize_from_env`` is a no-op at world size 1,
``global_mesh`` then degenerates to the local-device mesh the rest of the
framework already uses; tests/test_mesh.py covers that degenerate path on
the virtual 8-device CPU mesh).

Usage on a real pod slice (one command per host):

    PGVS_TPU_COORDINATOR=10.0.0.1:8476 \\
    PGVS_TPU_PROCESS_ID=0 PGVS_TPU_NUM_PROCESSES=4 \\
    python your_serving_script.py

    # inside the script
    from pgvectorscale_tpu.parallel import multihost
    multihost.initialize_from_env()          # jax.distributed.initialize
    mesh = multihost.global_mesh()          # spans ALL hosts' devices
    index = ShardedDiskannIndex.build(vectors, config, mesh=mesh, ...)

Sharding design (docs/DESIGN.md "Memory budget"): the row-sharded store
puts shard p on mesh position p, so every per-shard traversal is
device-local (zero cross-device traffic during the while_loop) and the
only collective is the final top-k all-gather — which XLA places on ICI
within a host and DCN across hosts exactly once per query batch.  The
50M x 768 int8 configuration needs 8 chips (~11 GB/chip); a 16-chip
2-host slice leaves headroom for query batches.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

_INITIALIZED = False

COORDINATOR_ENV = "PGVS_TPU_COORDINATOR"
PROCESS_ID_ENV = "PGVS_TPU_PROCESS_ID"
NUM_PROCESSES_ENV = "PGVS_TPU_NUM_PROCESSES"


def initialize_from_env() -> bool:
    """Join the multi-process world described by the PGVS_TPU_* env vars
    (coordinator address, process id, world size) via
    ``jax.distributed.initialize``.  Returns True when a multi-process
    world was joined, False when the env says single-process (the
    degenerate path — everything below still works on the local mesh).

    Must run BEFORE first device use, same contract as
    jax.distributed.initialize itself.  Idempotent.
    """
    global _INITIALIZED
    coordinator = os.environ.get(COORDINATOR_ENV)
    num = int(os.environ.get(NUM_PROCESSES_ENV, "1"))
    if coordinator is None or num <= 1:
        return False
    if _INITIALIZED:
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num,
        process_id=int(os.environ.get(PROCESS_ID_ENV, "0")),
    )
    _INITIALIZED = True
    return True


def world() -> tuple[int, int]:
    """(process_id, num_processes) of the current world (0, 1 when
    single-process)."""
    return jax.process_index(), jax.process_count()


def global_mesh(
    axis_name: str = "n", n_devices: Optional[int] = None
) -> Mesh:
    """One-axis mesh over EVERY device in the world (all hosts' chips, in
    process order so shard p's traversal stays on the host that owns it).
    Degenerates to the local-device mesh at world size 1."""
    devices = jax.devices()  # global view after initialize: all processes
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def hybrid_mesh(
    ici_axis: str = "q", dcn_axis: str = "host"
) -> Mesh:
    """Two-axis mesh: hosts on the (slow) DCN axis, each host's chips on
    the (fast) ICI axis.  Lay data-parallel query batches over ``ici``
    and index replicas/shards over ``dcn`` so the per-step collectives
    ride ICI and only the rare cross-replica traffic crosses DCN — the
    standard scaling-book layout.  Uses
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` when
    running multi-host; degenerates to a [1, local] mesh otherwise."""
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        per_host = jax.local_device_count()
        dev = mesh_utils.create_hybrid_device_mesh(
            (per_host,),
            (jax.process_count(),),
        )
        return Mesh(dev.reshape(jax.process_count(), per_host),
                    (dcn_axis, ici_axis))
    devices = np.asarray(jax.devices()).reshape(1, -1)
    return Mesh(devices, (dcn_axis, ici_axis))
