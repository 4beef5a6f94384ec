"""Device-mesh parallelism.

TPU-native replacement for the reference's process-parallel build and its
DSM/condition-variable machinery (reference: pgvectorscale/src/access_method/
build/parallel.rs, build.rs:210-460,616-716).  Instead of Postgres parallel
workers communicating through shared-memory pages, the index tensors live on
a ``jax.sharding.Mesh`` and XLA inserts the collectives:

- **Query data-parallelism** (``sharded_search``): queries are sharded over
  the ``q`` mesh axis, index arrays are replicated — the serving
  configuration.  This is strictly stronger than the reference, which has
  no parallel index scan at all (amcanparallel=false, mod.rs:63).
- **Build wave parallelism** (``sharded_build_step``): a wave's beam
  searches + prunes shard over ``q``; the adjacency scatter produces
  identical replicated updates on every device.  This is the analog of the
  reference's parallel heap scan feeding per-worker inserts
  (build.rs:616-716) — the "flush neighbor cache for cross-worker
  visibility" pattern (neighbor_store.rs:172-196) disappears because the
  adjacency tensor IS the shared state.

Capacity sharding of the vector/code tensors themselves (for indexes larger
than one chip's HBM) is planned as a separate row-sharded store.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DistanceType, IndexConfig
from ..store import GraphArrays, INVALID_ID
from ..graph.build import append_backlinks, prune_candidate_sets
from ..graph.search import beam_search


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "q") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_arrays(arrays: GraphArrays, mesh: Mesh) -> GraphArrays:
    """Place every index tensor replicated over the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), arrays)


def sharded_search(
    mesh: Mesh,
    arrays: GraphArrays,
    query_vecs: jax.Array,
    query_codes: jax.Array,
    query_labels: jax.Array,
    start_ids: jax.Array,
    *,
    search_list_size: int,
    max_iters: int,
    distance_type: DistanceType,
    use_codes: bool,
    filtered: bool,
):
    """Batched beam search with queries sharded over the mesh's q axis.

    The query batch dimension must be divisible by the mesh size.
    """
    qs = NamedSharding(mesh, P("q"))
    query_vecs = jax.device_put(query_vecs, qs)
    query_codes = jax.device_put(query_codes, qs)
    query_labels = jax.device_put(query_labels, qs)
    start_ids = jax.device_put(start_ids, qs)
    arrays = replicate_arrays(arrays, mesh)
    return beam_search(
        arrays,
        query_vecs,
        query_codes,
        query_labels,
        start_ids,
        search_list_size=search_list_size,
        max_iters=max_iters,
        distance_type=distance_type,
        use_codes=use_codes,
        filtered=filtered,
    )


def build_wave_step(
    arrays: GraphArrays,
    wave_ids: jax.Array,  # i32[B] — already-stored rows to insert
    *,
    search_list_size: int,
    max_iters: int,
    distance_type: DistanceType,
    use_codes: bool,
    prune_use_codes: bool = None,
    alphas: tuple,
    num_neighbors: int,
    r_max: int,
    code_bits: int,
    trunc_dims: int = 0,
) -> GraphArrays:
    """One fully-jitted build wave — the framework's "training step", the
    unit that shards over the device mesh.  Delegates to the fused
    ``_wave_step_jit`` (search + prune + adjacency scatter + backlinks +
    in-device overflow prune)."""
    from ..graph.build import _wave_step_jit

    return _wave_step_jit(
        arrays,
        wave_ids,
        jnp.asarray(0, dtype=jnp.int32),
        search_list_size=search_list_size,
        max_iters=max_iters,
        brute=False,
        slice_rows=1,
        use_codes=use_codes,
        prune_use_codes=prune_use_codes,
        code_bits=code_bits,
        distance_type=distance_type,
        alphas=alphas,
        num_neighbors=num_neighbors,
        labeled=False,
        trunc_dims=trunc_dims,
    )


def sharded_build_step(
    mesh: Mesh,
    arrays: GraphArrays,
    wave_ids: jax.Array,
    config: IndexConfig,
    *,
    max_iters: Optional[int] = None,
) -> GraphArrays:
    """Run one build wave with the wave sharded over the mesh's q axis."""
    from ..graph.prune import alpha_schedule

    qs = NamedSharding(mesh, P("q"))
    wave_ids = jax.device_put(wave_ids, qs)
    arrays = replicate_arrays(arrays, mesh)
    l = config.search_list_size
    return build_wave_step(
        arrays,
        wave_ids,
        search_list_size=l,
        max_iters=max_iters or (l + l // 2 + 16),
        distance_type=config.distance_type,
        use_codes=config.build_traversal_uses_codes,
        prune_use_codes=config.build_prune_uses_codes,
        alphas=alpha_schedule(config.max_alpha),
        num_neighbors=config.num_neighbors,
        r_max=config.max_neighbors_during_build,
        code_bits=config.dims_to_index * config.bits_per_dimension,
        trunc_dims=config.dims_to_index,
    )
