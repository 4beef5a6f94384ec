"""Flat tensor graph store.

TPU-native replacement for the reference's page/persistence layer
(reference: pgvectorscale/src/util/ — WritablePage, Tape, ChainTape, rkyv
node archives) and node layouts (sbq/node.rs, plain/node.rs).

Instead of 8KB Postgres pages holding rkyv-serialized nodes, every index
component is a flat, preallocated, structure-of-arrays HBM tensor:

- ``vectors``    f32[cap, D]   — full-precision vectors (the analog of the
                                 heap tuples the reference rescores against,
                                 table_slot.rs:13-53); the tier knob
                                 ``IndexConfig.vector_dtype`` stores them as
                                 bf16 (half HBM) or int8 (quarter HBM, per-row
                                 symmetric scale in ``vec_scales``)
- ``vec_scales`` f32[cap]      — per-row dequantization scale for the int8
                                 tier (all-ones otherwise; 4 bytes/row is
                                 noise next to the D-wide row)
- ``codes``      u32[cap, W]   — packed SBQ codes (sbq/node.rs bq_vector)
- ``adjacency``  i32[cap, R]   — neighbor ids, ``-1`` terminated/padded (the
                                 analog of the fixed-size neighbor array with
                                 InvalidBlockNumber terminator,
                                 sbq/node.rs:380-395)
- ``node_labels`` i32[cap, L]  — per-node label sets (labels/mod.rs)
- ``deleted``    bool[cap]     — vacuum tombstones (the analog of marking the
                                 heap pointer invalid, vacuum.rs:104-131)

Node ids are dense int32 indices — the analog of ItemPointer
(util/mod.rs:166-171); id distance ``|i - j|`` supplies the prune tiebreak.

Start nodes (graph/start_nodes.rs:16-93) are small dense arrays: a scalar
default start plus a (label -> node id) table.

Capacity grows by host-side doubling (the analog of relation extension,
page.rs:108-245); growth is amortized and re-jits at most O(log N) times.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import IndexConfig
from .labels import LABEL_SENTINEL

INVALID_ID = -1  # analog of InvalidBlockNumber termination


class GraphArrays(NamedTuple):
    """Device state of the index. A pytree of fixed-shape arrays."""

    vectors: jax.Array  # f32[cap, D]
    codes: jax.Array  # u32[cap, W]  (W == 0 for plain storage)
    adjacency: jax.Array  # i32[cap, R_max]
    node_labels: jax.Array  # i32[cap, Lmax]  (Lmax == 0 when unlabeled)
    deleted: jax.Array  # bool[cap]
    count: jax.Array  # i32 scalar — number of live slots
    default_start: jax.Array  # i32 scalar, INVALID_ID when graph empty
    label_start_keys: jax.Array  # i32[label_cap], LABEL_SENTINEL-padded
    label_start_ids: jax.Array  # i32[label_cap]
    vec_scales: jax.Array  # f32[cap] — int8-tier per-row scales (else ones)

    @property
    def capacity(self) -> int:
        return self.adjacency.shape[0]

    @property
    def max_degree(self) -> int:
        return self.adjacency.shape[1]


DEFAULT_LABEL_TABLE_CAPACITY = 1024


def empty_arrays(
    config: IndexConfig,
    capacity: int,
    label_table_capacity: int = DEFAULT_LABEL_TABLE_CAPACITY,
) -> GraphArrays:
    d = config.num_dimensions
    w = config.num_code_words if config.uses_sbq else 0
    r = config.max_neighbors_during_build
    lmax = config.max_labels_per_vector
    return GraphArrays(
        vectors=jnp.zeros((capacity, d), dtype=config.vector_jnp_dtype),
        codes=jnp.zeros((capacity, w), dtype=jnp.uint32),
        adjacency=jnp.full((capacity, r), INVALID_ID, dtype=jnp.int32),
        node_labels=jnp.full((capacity, lmax), LABEL_SENTINEL, dtype=jnp.int32),
        deleted=jnp.zeros((capacity,), dtype=jnp.bool_),
        count=jnp.zeros((), dtype=jnp.int32),
        default_start=jnp.asarray(INVALID_ID, dtype=jnp.int32),
        label_start_keys=jnp.full(
            (label_table_capacity,), LABEL_SENTINEL, dtype=jnp.int32
        ),
        label_start_ids=jnp.full(
            (label_table_capacity,), INVALID_ID, dtype=jnp.int32
        ),
        vec_scales=jnp.ones((capacity,), dtype=jnp.float32),
    )


def quantize_rows(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization for the storage tier.

    scale = maxabs/127 (1.0 for all-zero rows so dequantization is exact),
    value = round(x/scale) clipped to [-127, 127].  Worst-case per-component
    error is scale/2 = maxabs/254 — at 768d cosine (pre-normalized rows)
    that reorders only near-ties in the exact rescore, same failure mode as
    the bf16 tier but at a quarter of the HBM footprint."""
    rows = rows.astype(jnp.float32)
    maxabs = jnp.max(jnp.abs(rows), axis=-1)
    scale = jnp.where(maxabs > 0, maxabs / 127.0, jnp.float32(1.0))
    q = jnp.clip(jnp.round(rows / scale[..., None]), -127, 127).astype(
        jnp.int8
    )
    return q, scale.astype(jnp.float32)


def dequant_rows(vectors: jax.Array, scales: jax.Array, idx) -> jax.Array:
    """Row gather in compute form: the storage dtype for f32/bf16 (callers
    keep their own ``.astype``) and dequantized f32 for the int8 tier.

    ``idx`` is any leading-axis index (int array, tuple, slice) valid for
    both ``vectors[idx]`` and ``scales[idx]`` — the scale tensor mirrors
    the vectors' leading axes."""
    rows = vectors[idx]
    if vectors.dtype == jnp.int8:
        return rows.astype(jnp.float32) * scales[idx][..., None]
    return rows


def grow(arrays: GraphArrays, new_capacity: int) -> GraphArrays:
    """Host-side capacity doubling (analog of relation extension)."""
    cap = arrays.capacity
    if new_capacity <= cap:
        return arrays
    pad = new_capacity - cap

    def pad_rows(x, fill):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    return arrays._replace(
        vectors=pad_rows(arrays.vectors, 0),
        codes=pad_rows(arrays.codes, 0),
        adjacency=pad_rows(arrays.adjacency, INVALID_ID),
        node_labels=pad_rows(arrays.node_labels, int(LABEL_SENTINEL)),
        deleted=pad_rows(arrays.deleted, False),
        vec_scales=pad_rows(arrays.vec_scales, 1.0),
    )


def lookup_label_starts(
    arrays: GraphArrays, query_labels: jax.Array
) -> jax.Array:
    """Per-label start nodes for each query.

    query_labels: i32[Q, Lq] -> i32[Q, Lq] node ids (INVALID_ID where the
    label has no start node).  Analog of StartNodes::get_for_node
    (graph/start_nodes.rs:16-93).
    """
    eq = query_labels[:, :, None] == arrays.label_start_keys[None, None, :]
    # At most one key matches; max-reduce picks it out (INVALID_ID elsewhere).
    ids = jnp.where(eq, arrays.label_start_ids[None, None, :], INVALID_ID)
    return jnp.max(ids, axis=-1)


class HostArrays(NamedTuple):
    """Host (numpy) copy of GraphArrays, for checkpointing."""

    vectors: np.ndarray
    codes: np.ndarray
    adjacency: np.ndarray
    node_labels: np.ndarray
    deleted: np.ndarray
    count: np.ndarray
    default_start: np.ndarray
    label_start_keys: np.ndarray
    label_start_ids: np.ndarray
    vec_scales: np.ndarray


def to_host(arrays: GraphArrays) -> HostArrays:
    return HostArrays(*[np.asarray(x) for x in arrays])


def from_host(host: HostArrays) -> GraphArrays:
    return GraphArrays(*[jnp.asarray(x) for x in host])
