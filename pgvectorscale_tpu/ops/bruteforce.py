"""Exact (brute-force) nearest-neighbor search.

The TPU analog of the reference's seqscan ground truth used by its accuracy
scaffolds (reference: pgvectorscale/src/access_method/build.rs:1717-1753,
``verify_index_accuracy`` compares index-scan ctids against a seqscan).
One MXU distance matmul + top-k replaces the scan.  Also serves as the
rescoring primitive for very small indexes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..config import DistanceType
from ..distance import distance_matrix


@functools.partial(jax.jit, static_argnames=("k", "distance_type"))
def brute_force_search(
    queries: jax.Array,  # f32[Q, D]
    points: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N] — live (non-deleted) rows
    *,
    k: int,
    distance_type: DistanceType,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k: returns (ids i32[Q, k], dists f32[Q, k])."""
    d = distance_matrix(queries, points, distance_type)
    d = jnp.where(valid[None, :], d, jnp.inf)
    neg_top, ids = lax.top_k(-d, k)
    return ids.astype(jnp.int32), -neg_top
