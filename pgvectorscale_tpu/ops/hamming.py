"""Hamming distance on packed SBQ codes.

TPU-native equivalent of the reference's XOR+popcount kernel
(reference: pgvectorscale/src/access_method/distance/mod.rs:266-323,
``distance_xor_optimized`` — monomorphized u64 loops).  On TPU this is
``lax.population_count`` on uint32 lanes, a pure VPU op that XLA fuses with
the surrounding gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def hamming_distance_matrix(query_codes: jax.Array, codes: jax.Array) -> jax.Array:
    """[Q, W] x [C, W] -> [Q, C] int32 Hamming distances."""
    x = jnp.bitwise_xor(query_codes[:, None, :], codes[None, :, :])
    return jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)


def hamming_gather(
    query_codes: jax.Array,
    codes: jax.Array,
    ids: jax.Array,
) -> jax.Array:
    """Distances from each query to its own candidate list.

    query_codes: uint32[Q, W]; codes: uint32[N, W]; ids: int32[Q, R]
    -> int32[Q, R].  Invalid ids (< 0) are clamped for the gather; callers
    mask the result.

    This is the hot op of SBQ beam search (analog of
    SbqSearchDistanceMeasure::calculate_bq_distance, sbq/mod.rs:139-159,
    invoked per visited node in visit_lsn_internal, sbq/storage.rs:125-230).
    """
    safe_ids = jnp.maximum(ids, 0)
    gathered = codes[safe_ids]  # [Q, R, W]
    x = jnp.bitwise_xor(gathered, query_codes[:, None, :])
    return jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)


def hamming_pairwise(a: jax.Array, b: jax.Array) -> jax.Array:
    """Row-paired Hamming: uint32[N, W], uint32[N, W] -> int32[N]."""
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)
