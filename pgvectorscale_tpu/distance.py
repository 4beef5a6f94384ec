"""Full-precision distance kernels.

TPU-native equivalents of the reference's SIMD distance kernels
(reference: pgvectorscale/src/access_method/distance/mod.rs).  On TPU the
batched formulation ``[Q, D] x [C, D] -> [Q, C]`` is a matmul and rides the
MXU; the reference's per-pair SIMD loops become a single ``jnp.dot``.

Semantics preserved exactly:

- L2 skips the sqrt — distances are only used for ordering
  (distance/mod.rs:107-117).
- Inner product is negated so that "smaller is closer"
  (distance/mod.rs:173-190).
- Cosine assumes pre-normalized vectors and returns ``max(0, 1 - dot)``
  (distance/mod.rs:217-223).
- ``preprocess_cosine`` normalizes unless the vector is ~zero or its norm is
  already within a length-scaled epsilon of 1 (distance/mod.rs:225-253).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import DistanceType

_F32_EPS = float(np.finfo(np.float32).eps)


def preprocess_cosine(vectors: jax.Array) -> jax.Array:
    """Normalize rows for cosine distance, matching the reference's
    ``preprocess_cosine`` (distance/mod.rs:225-253).

    Rows whose squared norm is below f32 epsilon (zero vectors) or within
    ``eps * dims`` of 1.0 are left untouched.
    """
    vectors = jnp.asarray(vectors, dtype=jnp.float32)
    dims = vectors.shape[-1]
    sq_norm = jnp.sum(vectors * vectors, axis=-1, keepdims=True)
    adj_eps = _F32_EPS * dims
    is_zero = sq_norm < _F32_EPS
    is_unit = (sq_norm >= 1.0 - adj_eps) & (sq_norm <= 1.0 + adj_eps)
    skip = is_zero | is_unit
    # Avoid div-by-zero on skipped rows.
    denom = jnp.where(skip, 1.0, jnp.sqrt(sq_norm))
    return jnp.where(skip, vectors, vectors / denom)


def distance_matrix(
    queries: jax.Array,
    points: jax.Array,
    distance_type: DistanceType,
) -> jax.Array:
    """Batched distance matrix ``[Q, D] x [C, D] -> [Q, C]`` (MXU path).

    Equivalent of the reference's per-pair kernels ``distance_l2`` /
    ``distance_inner_product`` / ``distance_cosine`` (distance/mod.rs), but
    batched so XLA tiles it onto the systolic array.
    """
    queries = jnp.asarray(queries, dtype=jnp.float32)
    points = jnp.asarray(points, dtype=jnp.float32)
    dots = jnp.dot(
        queries,
        points.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if distance_type == DistanceType.INNER_PRODUCT:
        return -dots
    if distance_type == DistanceType.COSINE:
        return jnp.maximum(1.0 - dots, 0.0)
    # L2 without sqrt: ||q||^2 - 2 q.c + ||c||^2, clamped >= 0 against fp
    # cancellation (reference asserts norm >= 0, distance/mod.rs:113).
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    c_sq = jnp.sum(points * points, axis=-1)[None, :]
    return jnp.maximum(q_sq - 2.0 * dots + c_sq, 0.0)


def pairwise_distance(
    a: jax.Array,
    b: jax.Array,
    distance_type: DistanceType,
) -> jax.Array:
    """Elementwise row-paired distance ``[N, D], [N, D] -> [N]`` (VPU path)."""
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    if distance_type == DistanceType.L2:
        diff = a - b
        return jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
    dots = jnp.sum(a * b, axis=-1)
    if distance_type == DistanceType.INNER_PRODUCT:
        return -dots
    return jnp.maximum(1.0 - dots, 0.0)


def preprocess_query(query: jax.Array, distance_type: DistanceType) -> jax.Array:
    """Query-side preprocessing: cosine queries are normalized the same way
    ingested vectors are (reference normalizes at ingest and at query,
    pg_vector.rs:125-199)."""
    query = jnp.asarray(query, dtype=jnp.float32)
    if distance_type == DistanceType.COSINE:
        return preprocess_cosine(query)
    return query
