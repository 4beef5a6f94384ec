"""High-dimension coverage.

The reference exercises 4,000-16,000-dim SBQ indexes
(reference: pgvectorscale/src/access_method/build.rs:1854-1865
``test_index_creation_few_neighbors`` / high-dim scaffolds) and caps plain
storage at 2,000 dims (build.rs:192-196).  These tests build and query at
those extremes; small row counts keep CPU runtime sane while still covering
the wide-code paths (500-word codes, chunked pairwise-Hamming prune,
edge-code-cache traversal).
"""

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams
from pgvectorscale_tpu.config import StorageLayout
from pgvectorscale_tpu.distance import preprocess_cosine
from pgvectorscale_tpu.ops.bruteforce import brute_force_search

import jax.numpy as jnp


def _recall_at_k(index, vectors, queries, k, distance_type, params=None):
    dev_vectors = jnp.asarray(vectors)
    dev_queries = jnp.asarray(queries)
    if distance_type == DistanceType.COSINE:
        dev_vectors = preprocess_cosine(dev_vectors)
        dev_queries = preprocess_cosine(dev_queries)
    valid = jnp.ones((vectors.shape[0],), dtype=bool)
    gt_ids, _ = brute_force_search(
        dev_queries, dev_vectors, valid, k=k, distance_type=distance_type
    )
    gt_ids = np.asarray(gt_ids)
    ids, _ = index.search(queries, k=k, params=params)
    hits = 0
    for row in range(queries.shape[0]):
        hits += len(set(gt_ids[row]) & set(int(i) for i in ids[row] if i >= 0))
    return hits / (queries.shape[0] * k)


def _lowrank(rng, n, q, d, rank=32):
    basis = rng.standard_normal((rank, d)).astype(np.float32)
    return (
        rng.standard_normal((n, rank)).astype(np.float32) @ basis,
        rng.standard_normal((q, rank)).astype(np.float32) @ basis,
    )


def test_4000_dims_sbq(rng):
    """4,000-dim 1-bit SBQ (dims >= 900 -> 1-bit default): build + recall
    (build.rs:1854-1865 analog)."""
    n, d, q, k = 256, 4000, 5, 10
    vectors, queries = _lowrank(rng, n, q, d)
    config = IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    assert config.bits_per_dimension == 1
    index = DiskannIndex.build(vectors, config)
    recall = _recall_at_k(
        index, vectors, queries, k, DistanceType.L2,
        params=QueryParams(search_list_size=100, rescore=100),
    )
    assert recall >= 0.9, f"recall@10 = {recall}"


def test_16000_dims_sbq(rng):
    """Maximum dimension (MAX_DIMENSION = 16,000, build.rs:192-196):
    500-word codes go through the chunked pairwise-Hamming prune and the
    packed-XOR traversal."""
    n, d, q, k = 128, 16000, 3, 10
    vectors, queries = _lowrank(rng, n, q, d)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_neighbors=16,
        search_list_size=32,
    )
    assert config.num_code_words == 500
    index = DiskannIndex.build(vectors, config)
    recall = _recall_at_k(
        index, vectors, queries, k, DistanceType.COSINE,
        params=QueryParams(search_list_size=50, rescore=100),
    )
    assert recall >= 0.9, f"recall@10 = {recall}"


def test_16001_dims_rejected():
    with pytest.raises(ValueError, match="exceeds maximum"):
        IndexConfig(num_dimensions=16001)


def test_2000_dims_plain(rng):
    """Plain storage at its 2,000-dim cap (build.rs:192-196): exact
    distances end to end, no rescore needed."""
    n, d, q, k = 256, 2000, 5, 10
    vectors, queries = _lowrank(rng, n, q, d)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        storage_layout=StorageLayout.PLAIN,
    )
    index = DiskannIndex.build(vectors, config)
    recall = _recall_at_k(
        index, vectors, queries, k, DistanceType.L2,
        params=QueryParams(search_list_size=100, rescore=0),
    )
    assert recall >= 0.9, f"recall@10 = {recall}"


def test_2001_dims_plain_rejected():
    with pytest.raises(ValueError, match="plain storage"):
        IndexConfig(
            num_dimensions=2001, storage_layout=StorageLayout.PLAIN
        )


def test_4000_dims_truncated_sbq(rng):
    """Matryoshka at high dim: index 1,024 of 4,000 dims, rescore on the
    full vector (plain/storage.rs:179 semantics generalized to SBQ)."""
    n, d, q, k = 200, 4000, 5, 10
    vectors, queries = _lowrank(rng, n, q, d)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_dimensions_to_index=1024,
    )
    index = DiskannIndex.build(vectors, config)
    recall = _recall_at_k(
        index, vectors, queries, k, DistanceType.L2,
        params=QueryParams(search_list_size=100, rescore=150),
    )
    assert recall >= 0.9, f"recall@10 = {recall}"
