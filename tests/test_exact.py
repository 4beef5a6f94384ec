"""ExactIndex (seqscan analog) and 1-bit SBQ end-to-end tests."""

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams
from pgvectorscale_tpu.exact import ExactIndex


def _lowrank(rng, n, q, d, rank=24):
    basis = rng.standard_normal((rank, d)).astype(np.float32)
    return (
        rng.standard_normal((n, rank)).astype(np.float32) @ basis,
        rng.standard_normal((q, rank)).astype(np.float32) @ basis,
    )


def test_exact_index_is_exact(rng):
    n, d = 500, 32
    vectors, queries = _lowrank(rng, n, 10, d)
    index = ExactIndex.build(
        vectors, IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    )
    ids, dists = index.search(queries, k=5)
    for r in range(10):
        true = np.argsort(((vectors - queries[r]) ** 2).sum(axis=1))[:5]
        np.testing.assert_array_equal(ids[r], true)

    # delete removes from results; k > live count pads with -1.
    index.delete(ids[0][:2])
    ids2, d2 = index.search(queries[:1], k=n)
    returned = set(ids2[0][ids2[0] >= 0].tolist())
    assert not (returned & set(int(i) for i in ids[0][:2]))
    assert len(returned) == n - 2

    # add after delete; the duplicate is findable (ties with the original
    # row are both exact answers) and external id mapping holds.
    new = index.add(vectors[:1])
    ids3, d3 = index.search(vectors[:1], k=2)
    assert d3[0, 0] < 1e-6
    found_ext = set(index.to_external(ids3)[0].tolist())
    assert index.external_ids[new[0]] in found_ext or 0 in found_ext


def test_exact_empty(rng):
    index = ExactIndex(IndexConfig(num_dimensions=8))
    ids, dists = index.search(np.zeros((2, 8), np.float32), k=3)
    assert (ids == -1).all() and np.isinf(dists).all()


def test_one_bit_sbq_end_to_end(rng):
    """num_bits_per_dimension=1 (the >=900-dim default) through the whole
    stack, gated against the exact index."""
    n, d, q, k = 800, 128, 30, 10
    vectors, queries = _lowrank(rng, n, q, d, rank=24)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_bits_per_dimension=1,
    )
    assert config.bits_per_dimension == 1
    index = DiskannIndex.build(vectors, config)
    exact = ExactIndex.build(
        vectors,
        IndexConfig(num_dimensions=d, distance_type=DistanceType.COSINE),
    )
    gt, _ = exact.search(queries, k=k)
    ids, _ = index.search(
        queries, k=k, params=QueryParams(search_list_size=100, rescore=100)
    )
    hits = sum(
        len(set(gt[r].tolist()) & set(int(i) for i in ids[r] if i >= 0))
        for r in range(q)
    )
    assert hits / (q * k) >= 0.9


def test_high_dim_defaults_to_one_bit():
    config = IndexConfig(num_dimensions=960)
    assert config.bits_per_dimension == 1
    config = IndexConfig(num_dimensions=768)
    assert config.bits_per_dimension == 2
