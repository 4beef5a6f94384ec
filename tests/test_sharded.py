"""Sharded (multi-chip) index tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgvectorscale_tpu import DistanceType, IndexConfig, QueryParams
from pgvectorscale_tpu.distance import preprocess_cosine
from pgvectorscale_tpu.ops.bruteforce import brute_force_search
from pgvectorscale_tpu.parallel.mesh import make_mesh
from pgvectorscale_tpu.parallel.sharded import ShardedDiskannIndex


def _mesh():
    return make_mesh(8, axis_name="n")


def _lowrank(rng, n, q, d, rank=32):
    basis = rng.standard_normal((rank, d)).astype(np.float32)
    return (
        rng.standard_normal((n, rank)).astype(np.float32) @ basis,
        rng.standard_normal((q, rank)).astype(np.float32) @ basis,
    )


def test_sharded_recall_matches_single_index(rng):
    """Sharding must not lose recall versus a single-device index at the
    same parameters (in practice it gains: P shards × beam L is a wider
    total frontier)."""
    from pgvectorscale_tpu import DiskannIndex

    n, d, q, k = 1500, 64, 30, 10
    vectors, queries = _lowrank(rng, n, q, d)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_neighbors=20,
        search_list_size=50,
    )
    params = QueryParams(search_list_size=50, rescore=50)

    dv = preprocess_cosine(jnp.asarray(vectors))
    dq = preprocess_cosine(jnp.asarray(queries))
    gt, _ = brute_force_search(
        dq, dv, jnp.ones(n, bool), k=k, distance_type=DistanceType.COSINE
    )
    gt = np.asarray(gt)

    def recall_of(rows):
        return sum(
            len(set(gt[r]) & set(int(i) for i in rows[r] if i >= 0))
            for r in range(q)
        ) / (q * k)

    single = DiskannIndex.build(vectors, config)
    ids_s, _ = single.search(queries, k=k, params=params)
    recall_single = recall_of(ids_s)

    index = ShardedDiskannIndex.build(vectors, config, _mesh())
    assert index.count == n
    ids, dists = index.search(queries, k=k, params=params)
    recall_sharded = recall_of(index.to_external(ids))

    assert recall_sharded >= recall_single - 0.05, (
        f"sharded recall {recall_sharded} < single-index {recall_single}"
    )
    # Distances sorted ascending.
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_sharded_save_load_roundtrip(tmp_path, rng):
    n, d = 640, 32
    vectors, queries = _lowrank(rng, n, 8, d)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=12,
        search_list_size=24,
    )
    mesh = _mesh()
    index = ShardedDiskannIndex.build(vectors, config, mesh)
    path = str(tmp_path / "sharded.npz")
    index.save(path)
    loaded = ShardedDiskannIndex.load(path, mesh)
    assert loaded.count == n
    ids_a, d_a = index.search(queries, k=5)
    ids_b, d_b = loaded.search(queries, k=5)
    np.testing.assert_array_equal(
        index.to_external(ids_a), loaded.to_external(ids_b)
    )
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)

    # A sharded checkpoint refuses the single-device loader and vice versa.
    from pgvectorscale_tpu import DiskannIndex

    with pytest.raises(ValueError):
        DiskannIndex.load(path)


def test_sharded_labeled_filtered_search(rng):
    """Label-filtered search over the sharded store: results satisfy the
    filter, filtered recall matches filtered brute force, and per-shard
    label start nodes cover every class (round-robin keeps classes in all
    shards)."""
    n, d, k = 960, 64, 10
    vectors, queries = _lowrank(rng, n, 15, d)
    labels = [[int(i % 4)] for i in range(n)]
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_neighbors=16,
        search_list_size=40,
        max_labels_per_vector=2,
    )
    index = ShardedDiskannIndex.build(vectors, config, _mesh(), labels=labels)
    target = 2
    ids, _ = index.search(
        queries, k=k, query_labels=[[target]] * len(queries)
    )
    ext = index.to_external(ids)
    for row in ext:
        for g in row:
            if g >= 0:
                assert g % 4 == target

    dv = preprocess_cosine(jnp.asarray(vectors))
    dq = preprocess_cosine(jnp.asarray(queries))
    valid = jnp.asarray(np.arange(n) % 4 == target)
    gt, _ = brute_force_search(
        dq, dv, valid, k=k, distance_type=DistanceType.COSINE
    )
    gt = np.asarray(gt)
    hits = sum(
        len(set(gt[r]) & set(int(g) for g in ext[r] if g >= 0))
        for r in range(len(queries))
    )
    assert hits / (len(queries) * k) >= 0.9

    # Unfiltered search on the labeled sharded index still works.
    ids2, _ = index.search(queries, k=k)
    assert (index.to_external(ids2)[:, 0] >= 0).all()


def test_sharded_add_and_delete(rng):
    n, d = 800, 32
    vectors, queries = _lowrank(rng, n + 100, 0, d)
    vectors, extra = vectors[:n], vectors[n:]
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
    )
    index = ShardedDiskannIndex.build(vectors, config, _mesh())
    index.add(extra)
    assert index.count == n + 100

    # Inserted rows are findable.
    ids, _ = index.search(extra[:5], k=1)
    ext = index.to_external(ids)
    assert (ext[:, 0] >= n).all()

    # Delete them again; they vanish from results.
    index.delete_external(np.arange(n, n + 100, dtype=np.int64))
    ids, _ = index.search(extra[:5], k=3)
    ext = index.to_external(ids)
    assert (ext < n).all()
