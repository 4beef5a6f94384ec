"""int8 vector-tier tests.

The int8 tier quarters the stored-vector HBM footprint (per-row symmetric
maxabs/127 scale in ``GraphArrays.vec_scales``, dequantized to f32 at
gather).  TPU-only knob with no reference analog — the reference keeps
full vectors on the disk-resident heap (table_slot.rs:13-53); here they
are HBM-resident and the tier is the capacity lever for the 50M-scale
story.  Contract: build/search/DML/persistence behave like f32 with a
bounded rescore-precision loss.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams
from pgvectorscale_tpu.config import StorageLayout
from pgvectorscale_tpu.store import dequant_rows, quantize_rows

from test_index import _recall_at_k, _lowrank


def _config(dt="int8", **kw):
    return IndexConfig(
        num_dimensions=64,
        distance_type=kw.pop("distance_type", DistanceType.L2),
        num_neighbors=16,
        search_list_size=32,
        vector_dtype=dt,
        **kw,
    )


def test_int8_requires_sbq():
    with pytest.raises(ValueError, match="int8 vector tier requires SBQ"):
        IndexConfig(
            num_dimensions=64,
            storage_layout=StorageLayout.PLAIN,
            vector_dtype="int8",
        )


def test_quantize_roundtrip_error_bound(rng):
    rows = rng.standard_normal((128, 96)).astype(np.float32)
    rows[7] = 0.0  # all-zero row: identity scale, exact roundtrip
    q, s = quantize_rows(jnp.asarray(rows))
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    deq = np.asarray(
        dequant_rows(q, s, jnp.arange(rows.shape[0], dtype=jnp.int32))
    )
    # Worst-case per-component error is scale/2 = maxabs/254.
    maxabs = np.abs(rows).max(axis=-1, keepdims=True)
    bound = np.broadcast_to(maxabs / 254.0 + 1e-6, rows.shape)
    np.testing.assert_array_less(np.abs(deq - rows), bound)
    np.testing.assert_array_equal(deq[7], rows[7])


def test_int8_recall_close_to_f32(rng):
    vectors, queries = _lowrank(rng, 800, 32, 64)
    params = QueryParams(search_list_size=48, rescore=100)
    recalls = {}
    for dt in ("f32", "int8"):
        index = DiskannIndex.build(vectors, _config(dt))
        if dt == "int8":
            assert index.arrays.vectors.dtype == jnp.int8
        recalls[dt] = _recall_at_k(
            index, vectors, queries, 10, DistanceType.L2, params=params
        )
    assert recalls["int8"] >= 0.9, recalls
    assert recalls["int8"] >= recalls["f32"] - 0.05, recalls


def test_int8_cosine_self_query(rng):
    """Cosine pre-normalization composes with quantization: each stored
    row still resolves itself as its own nearest neighbor."""
    vectors, _ = _lowrank(rng, 512, 8, 64)
    index = DiskannIndex.build(
        vectors, _config(distance_type=DistanceType.COSINE)
    )
    ids, dists = index.search(
        vectors[:8], k=1, params=QueryParams(search_list_size=32, rescore=64)
    )
    assert [int(i) for i in ids[:, 0]] == list(range(8))
    assert np.all(np.asarray(dists[:, 0]) < 1e-3)


def test_int8_checkpoint_roundtrip(tmp_path, rng):
    vectors, queries = _lowrank(rng, 512, 8, 64)
    index = DiskannIndex.build(vectors, _config())
    params = QueryParams(search_list_size=48, rescore=100)
    ids0, d0 = index.search(queries, k=10, params=params)
    path = str(tmp_path / "int8.npz")
    index.save(path)
    loaded = DiskannIndex.load(path)
    assert loaded.arrays.vectors.dtype == jnp.int8
    # int8 rows and scales survive save/load bit-exactly -> identical
    # results, same contract as the bf16-tier roundtrip test.
    ids1, d1 = loaded.search(queries, k=10, params=params)
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=0, atol=0)


def test_int8_add_delete_reuse(rng):
    """DML on the int8 tier: added rows are quantized, deleted rows are
    recycled (quantized again), results keep satisfying the contract."""
    vectors, _ = _lowrank(rng, 512, 8, 64)
    extra, _ = _lowrank(rng, 16, 1, 64)
    index = DiskannIndex.build(vectors[:496], _config())
    index.add(vectors[496:])
    cap_before = index.arrays.capacity
    index.delete(np.arange(16, dtype=np.int32))
    index.add(extra)  # recycles the 16 tombstoned rows
    assert index.arrays.capacity == cap_before
    assert index.num_live == 512
    params = QueryParams(search_list_size=48, rescore=100)
    ids, _ = index.search(extra, k=1, params=params)
    ext = index.to_external(np.asarray(ids[:, 0]))
    # Every re-added vector finds itself (external ids 512..527).
    assert sorted(int(e) for e in ext) == list(range(512, 528))


def test_int8_compact_preserves_results(rng):
    vectors, queries = _lowrank(rng, 512, 8, 64)
    index = DiskannIndex.build(vectors, _config())
    index.delete(np.arange(32, dtype=np.int32))
    params = QueryParams(search_list_size=48, rescore=100)
    ids0, _ = index.search(queries, k=5, params=params)
    ext0 = index.to_external(np.asarray(ids0))
    compacted = index.compact()
    assert compacted.num_live == 480
    ids1, _ = compacted.search(queries, k=5, params=params)
    ext1 = compacted.to_external(np.asarray(ids1))
    # Compact dequantizes + re-quantizes (one extra rounding): top-5 sets
    # must stay nearly identical on well-separated data.
    overlap = np.mean(
        [
            len(set(ext0[i].tolist()) & set(ext1[i].tolist())) / 5
            for i in range(len(queries))
        ]
    )
    assert overlap >= 0.9, overlap


def test_int8_sharded_smoke(tmp_path, rng):
    from pgvectorscale_tpu.parallel.mesh import make_mesh
    from pgvectorscale_tpu.parallel.sharded import ShardedDiskannIndex

    mesh = make_mesh(4, axis_name="n")
    vectors, queries = _lowrank(rng, 768, 16, 64)
    index = ShardedDiskannIndex.build(vectors, _config(), mesh)
    assert index.stacked.vectors.dtype == jnp.int8
    params = QueryParams(search_list_size=48, rescore=100)
    ids, dists = index.search(queries, k=10, params=params)
    # Sharded ids are global slots; recall is computed on external ids.
    from pgvectorscale_tpu.ops.bruteforce import brute_force_search

    gt, _ = brute_force_search(
        jnp.asarray(queries),
        jnp.asarray(vectors),
        jnp.ones(len(vectors), bool),
        k=10,
        distance_type=DistanceType.L2,
    )
    gt = np.asarray(gt)
    ext = index.to_external(ids)
    rec = np.mean(
        [
            len(set(gt[r]) & set(int(i) for i in ext[r] if i >= 0)) / 10
            for r in range(len(queries))
        ]
    )
    assert rec >= 0.9, rec
    # Sharded persistence roundtrip (vec_scales is a stacked leaf).
    path = str(tmp_path / "int8_sharded.npz")
    index.save(path)
    loaded = ShardedDiskannIndex.load(path, mesh)
    ids1, _ = loaded.search(queries, k=10, params=params)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids1))
