"""End-to-end index tests.

TPU equivalents of the reference's accuracy scaffolds
(reference: pgvectorscale/src/access_method/build.rs:1179-1417
``test_index_creation_and_accuracy_scaffold``; labels/filtering_tests.rs
recall gate): build over seeded random vectors, compare against brute-force
ground truth, require recall@10 >= 0.9, and verify full-table reachability
through the streaming iterator with a tiny search list.
"""

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams
from pgvectorscale_tpu.config import StorageLayout
from pgvectorscale_tpu.distance import preprocess_cosine
from pgvectorscale_tpu.ops.bruteforce import brute_force_search

import jax.numpy as jnp


def _recall_at_k(index, vectors, queries, k, distance_type, params=None,
                 **search_kw):
    import jax.numpy as jnp

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
    ids, _ = index.search(queries, k=k, params=params, **search_kw)
    hits = 0
    for row in range(queries.shape[0]):
        hits += len(set(gt_ids[row]) & set(int(i) for i in ids[row] if i >= 0))
    return hits / (queries.shape[0] * k)


def _lowrank(rng, n, q, d, rank=32):
    """Effective-rank-limited gaussian data — representative of real
    embedding distributions (iid gaussian is the SBQ worst case; the
    reference's own recall gate relies on uniform data + a single query).
    Vectors and queries share the same subspace."""
    basis = rng.standard_normal((rank, d)).astype(np.float32)
    return (
        rng.standard_normal((n, rank)).astype(np.float32) @ basis,
        rng.standard_normal((q, rank)).astype(np.float32) @ basis,
    )


@pytest.mark.parametrize(
    "distance_type", [DistanceType.COSINE, DistanceType.L2]
)
def test_recall_gate_sbq(rng, distance_type):
    """recall@10 >= 0.9 at reference defaults (L=100, rescore=50) on
    1K x 128 — the reference's own gate (filtering_tests.rs:1005-1019)."""
    n, d, q, k = 1000, 128, 50, 10
    vectors, queries = _lowrank(rng, n, q, d)
    config = IndexConfig(num_dimensions=d, distance_type=distance_type)
    index = DiskannIndex.build(vectors, config)
    recall = _recall_at_k(index, vectors, queries, k, distance_type)
    assert recall >= 0.9, f"recall@10 = {recall}"


def _hamming_ceiling(vectors, queries, k, resc, bits, distance_type):
    """Quantizer ceiling: brute-force Hamming candidates + exact rescore —
    the best any SBQ search (ours or the reference's) can do at this
    operating point."""
    import jax.numpy as jnp
    from pgvectorscale_tpu.ops import sbq as sbq_ops
    from pgvectorscale_tpu.ops.hamming import hamming_distance_matrix
    from pgvectorscale_tpu.distance import distance_matrix

    Vd, Qd = jnp.asarray(vectors), jnp.asarray(queries)
    gt = np.asarray(
        jnp.argsort(distance_matrix(Qd, Vd, distance_type), axis=1)[:, :k]
    )
    stats = sbq_ops.train(Vd)
    hd = np.asarray(
        hamming_distance_matrix(
            sbq_ops.encode(Qd, stats, bits), sbq_ops.encode(Vd, stats, bits)
        )
    )
    q = len(queries)
    hits = 0
    dm = np.asarray(distance_matrix(Qd, Vd, distance_type))
    for r in range(q):
        cand = np.argsort(hd[r])[:resc]
        sel = cand[np.argsort(dm[r][cand])][:k]
        hits += len(set(sel) & set(gt[r]))
    return hits / (q * k)


def test_recall_gate_sbq_inner_product(rng):
    """Inner product: SBQ codes are direction-only (Hamming carries no
    magnitude), so varied norms cap recall — for the reference identically
    (quantize.rs has no norm term; plain+IP is outright rejected,
    build.rs:264-266).  Gate: graph must track the quantizer ceiling."""
    n, d, q, k = 1000, 128, 50, 10
    vectors, queries = _lowrank(rng, n, q, d)

    def _scale(x):
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        jitter = 1.0 + 0.15 * rng.standard_normal((x.shape[0], 1))
        return (x / norms * jitter).astype(np.float32)

    vectors, queries = _scale(vectors), _scale(queries)
    config = IndexConfig(
        num_dimensions=d, distance_type=DistanceType.INNER_PRODUCT
    )
    index = DiskannIndex.build(vectors, config)
    ceiling = _hamming_ceiling(
        vectors, queries, k, 60, config.bits_per_dimension,
        DistanceType.INNER_PRODUCT,
    )
    recall = _recall_at_k(
        index, vectors, queries, k, DistanceType.INNER_PRODUCT
    )
    assert recall >= ceiling - 0.03, (
        f"graph recall {recall} lags quantizer ceiling {ceiling}"
    )


def test_recall_gate_sbq_iid_gaussian(rng):
    """iid gaussian is the SBQ worst case: at defaults the *quantizer
    ceiling* (brute-force Hamming + rescore) is ~0.65.  Two gates:
    the graph must track the ceiling (traversal parity with brute-force
    Hamming), and a larger rescore must recover >= 0.9 absolute."""
    import jax.numpy as jnp
    from pgvectorscale_tpu.ops import sbq as sbq_ops
    from pgvectorscale_tpu.ops.hamming import hamming_distance_matrix
    from pgvectorscale_tpu.distance import distance_matrix

    n, d, q, k = 1000, 128, 50, 10
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    config = IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    index = DiskannIndex.build(vectors, config)

    # Quantizer ceiling at the same operating point (rescore+k candidates).
    Vd, Qd = jnp.asarray(vectors), jnp.asarray(queries)
    gt = np.asarray(
        jnp.argsort(distance_matrix(Qd, Vd, DistanceType.L2), axis=1)[:, :k]
    )
    stats = sbq_ops.train(Vd)
    hd = np.asarray(
        hamming_distance_matrix(
            sbq_ops.encode(Qd, stats, config.bits_per_dimension),
            sbq_ops.encode(Vd, stats, config.bits_per_dimension),
        )
    )
    resc = 50 + k
    hits = 0
    for r in range(q):
        cand = np.argsort(hd[r])[:resc]
        ex = ((vectors[cand] - queries[r]) ** 2).sum(axis=1)
        hits += len(set(cand[np.argsort(ex)][:k]) & set(gt[r]))
    ceiling = hits / (q * k)

    recall = _recall_at_k(index, vectors, queries, k, DistanceType.L2)
    assert recall >= ceiling - 0.03, (
        f"graph recall {recall} lags quantizer ceiling {ceiling}"
    )

    # Larger rescore recovers high recall even on worst-case data.
    recall_big = _recall_at_k(
        index, vectors, queries, k, DistanceType.L2,
        params=QueryParams(search_list_size=256, rescore=200),
    )
    assert recall_big >= 0.9, f"recall@10 (rescore=200) = {recall_big}"


def test_recall_gate_plain(rng):
    n, d, q, k = 1000, 64, 50, 10
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        storage_layout=StorageLayout.PLAIN,
    )
    index = DiskannIndex.build(vectors, config)
    recall = _recall_at_k(index, vectors, queries, k, DistanceType.L2)
    assert recall >= 0.9, f"recall@10 = {recall}"


def test_full_reachability_via_iterator(rng):
    """Every row must be reachable through the index even with a tiny search
    list (the reference scans all rows with query_search_list_size=2,
    build.rs:1254-1269)."""
    n, d = 120, 16
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    index = DiskannIndex.build(
        vectors, IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    )
    it = index.search_iter(
        vectors[0], QueryParams(search_list_size=2, rescore=2)
    )
    seen = set()
    for nid, _ in it:
        seen.add(nid)
    assert seen == set(range(n))
    # Resumability receipt (greedy_search_iterate analog): the full-table
    # scan expands each node at most once ACROSS refills — O(N) total
    # visits, not O(N) per refill-doubling.
    assert 0 <= it.total_visits <= n, it.total_visits


def test_streaming_order_is_relaxed_but_rescored(rng):
    n, d = 500, 32
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    index = DiskannIndex.build(
        vectors, IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    )
    q = vectors[7] + 0.01 * rng.standard_normal(d).astype(np.float32)
    it = index.search_iter(q, QueryParams(search_list_size=50, rescore=50))
    ids, dists = it.next_batch(10)
    assert ids[0] == 7
    # Exact distances must be non-decreasing within the rescore window.
    assert all(dists[i] <= dists[i + 1] + 1e-5 for i in range(len(dists) - 1))


def test_insert_after_build(rng):
    """Empty-table-then-insert semantics (build.rs:1559-1611): index built
    over nothing accepts inserts and stays searchable."""
    d = 64
    config = IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    index = DiskannIndex.build(np.zeros((0, d), np.float32), config)
    assert index.count == 0
    ids, _ = index.search(np.zeros((1, d), np.float32), k=5)
    assert (ids == -1).all()

    vectors, queries = _lowrank(rng, 200, 20, d)
    index.add(vectors[:100])
    index.add(vectors[100:])
    assert index.count == 200

    recall = _recall_at_k(index, vectors, queries, 10, DistanceType.L2)
    assert recall >= 0.9, f"recall@10 after inserts = {recall}"


def test_delete_and_compact(rng):
    n, d = 400, 32
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    index = DiskannIndex.build(
        vectors, IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    )
    dead = np.arange(0, n, 2, dtype=np.int32)
    index.delete(dead)
    assert index.num_deleted == len(dead)

    # Tombstoned nodes are never returned (scan.rs:231).
    ids, _ = index.search(vectors[2], k=20)
    assert not (set(ids[0].tolist()) & set(dead.tolist()))
    # Nearest live node to a deleted node's vector is still found.
    live = np.setdiff1d(np.arange(n), dead)
    assert set(ids[0][ids[0] >= 0].tolist()) <= set(live.tolist())

    # Compaction preserves external ids.
    compacted = index.compact()
    assert compacted.count == n - len(dead)
    ids2, _ = compacted.search(vectors[3], k=1)
    assert compacted.to_external(ids2)[0, 0] == 3


def test_save_load_roundtrip(tmp_path, rng):
    n, d = 300, 48
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(num_dimensions=d, distance_type=DistanceType.COSINE)
    index = DiskannIndex.build(vectors, config)
    index.delete(np.asarray([5, 6], dtype=np.int32))
    path = str(tmp_path / "idx.npz")
    index.save(path)
    loaded = DiskannIndex.load(path)
    assert loaded.config == index.config
    assert loaded.count == index.count
    assert loaded.num_deleted == 2

    queries = rng.standard_normal((10, d)).astype(np.float32)
    ids_a, d_a = index.search(queries, k=10)
    ids_b, d_b = loaded.search(queries, k=10)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)


def test_labeled_filtered_search(rng):
    """Filtered search: results must satisfy the label predicate and recall
    vs the filtered brute-force ground truth must hold (the reference's
    13-scenario filtering suite, labels/filtering_tests.rs)."""
    n, d, k = 800, 64, 10
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    labels = [[int(i % 5)] for i in range(n)]  # 5 label classes
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        max_labels_per_vector=2,
    )
    index = DiskannIndex.build(vectors, config, labels=labels)

    queries = rng.standard_normal((20, d)).astype(np.float32)
    target = 3
    ids, _ = index.search(
        queries, k=k, query_labels=[[target]] * len(queries)
    )
    for row in ids:
        for i in row:
            if i >= 0:
                assert i % 5 == target

    # Filtered recall vs filtered ground truth.
    dev_vectors = preprocess_cosine(jnp.asarray(vectors))
    dev_queries = preprocess_cosine(jnp.asarray(queries))
    valid = jnp.asarray(np.arange(n) % 5 == target)
    gt_ids, _ = brute_force_search(
        dev_queries, dev_vectors, valid, k=k,
        distance_type=DistanceType.COSINE,
    )
    gt_ids = np.asarray(gt_ids)
    hits = sum(
        len(set(gt_ids[r]) & set(int(i) for i in ids[r] if i >= 0))
        for r in range(len(queries))
    )
    recall = hits / (len(queries) * k)
    assert recall >= 0.9, f"filtered recall@10 = {recall}"


def test_unlabeled_query_on_labeled_index(rng):
    n, d = 300, 64
    vectors, queries = _lowrank(rng, n, 10, d)
    labels = [[i % 3] for i in range(n)]
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        max_labels_per_vector=2,
    )
    index = DiskannIndex.build(vectors, config, labels=labels)
    recall = _recall_at_k(index, vectors, queries, 10, DistanceType.L2)
    assert recall >= 0.9


def test_matryoshka_truncated_dims(rng):
    """num_dimensions_to_index truncation (options.rs `num_dimensions`):
    search uses the prefix, rescoring uses the full vector."""
    n, d = 500, 64
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_dimensions_to_index=32,
    )
    index = DiskannIndex.build(vectors, config)
    queries = rng.standard_normal((10, d)).astype(np.float32)
    ids, dists = index.search(queries, k=10)
    # Rescored distances must be exact full-dim distances.
    row, col = 0, 0
    nid = int(ids[row, col])
    expected = float(((vectors[nid] - queries[row]) ** 2).sum())
    np.testing.assert_allclose(dists[row, col], expected, rtol=1e-4)


def test_matryoshka_truncated_dims_plain(rng):
    """PLAIN storage with num_dimensions_to_index < num_dimensions
    (plain/storage.rs:179 — resort iff truncated): traversal uses the
    indexed prefix (the reference's plain node stores the index slice,
    build.rs:548), rescore the full vector.  Round-1 crash repro."""
    n, d, dt = 600, 64, 32
    # Put the signal in the prefix so truncated search is meaningful.
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    vectors[:, dt:] *= 0.05
    queries = rng.standard_normal((20, d)).astype(np.float32)
    queries[:, dt:] *= 0.05
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        storage_layout=StorageLayout.PLAIN,
        num_dimensions_to_index=dt,
    )
    index = DiskannIndex.build(vectors, config)
    recall = _recall_at_k(index, vectors, queries, 10, DistanceType.L2)
    assert recall >= 0.9
    # Rescored distances must be exact full-dim distances.
    ids, dists = index.search(queries, k=10)
    nid = int(ids[0, 0])
    expected = float(((vectors[nid] - queries[0]) ** 2).sum())
    np.testing.assert_allclose(dists[0, 0], expected, rtol=1e-4)
    # Without rescore, distances are truncated-prefix distances
    # (plain/storage.rs:240: traversal uses to_index_slice).
    ids0, dists0 = index.search(queries, k=5, params=QueryParams(rescore=0))
    nid0 = int(ids0[0, 0])
    expected0 = float(((vectors[nid0, :dt] - queries[0, :dt]) ** 2).sum())
    np.testing.assert_allclose(dists0[0, 0], expected0, rtol=1e-4)


def test_bf16_vector_tier(rng, tmp_path):
    """vector_dtype="bf16" halves the full-precision HBM tier (the TPU
    analog of the reference keeping full vectors off-engine on the heap,
    table_slot.rs:13-53).  Rescore casts to f32; recall is unaffected at
    gate level; checkpoints round-trip the raw bf16 bits."""
    import ml_dtypes

    n, d = 1000, 64
    vectors, queries = _lowrank(rng, n, 50, d)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        vector_dtype="bf16",
    )
    index = DiskannIndex.build(vectors, config)
    assert index.arrays.vectors.dtype == jnp.bfloat16
    recall = _recall_at_k(index, vectors, queries, 10, DistanceType.L2)
    # bf16 rescore reorders near-ties vs the f32 ground truth; the
    # exact-match gate is slightly relaxed (graph quality is unchanged).
    assert recall >= 0.85

    path = str(tmp_path / "bf16.npz")
    index.save(path)
    loaded = DiskannIndex.load(path)
    assert loaded.arrays.vectors.dtype == jnp.bfloat16
    a = np.asarray(index.arrays.vectors[:n]).view(np.uint16)
    b = np.asarray(loaded.arrays.vectors[:n]).view(np.uint16)
    np.testing.assert_array_equal(a, b)
    ids0, d0 = index.search(queries, k=10)
    ids1, d1 = loaded.search(queries, k=10)
    np.testing.assert_array_equal(ids0, ids1)


def test_no_rescore(rng):
    """rescore=0 disables exact reordering (test_no_rescore analog,
    build.rs:1419): SBQ distances come back as raw Hamming values."""
    n, d = 300, 64
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    index = DiskannIndex.build(
        vectors, IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    )
    ids, dists = index.search(
        vectors[0], k=5, params=QueryParams(rescore=0)
    )
    assert ids[0, 0] == 0
    # Hamming distances are integers.
    assert np.allclose(dists[ids >= 0], np.round(dists[ids >= 0]))


def test_duplicate_vectors_stay_connected(rng):
    """Duplicate-heavy data must not produce orphans — the tiebreak
    semantics test (neighbor_with_distance.rs:45-95)."""
    d = 16
    base = rng.standard_normal((10, d)).astype(np.float32)
    vectors = np.repeat(base, 12, axis=0)  # 120 rows, heavy duplicates
    index = DiskannIndex.build(
        vectors, IndexConfig(num_dimensions=d, distance_type=DistanceType.L2)
    )
    it = index.search_iter(vectors[0], QueryParams(search_list_size=10))
    seen = {nid for nid, _ in it}
    assert seen == set(range(120))


def test_capacity_growth_on_add(rng):
    """Adding past the allocated capacity grows the store (the relation
    extension analog, page.rs:108-245) without losing the graph."""
    d = 16
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=10,
        search_list_size=16,
    )
    vectors, queries = _lowrank(rng, 1100, 10, d, rank=8)
    index = DiskannIndex.build(vectors[:900], config)
    cap0 = index.arrays.capacity
    assert cap0 == 1024
    index.add(vectors[900:])  # crosses the 1024 boundary
    assert index.arrays.capacity > cap0
    assert index.count == 1100
    ids, dists = index.search(vectors[1050], k=1)
    assert ids[0, 0] == 1050 and dists[0, 0] < 1e-5
    recall = _recall_at_k(
        index, vectors, queries, 10, DistanceType.L2,
        params=QueryParams(search_list_size=32, rescore=100),
    )
    assert recall >= 0.9


def test_refine_pass_preserves_quality(rng):
    """refine_passes re-inserts every node against the finished graph
    (classic second Vamana pass); must preserve reachability and not
    degrade recall."""
    n, d = 800, 64
    vectors, queries = _lowrank(rng, n, 20, d)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_neighbors=20,
        search_list_size=50,
    )
    base = DiskannIndex.build(vectors, config)
    refined = DiskannIndex.build(vectors, config, refine_passes=1)

    from pgvectorscale_tpu.debug import count_reachable_nodes

    assert count_reachable_nodes(refined) == n
    r0 = _recall_at_k(base, vectors, queries, 10, DistanceType.COSINE)
    r1 = _recall_at_k(refined, vectors, queries, 10, DistanceType.COSINE)
    # At CPU-testable scale recall is near-saturated, so the gate here is
    # strict non-regression; the feature's IMPROVEMENT claim is measured at
    # 100k on TPU and committed as an artifact (results/, e.g. +0.015
    # recall at L=150/rescore=300 for refine_passes=1).
    assert r1 >= r0 - 0.005, f"refine degraded recall {r0} -> {r1}"


def test_external_ids(rng):
    n, d = 100, 16
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    ext = np.arange(1000, 1000 + n, dtype=np.int64)
    index = DiskannIndex.build(
        vectors,
        IndexConfig(num_dimensions=d, distance_type=DistanceType.L2),
        external_ids=ext,
    )
    ids, _ = index.search(vectors[7], k=1)
    assert index.to_external(ids)[0, 0] == 1007


def test_scan_chunked_build_cache_identical(rng):
    """Large-capacity builds construct the wave neighbor-code cache with a
    lax.scan over row chunks (the one-shot gather's [cap, R, W]
    intermediate lane-pads W->128 and OOMed 1M builds on a 16 GB chip).
    The chunked path must produce a bit-identical graph."""
    import jax

    import pgvectorscale_tpu.graph.build as gb

    n, d = 6000, 32  # > BRUTE_CANDIDATE_THRESHOLD so beam waves engage
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
    )
    adj0 = np.asarray(DiskannIndex.build(vectors, config).arrays.adjacency)
    # Force the scan path.  The jit caches by shape, so retrace.
    jax.clear_caches()
    old = gb.BUILD_CACHE_ONEPASS_MAX_BYTES
    gb.BUILD_CACHE_ONEPASS_MAX_BYTES = 0
    try:
        adj1 = np.asarray(
            DiskannIndex.build(vectors, config).arrays.adjacency
        )
    finally:
        gb.BUILD_CACHE_ONEPASS_MAX_BYTES = old
        jax.clear_caches()
    np.testing.assert_array_equal(adj0, adj1)


def test_compact_stays_on_device(rng):
    """compact() must not pull the vector matrix to the host (the tunneled
    device->host link is ~0.75 MB/s): live rows are gathered on device and
    feed the rebuild's ingest directly."""
    n, d = 600, 24
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    index = DiskannIndex.build(
        vectors,
        IndexConfig(
            num_dimensions=d,
            distance_type=DistanceType.COSINE,
            num_neighbors=12,
            search_list_size=24,
        ),
    )
    index.delete(np.arange(0, 100, dtype=np.int32))
    compacted = index.compact()
    assert compacted.count == n - 100
    assert compacted.num_deleted == 0
    # External ids of survivors are preserved.
    assert set(compacted.external_ids.tolist()) == set(range(100, n))
    # Self-queries on survivors come back exact.
    ids, dists = compacted.search(
        vectors[100:104], k=1, params=QueryParams(search_list_size=32,
                                                  rescore=24)
    )
    assert [int(e) for e in compacted.to_external(ids)[:, 0]] == [
        100, 101, 102, 103,
    ]


def test_window_strategies_equivalent_contract(rng):
    """Both window strategies serve a rescore window larger than the beam
    (scan.rs:244-305 semantics): self-queries are exact, results are
    valid/live, and recall is within a small gap of brute force."""
    n, d = 3000, 32
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((48, d)).astype(np.float32)
    index = DiskannIndex.build(
        vectors,
        IndexConfig(
            num_dimensions=d,
            distance_type=DistanceType.L2,
            num_neighbors=16,
            search_list_size=32,
        ),
    )
    recalls = {}
    for strat in ("expand", "beam", "scored"):
        params = QueryParams(
            search_list_size=48, rescore=400, window_strategy=strat
        )
        ids, _ = index.search(vectors[:8], k=1, params=params)
        assert [int(i) for i in ids[:, 0]] == list(range(8))
        # No duplicate ids in any result row (the scored window may hold
        # the same id twice; finalize must dedup).
        wide, _ = index.search(queries[:4], k=40, params=params)
        for row in np.asarray(wide):
            live = row[row >= 0]
            assert len(set(live.tolist())) == len(live), (strat, row)
        recalls[strat] = _recall_at_k(
            index, vectors, queries, 10, DistanceType.L2, params=params
        )
    # All serve the window: recall well above the beam-only ceiling and
    # within a small gap of each other.
    assert recalls["beam"] >= 0.9, recalls
    assert recalls["expand"] >= recalls["beam"] - 0.08, recalls
    assert recalls["scored"] >= recalls["beam"] - 0.08, recalls


def test_chunked_ingest_matches_oneshot(rng, monkeypatch):
    """Large builds switch to the two-pass chunked ingest (index.py
    _ingest_chunked — the 5M-scale path where one f32 corpus tensor
    cannot co-reside with the store).  Force it at small N and check the
    result is a healthy equivalent of the one-shot build: same quantizer
    statistics up to Chan-merge float error, self-recall intact, exact
    same stored int8 rows."""
    import pgvectorscale_tpu.index as index_mod

    n, d = 3000, 48
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_neighbors=16,
        search_list_size=32,
        vector_dtype="int8",
    )
    one = DiskannIndex.build(vectors, config)
    monkeypatch.setattr(index_mod, "INGEST_CHUNK_BYTES", 64 * 1024)
    chunked = DiskannIndex.build(vectors, config)
    assert chunked.count == n

    # Quantizer stats agree to float tolerance (Chan merge vs one pass).
    np.testing.assert_allclose(
        np.asarray(chunked.sbq_stats.mean), np.asarray(one.sbq_stats.mean),
        rtol=1e-4, atol=1e-5,
    )
    assert int(chunked.sbq_stats.count) == n
    # Stored rows are identical (quantization is per-row, stats-free).
    np.testing.assert_array_equal(
        np.asarray(chunked.arrays.vectors[:n]),
        np.asarray(one.arrays.vectors[:n]),
    )
    params = QueryParams(search_list_size=48, rescore=64)
    ids, _ = chunked.search(vectors[:16], k=1, params=params)
    assert [int(i) for i in np.asarray(ids)[:, 0]] == list(range(16))


def test_chunked_ingest_keeps_labels(rng, monkeypatch):
    """Round-5 regression: the chunked-ingest branch dropped node_labels
    and label start-node registration entirely (the label block lived only
    in the one-shot branch), so every label-filtered search on a >1 GB
    build returned nothing — 0.0 recall at 1M x 768d on TPU.  Force the
    chunked path at small N and pin filtered behavior to the one-shot
    build's."""
    import pgvectorscale_tpu.index as index_mod

    n, d, n_labels = 2000, 32, 8
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    labels = [[int(i % n_labels)] for i in range(n)]
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_neighbors=16,
        search_list_size=32,
        max_labels_per_vector=1,
    )
    one = DiskannIndex.build(vectors, config, labels=labels)
    monkeypatch.setattr(index_mod, "INGEST_CHUNK_BYTES", 64 * 1024)
    chunked = DiskannIndex.build(vectors, config, labels=labels)

    np.testing.assert_array_equal(
        np.asarray(chunked.arrays.node_labels[:n]),
        np.asarray(one.arrays.node_labels[:n]),
    )
    # Label start nodes registered for every label.
    np.testing.assert_array_equal(
        np.asarray(chunked.arrays.label_start_keys),
        np.asarray(one.arrays.label_start_keys),
    )
    params = QueryParams(search_list_size=48, rescore=64)
    q = vectors[:16]
    qlabels = [labels[i] for i in range(16)]
    ids, _ = chunked.search(q, k=5, params=params, query_labels=qlabels)
    ids = np.asarray(ids)
    # Every returned id must carry the queried label, and the query's own
    # row (exact match, same label) must be found.
    for r in range(16):
        assert int(ids[r, 0]) == r
        for i in ids[r]:
            if int(i) >= 0:
                assert labels[int(i)] == qlabels[r]
