"""Streaming workload tests.

The analog of the reference's Python multi-process concurrency suite
(reference: pgvectorscale tests/test_concurrent_inserts.py — concurrent
insert races, mixed insert+query workloads).  This framework's concurrency
model is single-writer batched (documented stronger-or-equal to the
reference's per-index advisory lock, ports.rs:160-171), so the equivalent
coverage is interleaved add/search/delete consistency.
"""

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams


def test_mixed_insert_query_delete_stream(rng):
    d = 32
    basis = rng.standard_normal((16, d)).astype(np.float32)

    def make(n):
        return rng.standard_normal((n, 16)).astype(np.float32) @ basis

    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
    )
    index = DiskannIndex.build(make(200), config)
    params = QueryParams(search_list_size=32, rescore=20)

    all_vectors = [np.asarray(index.arrays.vectors[:200])]
    # Deletions are tracked in EXTERNAL-id space: tombstone-reuse can
    # legitimately recycle a deleted ROW under a new external identity,
    # but a deleted external id must never resurface (the heap-pointer
    # invariant, scan.rs:231).
    deleted_ext: set[int] = set()
    for step in range(6):
        batch = make(50)
        new_ids = index.add(batch)
        all_vectors.append(np.asarray(index.arrays.vectors[new_ids]))

        # Fresh inserts are immediately searchable (issue #193 analog:
        # inserts visible to subsequent scans).
        ids, _ = index.search(batch[:5], k=1)
        found = set(int(i) for i in ids[:, 0])
        assert found <= set(new_ids.tolist()) | set(range(index.count))

        if step % 2 == 1:
            live_rows = np.nonzero(~index._deleted_np[: index.count])[0]
            victims = rng.choice(live_rows, size=20, replace=False).astype(
                np.int32
            )
            index.delete(victims)
            deleted_ext.update(
                int(e) for e in index.external_ids[victims]
            )
            ids, _ = index.search(make(10), k=10)
            live_ext = set(
                int(e) for e in index.to_external(ids).ravel() if e >= 0
            )
            assert not (live_ext & deleted_ext), (
                "tombstoned rows leaked into results"
            )

    # Slot reuse keeps the row space compact: of the 60 deletes, the 40
    # tombstoned before the last add were recycled by later adds.
    n_recycled = 40
    assert index.count == 200 + 6 * 50 - n_recycled
    assert index.num_deleted == 20  # only the final step's victims remain

    # Every live row remains reachable through the index.
    from pgvectorscale_tpu.debug import count_reachable_nodes

    assert count_reachable_nodes(index) == index.count


def test_iterator_no_duplicates_full_scan(rng):
    """Streaming the whole index yields every live row EXACTLY once
    (round-1 advisor finding: buffer residents were re-pushed across beam
    re-runs and popped twice; set-collecting tests masked it)."""
    n, d = 300, 32
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    index = DiskannIndex.build(
        vectors,
        IndexConfig(
            num_dimensions=d,
            distance_type=DistanceType.L2,
            num_neighbors=16,
            search_list_size=32,
        ),
    )
    it = index.search_iter(
        vectors[0], params=QueryParams(search_list_size=4, rescore=10)
    )
    got = [nid for nid, _ in it]
    assert len(got) == n, f"expected {n} results, got {len(got)}"
    assert len(set(got)) == n, "iterator yielded duplicate ids"


def test_add_then_compact_then_add(rng):
    d = 24
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=12,
        search_list_size=24,
    )
    v1 = rng.standard_normal((150, d)).astype(np.float32)
    index = DiskannIndex.build(v1, config)
    index.delete(np.arange(0, 150, 3, dtype=np.int32))
    index = index.compact()
    assert index.num_deleted == 0

    v2 = rng.standard_normal((60, d)).astype(np.float32)
    new_ids = index.add(v2)
    ids, dists = index.search(v2[:3], k=1)
    assert (dists[:, 0] < 1e-5).all()
    assert set(int(i) for i in ids[:, 0]) <= set(new_ids.tolist())


def test_tombstone_slot_reuse_keeps_capacity_flat(rng):
    """N adds + N deletes leave capacity flat: add() recycles tombstoned
    rows before growing the store (the in-place space-reclamation side of
    vacuum, vacuum.rs:24-157; compact() stays the deep clean)."""
    n, d = 1024, 32
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=12,
        search_list_size=24,
    )
    index = DiskannIndex.build(vectors, config)
    cap0 = index.arrays.capacity
    next_ext = n
    for _ in range(3):
        dead = rng.choice(index.count, size=128, replace=False).astype(
            np.int32
        )
        index.delete(dead)
        newv = rng.standard_normal((128, d)).astype(np.float32)
        ids = index.add(
            newv,
            external_ids=np.arange(next_ext, next_ext + 128, dtype=np.int64),
        )
        next_ext += 128
        assert index.arrays.capacity == cap0  # no growth
        assert index.count == n  # slots recycled, not appended
        assert index.num_deleted == 0
        assert set(ids.tolist()) == set(int(i) for i in dead)

        # Recycled rows are live and self-findable at their new identity.
        got, _ = index.search(
            newv[:4], k=1, params=QueryParams(search_list_size=32, rescore=32)
        )
        assert [int(i) for i in got[:, 0]] == [int(i) for i in ids[:4]]

    # Mixed fresh+reuse: delete 64 then add 128 -> 64 recycled, 64 appended.
    dead = rng.choice(index.count, size=64, replace=False).astype(np.int32)
    index.delete(dead)
    newv = rng.standard_normal((128, d)).astype(np.float32)
    ids = index.add(
        newv, external_ids=np.arange(next_ext, next_ext + 128, dtype=np.int64)
    )
    assert index.count == n + 64
    assert set(ids[:64].tolist()) == set(int(i) for i in dead)
    assert (ids[64:] >= n).all()
    assert index.num_deleted == 0


def test_slot_reuse_copy_on_write_external_ids(rng):
    """external_ids is copy-on-write under slot reuse: a reader holding
    the pre-recycle snapshot must keep its original row->external mapping
    (append-only contract; snapshot-reader model)."""
    n, d = 256, 16
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=10,
        search_list_size=16,
    )
    index = DiskannIndex.build(vectors, config)
    snapshot = index.external_ids  # what a concurrent reader would hold
    before = snapshot.copy()

    dead = np.arange(0, 32, dtype=np.int32)
    index.delete(dead)
    index.add(
        rng.standard_normal((32, d)).astype(np.float32),
        external_ids=np.arange(n, n + 32, dtype=np.int64),
    )
    # The reader's array is untouched; the writer sees the new mapping.
    np.testing.assert_array_equal(snapshot, before)
    assert (index.external_ids[:32] == np.arange(n, n + 32)).all()


def test_add_failure_leaves_index_unchanged(rng):
    """A label-validation error mid-add must leave the index at its
    pre-add snapshot: no half-committed tombstone flips, external ids, or
    device rows (the single-writer model's atomicity contract)."""
    n, d = 200, 16
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=10,
        search_list_size=16,
        max_labels_per_vector=2,
    )
    index = DiskannIndex.build(
        vectors, config, labels=[[1] for _ in range(n)]
    )
    dead = np.arange(0, 8, dtype=np.int32)
    index.delete(dead)
    deleted_before = index.num_deleted
    ext_before = index.external_ids.copy()
    arrays_before = index.arrays

    bad = rng.standard_normal((8, d)).astype(np.float32)
    with pytest.raises(ValueError):
        index.add(bad, labels=[[1, 2, 3]] * 8)  # 3 labels > max 2

    assert index.num_deleted == deleted_before  # tombstones intact
    np.testing.assert_array_equal(index.external_ids, ext_before)
    assert index.arrays is arrays_before  # device state unpublished
    # The failed rows were never inserted: a retry with valid labels works
    # and recycles the tombstoned slots.
    ids = index.add(
        bad,
        external_ids=np.arange(n, n + 8, dtype=np.int64),
        labels=[[1, 2]] * 8,
    )
    assert set(ids.tolist()) == set(int(i) for i in dead)
    assert index.num_deleted == 0
