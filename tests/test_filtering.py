"""Label-filtered search scenario matrix.

Ports the reference's filtering test scenarios
(reference: pgvectorscale/src/access_method/labels/filtering_tests.rs —
13 #[pg_test] scenarios: NULL/empty labels, index on non-empty table,
mixed post-filtering, label updates, complex ORDER BY, label bounds,
multi-label queries, and the recall gate).
"""

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams

import jax.numpy as jnp

from pgvectorscale_tpu.distance import preprocess_cosine
from pgvectorscale_tpu.ops.bruteforce import brute_force_search


@pytest.fixture(scope="module")
def labeled_index():
    rng = np.random.default_rng(11)
    n, d = 600, 64
    basis = rng.standard_normal((24, d)).astype(np.float32)
    vectors = rng.standard_normal((n, 24)).astype(np.float32) @ basis
    # Labels: class i%4; every 10th vector additionally labeled 100;
    # every 17th has NO labels (NULL analog).
    labels = []
    for i in range(n):
        if i % 17 == 0:
            labels.append(None)
        elif i % 10 == 0:
            labels.append([i % 4, 100])
        else:
            labels.append([i % 4])
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.COSINE,
        num_neighbors=20,
        search_list_size=50,
        max_labels_per_vector=2,
    )
    index = DiskannIndex.build(vectors, config, labels=labels)
    return index, vectors, labels


def _label_set(labels, i):
    return set(labels[i] or [])


def test_single_label_filter(labeled_index, rng):
    index, vectors, labels = labeled_index
    q = rng.standard_normal((10, vectors.shape[1])).astype(np.float32)
    ids, _ = index.search(q, k=10, query_labels=[[2]] * 10)
    for row in ids:
        for i in row:
            if i >= 0:
                assert 2 in _label_set(labels, int(i))


def test_two_label_filter_is_union(labeled_index, rng):
    """`labels && ARRAY[a, b]` matches vectors carrying a OR b."""
    index, vectors, labels = labeled_index
    q = rng.standard_normal((10, vectors.shape[1])).astype(np.float32)
    ids, _ = index.search(q, k=10, query_labels=[[1, 100]] * 10)
    for row in ids:
        for i in row:
            if i >= 0:
                assert _label_set(labels, int(i)) & {1, 100}


def test_unlabeled_rows_match_no_filter(labeled_index, rng):
    """Rows with NULL/empty labels are unreachable through any filter
    (empty sets overlap nothing, labels/mod.rs:124-142)."""
    index, vectors, labels = labeled_index
    null_rows = {i for i, l in enumerate(labels) if not l}
    q = rng.standard_normal((10, vectors.shape[1])).astype(np.float32)
    for target in ([0], [1, 2], [100]):
        ids, _ = index.search(q, k=20, query_labels=[target] * 10)
        found = {int(i) for row in ids for i in row if i >= 0}
        assert not (found & null_rows)


def test_filter_with_unknown_label_returns_nothing(labeled_index, rng):
    index, vectors, _ = labeled_index
    q = rng.standard_normal((3, vectors.shape[1])).astype(np.float32)
    ids, dists = index.search(q, k=5, query_labels=[[7777]] * 3)
    assert (ids == -1).all()
    assert np.isinf(dists).all()


def test_rare_label_full_enumeration(labeled_index, rng):
    """A filter matching few rows returns all of them (the reference's
    per-label start nodes guarantee entry into each label's subgraph)."""
    index, vectors, labels = labeled_index
    rare_rows = {i for i, l in enumerate(labels) if l and 100 in l}
    q = rng.standard_normal((5, vectors.shape[1])).astype(np.float32)
    ids, _ = index.search(
        q,
        k=len(rare_rows) + 5,
        params=QueryParams(search_list_size=100, rescore=100),
        query_labels=[[100]] * 5,
    )
    for row in ids:
        found = {int(i) for i in row if i >= 0}
        assert found == rare_rows, (
            f"missed {rare_rows - found}, extra {found - rare_rows}"
        )


def test_label_update_via_delete_and_readd(labeled_index, rng):
    """The reference covers UPDATE of a row's labels; here the analog is
    delete + re-add with new labels."""
    index, vectors, labels = labeled_index

    rng2 = np.random.default_rng(3)
    n, d = 200, 32
    basis = rng2.standard_normal((16, d)).astype(np.float32)
    V = rng2.standard_normal((n, 16)).astype(np.float32) @ basis
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=12,
        search_list_size=24,
        max_labels_per_vector=2,
    )
    idx = DiskannIndex.build(V, config, labels=[[1]] * n)
    # Move vector 0 from label 1 to label 2.
    idx.delete(np.asarray([0], dtype=np.int32))
    new_id = idx.add(V[:1], labels=[[2]])[0]
    ids, _ = idx.search(V[0], k=1, query_labels=[[2]])
    assert ids[0, 0] == new_id
    ids, _ = idx.search(V[0], k=n, query_labels=[[1]])
    assert new_id not in set(ids[0].tolist())
    assert 0 not in set(ids[0].tolist())  # old tombstoned row never returned


def test_filtered_recall_multi_label(labeled_index, rng):
    """Recall gate for a 2-label (union) filter vs filtered brute force —
    the reference's recall assertions cover 1- and 2-label filters."""
    index, vectors, labels = labeled_index
    n = len(vectors)
    q = rng.standard_normal((15, vectors.shape[1])).astype(np.float32)
    target = {0, 3}
    valid = np.asarray(
        [bool(_label_set(labels, i) & target) for i in range(n)]
    )
    dv = preprocess_cosine(jnp.asarray(vectors))
    dq = preprocess_cosine(jnp.asarray(q))
    gt, _ = brute_force_search(
        dq, dv, jnp.asarray(valid), k=10, distance_type=DistanceType.COSINE
    )
    gt = np.asarray(gt)
    # Note this filter matches ~47% of rows — far broader than the
    # reference's recall scenario (1-2 of 32 classes on 1K rows); a wider
    # rescore window is the appropriate operating point.
    ids, _ = index.search(
        q,
        k=10,
        params=QueryParams(search_list_size=100, rescore=150),
        query_labels=[[0, 3]] * 15,
    )
    hits = sum(
        len(set(gt[r]) & set(int(i) for i in ids[r] if i >= 0))
        for r in range(15)
    )
    assert hits / 150 >= 0.9


def test_label_start_cleared_on_slot_reuse(rng):
    """A recycled row must not remain a START node for labels it no longer
    carries (update_start_nodes registers sticky starts,
    graph/mod.rs:490-533; tombstone reuse is the TPU-side extension)."""
    from pgvectorscale_tpu.labels import LABEL_SENTINEL

    n, d = 300, 16
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    # Label 7 lives on exactly one row; everything else is label 1.
    labels = [[7] if i == 42 else [1] for i in range(n)]
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=10,
        search_list_size=16,
        max_labels_per_vector=1,
    )
    index = DiskannIndex.build(vectors, config, labels=labels)
    keys = np.asarray(index.arrays.label_start_keys)
    ids = np.asarray(index.arrays.label_start_ids)
    assert ids[np.nonzero(keys == 7)[0][0]] == 42

    # Delete row 42 and recycle it under label 3.
    index.delete(np.asarray([42], dtype=np.int32))
    new_ids = index.add(
        rng.standard_normal((1, d)).astype(np.float32), labels=[[3]]
    )
    assert new_ids.tolist() == [42]
    keys = np.asarray(index.arrays.label_start_keys)
    ids = np.asarray(index.arrays.label_start_ids)
    # label 7 no longer claims row 42; label 3 is covered (by row 42).
    lab7 = np.nonzero(keys == 7)[0]
    assert len(lab7) == 0 or ids[lab7[0]] != 42
    assert 3 in set(int(k) for k in keys if k != LABEL_SENTINEL)
    # Filtered search for label 3 finds the recycled row; label 7 returns
    # nothing wrong (no rows carry it anymore).
    got, _ = index.search(
        vectors[:2], k=3,
        params=QueryParams(search_list_size=16, rescore=8),
        query_labels=[[3], [7]],
    )
    assert 42 in set(int(i) for i in got[0] if i >= 0)
    assert all(int(i) == -1 for i in got[1])
