"""RobustPrune vs a scalar numpy port of the reference's prune_neighbors
(graph/mod.rs:392-488), including tiebreaks and label-aware occlusion."""

import numpy as np
import pytest

from pgvectorscale_tpu import labels as L
from pgvectorscale_tpu.config import DistanceType
from pgvectorscale_tpu.graph.prune import (
    alpha_schedule,
    pairwise_distance_matrix_full,
    pairwise_hamming_mxu,
    robust_prune,
    unpack_code_bits,
)

F32_EPS = float(np.finfo(np.float32).eps)
BIG = 3.0e38


def ref_get_factor(num_d, num_tie, div_d, div_tie):
    """DistanceWithTieBreak::get_factor (neighbor_with_distance.rs:55-66)."""
    if div_d < F32_EPS:
        if num_d < F32_EPS:
            return num_tie / max(div_tie, 1.0)
        return BIG
    return num_d / div_d


def ref_prune(
    node_id,
    cand_ids,
    cand_dists,
    pair_fn,
    max_alpha,
    num_neighbors,
    node_labels=None,
    cand_labels=None,
):
    """Scalar port of prune_neighbors (graph/mod.rs:392-488)."""
    cands = [
        (d, abs(i - node_id), i, k)
        for k, (i, d) in enumerate(zip(cand_ids, cand_dists))
        if i >= 0 and i != node_id
    ]
    # sort: distance, then id-distance tiebreak for zero distances
    cands.sort(key=lambda t: (t[0], t[1] if t[0] <= F32_EPS else 0.0))
    results = []
    max_factors = [0.0] * len(cands)
    alpha = 1.0
    while alpha <= max_alpha and len(results) < num_neighbors:
        for i, (d_i, tie_i, id_i, k_i) in enumerate(cands):
            if len(results) >= num_neighbors:
                return results
            if max_factors[i] > alpha:
                continue
            max_factors[i] = BIG * 10
            results.append((id_i, d_i))
            for j in range(i + 1, len(cands)):
                if max_factors[j] > max_alpha * 1e40:
                    continue
                d_j, tie_j, id_j, k_j = cands[j]
                if node_labels is not None:
                    inter = set(cand_labels[k_j]) & set(node_labels)
                    if not inter <= set(cand_labels[k_i]):
                        continue
                div = pair_fn(id_i, id_j)
                factor = ref_get_factor(
                    d_j, tie_j, div, abs(id_i - id_j)
                )
                max_factors[j] = max(max_factors[j], factor)
        alpha *= 1.2
    return results


def run_case(rng, n_cands, dims, max_alpha, r, dup_frac=0.0):
    node_id = 500
    vecs = rng.standard_normal((1000, dims)).astype(np.float32)
    if dup_frac > 0:
        # duplicate-heavy data: many candidates equal the node vector
        dup = rng.random(1000) < dup_frac
        vecs[dup] = vecs[node_id]
    cand_ids = rng.choice(1000, size=n_cands, replace=False).astype(np.int32)
    node_vec = vecs[node_id]
    cand_dists = np.sum(
        (vecs[cand_ids] - node_vec) ** 2, axis=1, dtype=np.float32
    )

    # Use the exact same f32 pairwise matrix for both implementations so
    # boundary comparisons (factor == alpha) agree bit-for-bit.
    pair = np.asarray(
        pairwise_distance_matrix_full(vecs[cand_ids][None], DistanceType.L2)
    )
    pos = {int(i): k for k, i in enumerate(cand_ids)}

    def pair_fn(a, b):
        return float(pair[0, pos[a], pos[b]])

    want = ref_prune(node_id, cand_ids, cand_dists, pair_fn, max_alpha, r)
    got_ids, got_d = robust_prune(
        np.asarray([node_id], np.int32),
        cand_ids[None],
        cand_dists[None].astype(np.float32),
        np.asarray(pair),
        np.zeros((1, n_cands, 0), np.int32),
        np.zeros((1, 0), np.int32),
        num_neighbors=r,
        alphas=alpha_schedule(max_alpha),
        labeled=False,
    )
    got_ids = np.asarray(got_ids)[0]
    got = [int(i) for i in got_ids if i >= 0]
    assert got == [int(i) for i, _ in want], (got, want)


@pytest.mark.parametrize("max_alpha", [1.0, 1.2, 2.0])
@pytest.mark.parametrize("n_cands", [5, 30, 80])
def test_prune_matches_reference(rng, n_cands, max_alpha):
    run_case(rng, n_cands, 16, max_alpha, 10)


def test_prune_duplicate_vectors(rng):
    """Tiebreak path: zero distances order/occlude by id distance."""
    run_case(rng, 40, 8, 1.2, 8, dup_frac=0.5)


def test_prune_excludes_self_and_padding(rng):
    node_id = 3
    cand_ids = np.asarray([[3, 7, -1, 9]], np.int32)
    cand_dists = np.asarray([[0.0, 1.0, 0.5, 2.0]], np.float32)
    pair = np.ones((1, 4, 4), np.float32) * 10
    ids, d = robust_prune(
        np.asarray([node_id], np.int32),
        cand_ids,
        cand_dists,
        pair,
        np.zeros((1, 4, 0), np.int32),
        np.zeros((1, 0), np.int32),
        num_neighbors=4,
        alphas=(1.0,),
        labeled=False,
    )
    out = [int(i) for i in np.asarray(ids)[0] if i >= 0]
    assert 3 not in out and -1 not in out
    assert out == [7, 9]


def test_prune_label_aware(rng):
    """A picked neighbor missing the candidate's essential labels must not
    occlude it (graph/mod.rs:452-462)."""
    # node has labels {1}; candidate 0 (closest) has {2}, candidate 1 has {1}
    # and sits right next to candidate 0 -> without label protection c1 is
    # occluded; with it, c1 survives.
    node_id = 100
    cand_ids = np.asarray([[0, 1]], np.int32)
    cand_dists = np.asarray([[1.0, 1.05]], np.float32)
    pair = np.asarray([[[0.0, 0.001], [0.001, 0.0]]], np.float32)
    node_labels = L.make_label_array([[1]], 2)
    cand_labels = L.make_label_array([[2], [1]], 2)[None]

    ids, _ = robust_prune(
        np.asarray([node_id], np.int32),
        cand_ids,
        cand_dists,
        pair,
        cand_labels,
        node_labels,
        num_neighbors=1,
        alphas=(1.0, 1.2),
        labeled=True,
    )
    # only 1 slot: closest (0) wins, but with 2 slots c1 must survive too
    ids2, _ = robust_prune(
        np.asarray([node_id], np.int32),
        cand_ids,
        cand_dists,
        pair,
        cand_labels,
        node_labels,
        num_neighbors=2,
        alphas=(1.0, 1.2),
        labeled=True,
    )
    out2 = [int(i) for i in np.asarray(ids2)[0] if i >= 0]
    assert out2 == [0, 1]

    # Same geometry without labels: c1 is occluded (factor 1.05/0.001 huge).
    ids3, _ = robust_prune(
        np.asarray([node_id], np.int32),
        cand_ids,
        cand_dists,
        pair,
        np.zeros((1, 2, 0), np.int32),
        np.zeros((1, 0), np.int32),
        num_neighbors=2,
        alphas=(1.0, 1.2),
        labeled=False,
    )
    out3 = [int(i) for i in np.asarray(ids3)[0] if i >= 0]
    assert out3 == [0]


def test_pairwise_hamming_mxu_matches_xor(rng):
    from pgvectorscale_tpu.ops.hamming import hamming_distance_matrix

    codes = rng.integers(0, 2**32, size=(6, 8), dtype=np.uint32)
    num_bits = 8 * 32
    bits = unpack_code_bits(codes, num_bits)
    got = np.asarray(pairwise_hamming_mxu(bits[None]))[0]
    want = np.asarray(hamming_distance_matrix(codes, codes))
    np.testing.assert_allclose(got, want)


def test_alpha_schedule():
    assert alpha_schedule(1.0) == (1.0,)
    assert alpha_schedule(1.2) == (1.0, 1.2)
    assert len(alpha_schedule(2.0)) == 4  # 1.0, 1.2, 1.44, 1.728
