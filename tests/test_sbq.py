"""SBQ quantizer semantics vs a scalar numpy port of quantize.rs."""

import numpy as np
import pytest

from pgvectorscale_tpu.ops import sbq


def np_quantize(vec, mean, m2, count, bits):
    """Scalar reimplementation of SbqQuantizer::quantize
    (quantize.rs:52-102), packing into u32 words LSB-first."""
    dims = len(vec)
    words = sbq.num_code_words(dims, bits)
    out = np.zeros(words, dtype=np.uint32)

    def set_bit(pos):
        out[pos // 32] |= np.uint32(1) << np.uint32(pos % 32)

    if count == 0:
        # Untrained: bit at position i (quantize.rs:91-101).
        for i, v in enumerate(vec):
            if v > 0.0:
                set_bit(i)
        return out

    if bits == 1:
        for i, v in enumerate(vec):
            if v > mean[i]:
                set_bit(i)
        return out

    old_err = np.seterr(all="ignore")
    for i, v in enumerate(vec):
        variance = m2[i] / count
        std = np.sqrt(variance)
        ranges = bits + 1
        # Rust computes (v - mean) / std unconditionally; 0/0 = NaN.
        z = (v - mean[i]) / std
        index = (z + 2.0) / (4.0 / ranges)
        if index < 1.0:
            ones = 0
        elif np.isnan(index):
            ones = 0  # Rust `NaN as usize` saturates to 0
        else:
            ones = min(int(np.floor(index)), bits)
        for j in range(ones):
            set_bit(i * bits + j)
    np.seterr(**old_err)
    return out


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
@pytest.mark.parametrize("dims", [8, 33, 128])
def test_encode_matches_scalar(rng, bits, dims):
    train_data = rng.standard_normal((200, dims)).astype(np.float32)
    stats = sbq.train(train_data)
    mean = np.asarray(stats.mean)
    m2 = np.asarray(stats.m2)
    count = int(stats.count)

    vecs = rng.standard_normal((17, dims)).astype(np.float32)
    got = np.asarray(sbq.encode(vecs, stats, bits))
    want = np.stack([np_quantize(v, mean, m2, count, bits) for v in vecs])
    np.testing.assert_array_equal(got, want)


def test_train_matches_welford(rng):
    """Batched train == streaming Welford (quantize.rs:115-148)."""
    data = rng.standard_normal((157, 19)).astype(np.float64)
    mean = np.zeros(19)
    m2 = np.zeros(19)
    for i, x in enumerate(data, start=1):
        delta = x - mean
        mean += (x - mean) / i
        delta2 = x - mean
        m2 += delta * delta2
    stats = sbq.train(data.astype(np.float32))
    np.testing.assert_allclose(np.asarray(stats.mean), mean, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.m2), m2, rtol=1e-3, atol=1e-2)
    assert int(stats.count) == 157


def test_merge_stats_matches_joint(rng):
    a = rng.standard_normal((100, 11)).astype(np.float32)
    b = rng.standard_normal((57, 11)).astype(np.float32) + 2.0
    merged = sbq.merge_stats(sbq.train(a), sbq.train(b))
    joint = sbq.train(np.concatenate([a, b]))
    assert int(merged.count) == int(joint.count)
    np.testing.assert_allclose(
        np.asarray(merged.mean), np.asarray(joint.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(merged.m2), np.asarray(joint.m2), rtol=1e-4, atol=1e-2
    )


def test_untrained_falls_back_to_sign(rng):
    """count == 0 -> sign-vs-zero encoding (quantize.rs:91-101)."""
    dims = 16
    stats = sbq.SbqStats(
        count=np.int64(0),
        mean=np.zeros(dims, np.float32),
        m2=np.zeros(dims, np.float32),
    )
    vecs = rng.standard_normal((5, dims)).astype(np.float32)
    got = np.asarray(sbq.encode(vecs, stats, 1))
    want = np.zeros((5, 1), dtype=np.uint32)
    for r in range(5):
        for i in range(dims):
            if vecs[r, i] > 0:
                want[r, 0] |= np.uint32(1) << np.uint32(i)
    np.testing.assert_array_equal(got, want)


def test_zero_variance_dim_encodes_zero_ones():
    """All-equal dim -> NaN z-score -> 0 ones (Rust NaN-as-usize)."""
    data = np.ones((50, 4), dtype=np.float32)
    stats = sbq.train(data)
    codes = np.asarray(sbq.encode(np.ones((1, 4), np.float32), stats, 2))
    assert codes[0, 0] == 0


@pytest.mark.parametrize("dims,bits", [(128, 2), (768, 1), (900, 1)])
def test_code_width(dims, bits):
    assert sbq.num_code_words(dims, bits) == -(-dims * bits // 32)


def test_hamming_is_l1_on_thermometer_levels(rng):
    """Thermometer codes make Hamming == L1 distance on bucket levels —
    the property that lets the 4/8-bit TPU tiers reuse the packed
    XOR+popcount pipeline unchanged (higher fidelity, same kernels)."""
    from pgvectorscale_tpu.ops.hamming import hamming_distance_matrix

    bits, dims = 4, 32
    train_data = rng.standard_normal((300, dims)).astype(np.float32)
    stats = sbq.train(train_data)
    a = rng.standard_normal((9, dims)).astype(np.float32)
    b = rng.standard_normal((7, dims)).astype(np.float32)

    def lv(x):
        mean, m2 = np.asarray(stats.mean), np.asarray(stats.m2)
        std = np.sqrt(m2 / int(stats.count))
        index = ((x - mean) / std + 2.0) / (4.0 / (bits + 1))
        ones = np.minimum(np.floor(index), bits)
        return np.where(index < 1.0, 0, ones).astype(np.int64)

    got = np.asarray(
        hamming_distance_matrix(
            sbq.encode(a, stats, bits), sbq.encode(b, stats, bits)
        )
    )
    want = np.abs(lv(a)[:, None, :] - lv(b)[None, :, :]).sum(axis=-1)
    np.testing.assert_array_equal(got, want)


def test_high_fidelity_bits_raise_rescore_ceiling(rng):
    """4-bit codes order candidates strictly better than 2-bit on the same
    corpus: the exact-rescore ceiling at a fixed window improves (the
    reason the TPU-only 4/8 tiers exist — results/sift1m.jsonl sbq-ceiling
    rows show 2-bit capping 1M recall at 0.955)."""
    import pytest as _pytest

    from pgvectorscale_tpu import IndexConfig
    from pgvectorscale_tpu.ops.hamming import hamming_distance_matrix

    with _pytest.raises(ValueError):
        IndexConfig(num_dimensions=16, num_bits_per_dimension=3)
    IndexConfig(num_dimensions=16, num_bits_per_dimension=4)  # accepted
    IndexConfig(num_dimensions=16, num_bits_per_dimension=8)

    n, d, q, k, window = 4000, 48, 64, 10, 30
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    exact = (
        np.einsum("nd,nd->n", vectors, vectors)[None, :]
        - 2.0 * queries @ vectors.T
    )
    gt = np.argpartition(exact, k, axis=1)[:, :k]

    stats = sbq.train(vectors)
    ceilings = {}
    for bits in (2, 4):
        cd = np.asarray(
            hamming_distance_matrix(
                sbq.encode(queries, stats, bits),
                sbq.encode(vectors, stats, bits),
            )
        )
        top = np.argpartition(cd, window, axis=1)[:, :window]
        hits = 0
        for r in range(q):
            w = top[r]
            best = w[np.argpartition(exact[r][w], k)[:k]]
            hits += len(set(best) & set(gt[r]))
        ceilings[bits] = hits / (q * k)
    assert ceilings[4] > ceilings[2]


def test_four_bit_index_builds_and_searches(rng):
    """End-to-end smoke at bits=4: build, search, self-query exactness."""
    from pgvectorscale_tpu import (
        DiskannIndex,
        DistanceType,
        IndexConfig,
        QueryParams,
    )

    n, d, k = 400, 24, 5
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
        num_bits_per_dimension=4,
    )
    index = DiskannIndex.build(vectors, config)
    assert index.arrays.codes.shape[1] == sbq.num_code_words(d, 4)
    ids, dists = index.search(
        vectors[:8], k=k, params=QueryParams(search_list_size=32, rescore=32)
    )
    # Self-queries find themselves at distance ~0.
    np.testing.assert_array_equal(ids[:, 0], np.arange(8))
    assert np.all(dists[:, 0] < 1e-4)
