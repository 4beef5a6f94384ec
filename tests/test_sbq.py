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


@pytest.mark.parametrize("bits", [1, 2])
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
