"""Statistical Binary Quantization (SBQ).

TPU-native reimplementation of the reference quantizer
(reference: pgvectorscale/src/access_method/sbq/quantize.rs).

Behavioral contract preserved:

- Training accumulates per-dimension mean and M2 (sum of squared deviations).
  The reference uses streaming Welford updates (quantize.rs:115-148) because
  it sees one tuple at a time; we compute the same statistics with batched
  ``jnp`` reductions (M2 == sum((x - mean)^2), variance = M2 / count).
- 1-bit encoding: bit i set iff v[i] > mean[i] (quantize.rs:57-62).
- Multi-bit encoding: thermometer/unary code over z-score buckets in [-2, 2]:
  ranges = bits + 1, index = (z + 2) / (4 / ranges), count_ones =
  min(floor(index), bits) if index >= 1 else 0; NaN z-scores (zero variance)
  encode as 0 ones, matching Rust's ``NaN as usize == 0``
  (quantize.rs:63-89).
- Untrained fallback (count == 0): bit i set iff v[i] > 0
  (quantize.rs:91-101).
- Bits are packed LSB-first into words (quantize.rs:60, `1 << (i % WORD)`);
  the reference packs into u64, we pack into u32 (TPU-native int width) —
  Hamming distances are identical because popcount is word-size agnostic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

WORD_BITS = 32


class SbqStats(NamedTuple):
    """Trained quantizer statistics (analog of SbqMeans persistence,
    sbq/mod.rs:88-137)."""

    count: jax.Array  # int32 scalar (reference uses u64; int32 covers the
    # 2^31 max row count of the dense-id store)
    mean: jax.Array  # f32[D]
    m2: jax.Array  # f32[D]


def num_code_words(dims: int, bits: int) -> int:
    num_bits = dims * bits
    return (num_bits + WORD_BITS - 1) // WORD_BITS


def train(vectors: jax.Array) -> SbqStats:
    """Compute per-dimension mean / M2 over the training set.

    One batched pass replaces the reference's per-tuple Welford heap scan
    (build.rs:574-614, quantize.rs:115-148): for the final statistics the
    two are mathematically identical.
    """
    vectors = jnp.asarray(vectors, dtype=jnp.float32)
    count = vectors.shape[0]
    mean = jnp.mean(vectors, axis=0)
    centered = vectors - mean[None, :]
    m2 = jnp.sum(centered * centered, axis=0)
    return SbqStats(
        count=jnp.asarray(count, dtype=jnp.int32),
        mean=mean,
        m2=m2,
    )


def merge_stats(a: SbqStats, b: SbqStats) -> SbqStats:
    """Chan's parallel merge of two (count, mean, M2) triples.

    Used when training is sharded across devices/batches — the distributed
    analog of the reference's single-pass heap scan.
    """
    n = a.count + b.count
    n_f = jnp.maximum(n, 1).astype(jnp.float32)
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.count.astype(jnp.float32) / n_f)
    m2 = (
        a.m2
        + b.m2
        + delta
        * delta
        * (a.count.astype(jnp.float32) * b.count.astype(jnp.float32) / n_f)
    )
    return SbqStats(count=n, mean=mean, m2=m2)


def _pack_bits(bit_array: jax.Array, words: int) -> jax.Array:
    """Pack a [N, num_bits] 0/1 array into [N, words] uint32, LSB-first."""
    n, num_bits = bit_array.shape
    padded = words * WORD_BITS
    if padded != num_bits:
        bit_array = jnp.pad(bit_array, ((0, 0), (0, padded - num_bits)))
    b = bit_array.reshape(n, words, WORD_BITS).astype(jnp.uint32)
    shifts = (jnp.uint32(1) << jnp.arange(WORD_BITS, dtype=jnp.uint32))[
        None, None, :
    ]
    return jnp.sum(b * shifts, axis=-1, dtype=jnp.uint32)


def encode(
    vectors: jax.Array,
    stats: SbqStats,
    bits: int,
) -> jax.Array:
    """Quantize [N, D] float vectors into [N, W] packed uint32 codes.

    Exactly reproduces quantize.rs:52-102 (see module docstring).
    """
    vectors = jnp.asarray(vectors, dtype=jnp.float32)
    n, dims = vectors.shape
    words = num_code_words(dims, bits)
    trained = stats.count > 0

    # Untrained fallback: bit at position i iff v > 0, regardless of bits
    # (quantize.rs:91-101 — the loop indexes by dimension, not bit position).
    untrained_bits = (vectors > 0.0).astype(jnp.uint32)
    untrained_packed = _pack_bits(untrained_bits, words)

    if bits == 1:
        # Trained 1-bit: v > mean (quantize.rs:57-62).
        bit_array = (vectors > stats.mean[None, :]).astype(jnp.uint32)
        trained_packed = _pack_bits(bit_array, words)
    else:
        # Multi-bit thermometer code (quantize.rs:63-89).
        count_f = jnp.maximum(stats.count, 1).astype(jnp.float32)
        variance = stats.m2 / count_f
        std = jnp.sqrt(variance)
        ranges = bits + 1
        z = (vectors - stats.mean[None, :]) / std[None, :]
        index = (z + 2.0) / (4.0 / ranges)
        ones = jnp.minimum(jnp.floor(index), float(bits))
        ones = jnp.where(index < 1.0, 0.0, ones)
        # NaN (zero-variance dim, v == mean): Rust `NaN as usize` is 0.
        ones = jnp.where(jnp.isnan(index), 0.0, ones).astype(jnp.int32)

        # Thermometer fill-from-the-left: bit j of dim i set iff j < ones[i]
        # (bit position = i * bits + j).
        j = jnp.arange(bits, dtype=jnp.int32)[None, None, :]
        bit_array = (
            (j < ones[:, :, None]).astype(jnp.uint32).reshape(n, dims * bits)
        )
        trained_packed = _pack_bits(bit_array, words)

    return jnp.where(trained, trained_packed, untrained_packed)
