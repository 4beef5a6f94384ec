"""Property-based tests (hypothesis) for the quantizer and label algebra.

SURVEY.md §4 carry-over (d): property tests on quantizer and label algebra
— the reference covers these with hand-written unit matrices
(labels/mod.rs:249-425; quantize semantics scattered through sbq tests).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from pgvectorscale_tpu.labels import (
    LABEL_SENTINEL,
    array_overlap,
    contains_intersection,
    make_label_array,
    overlaps,
)
from pgvectorscale_tpu.ops import sbq
from pgvectorscale_tpu.ops.hamming import hamming_pairwise

label_sets = st.lists(
    st.integers(min_value=-(2**15), max_value=2**15 - 1),
    min_size=0,
    max_size=6,
)


@settings(max_examples=40, deadline=None)
@given(a=label_sets, b=label_sets)
def test_overlaps_matches_set_semantics(a, b):
    arr = make_label_array([a, b], 8)
    got = bool(np.asarray(overlaps(jnp.asarray(arr[0]), jnp.asarray(arr[1]))))
    assert got == bool(set(a) & set(b))


@settings(max_examples=40, deadline=None)
@given(s=label_sets, a=label_sets, b=label_sets)
def test_contains_intersection_matches_set_semantics(s, a, b):
    arr = make_label_array([s, a, b], 8)
    got = bool(
        np.asarray(
            contains_intersection(
                jnp.asarray(arr[0]), jnp.asarray(arr[1]), jnp.asarray(arr[2])
            )
        )
    )
    # Reference semantics: is (a ∩ b) ⊆ self (labels/mod.rs:85-111)?
    assert got == ((set(a) & set(b)) <= set(s))


@settings(max_examples=40, deadline=None)
@given(a=label_sets, b=label_sets)
def test_array_overlap_operator(a, b):
    assert array_overlap(a, b) == bool(set(a) & set(b))


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=8, max_size=8,
        ),
        min_size=2, max_size=20,
    ),
    bits=st.sampled_from([1, 2]),
)
def test_sbq_hamming_zero_iff_same_bucket(data, bits):
    """Identical vectors always encode identically (Hamming 0); and the
    code of any vector is deterministic."""
    v = np.asarray(data, dtype=np.float32)
    stats = sbq.train(jnp.asarray(v))
    codes1 = sbq.encode(jnp.asarray(v), stats, bits)
    codes2 = sbq.encode(jnp.asarray(v), stats, bits)
    np.testing.assert_array_equal(np.asarray(codes1), np.asarray(codes2))
    d = np.asarray(hamming_pairwise(codes1, codes2))
    assert (d == 0).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=64),
    dims=st.integers(min_value=1, max_value=40),
    bits=st.sampled_from([1, 2]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_sbq_thermometer_is_monotone_per_dim(n, dims, bits, seed):
    """Within a dimension, a larger value never gets fewer thermometer
    ones — the defining property of the unary code (quantize.rs:63-89)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dims)).astype(np.float32)
    stats = sbq.train(jnp.asarray(v))
    codes = np.asarray(sbq.encode(jnp.asarray(v), stats, bits))

    # Unpack per-dimension ones counts.
    total_bits = dims * bits
    unpacked = np.zeros((n, total_bits), dtype=np.int32)
    for w in range(codes.shape[1]):
        for j in range(32):
            pos = w * 32 + j
            if pos < total_bits:
                unpacked[:, pos] = (codes[:, w] >> j) & 1
    ones = unpacked.reshape(n, dims, bits).sum(axis=2)

    for dim in range(dims):
        order = np.argsort(v[:, dim], kind="stable")
        sorted_ones = ones[order, dim]
        assert (np.diff(sorted_ones) >= 0).all(), (
            f"thermometer not monotone in dim {dim}"
        )


def test_make_label_array_sorts_and_dedups():
    arr = make_label_array([[5, -3, 5, 0]], 8)
    vals = [int(v) for v in arr[0] if v != LABEL_SENTINEL]
    assert vals == [-3, 0, 5]


def test_make_label_array_rejects_out_of_range():
    with pytest.raises(ValueError, match="smallint range"):
        make_label_array([[2**15]], 4)
    with pytest.raises(ValueError, match="at most"):
        make_label_array([[1, 2, 3]], 2)
