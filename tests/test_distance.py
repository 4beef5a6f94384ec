"""Distance kernel semantics vs scalar numpy reimplementations of the
reference (distance/mod.rs) — the analog of the reference's SIMD-vs-scalar
equivalence tests (distance_x86.rs:38-64)."""

import numpy as np
import pytest

from pgvectorscale_tpu.config import DistanceType
from pgvectorscale_tpu.distance import (
    distance_matrix,
    pairwise_distance,
    preprocess_cosine,
    preprocess_query,
)


def np_l2(a, b):
    d = a - b
    return float(np.sum(d * d))  # no sqrt (distance/mod.rs:107-117)


def np_ip(a, b):
    return float(-np.sum(a * b))  # negated (distance/mod.rs:173-190)


def np_cosine(a, b):
    return max(0.0, 1.0 - float(np.sum(a * b)))  # clamped


@pytest.mark.parametrize(
    "dt,ref",
    [
        (DistanceType.L2, np_l2),
        (DistanceType.INNER_PRODUCT, np_ip),
        (DistanceType.COSINE, np_cosine),
    ],
)
def test_distance_matrix_matches_scalar(rng, dt, ref):
    q = rng.standard_normal((7, 33)).astype(np.float32)
    c = rng.standard_normal((13, 33)).astype(np.float32)
    if dt == DistanceType.COSINE:
        q = np.asarray(preprocess_cosine(q))
        c = np.asarray(preprocess_cosine(c))
    got = np.asarray(distance_matrix(q, c, dt))
    want = np.array([[ref(qi, cj) for cj in c] for qi in q])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "dt", [DistanceType.L2, DistanceType.INNER_PRODUCT, DistanceType.COSINE]
)
def test_pairwise_matches_matrix(rng, dt):
    a = rng.standard_normal((9, 17)).astype(np.float32)
    b = rng.standard_normal((9, 17)).astype(np.float32)
    if dt == DistanceType.COSINE:
        a = np.asarray(preprocess_cosine(a))
        b = np.asarray(preprocess_cosine(b))
    got = np.asarray(pairwise_distance(a, b, dt))
    want = np.diag(np.asarray(distance_matrix(a, b, dt)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_preprocess_cosine_normalizes(rng):
    v = rng.standard_normal((5, 64)).astype(np.float32) * 10.0
    out = np.asarray(preprocess_cosine(v))
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_preprocess_cosine_skips_zero_vector():
    v = np.zeros((1, 8), dtype=np.float32)
    out = np.asarray(preprocess_cosine(v))
    np.testing.assert_array_equal(out, v)


def test_preprocess_cosine_skips_already_unit(rng):
    v = rng.standard_normal((3, 16)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    out = np.asarray(preprocess_cosine(v))
    # Idempotent: already-unit rows untouched (distance/mod.rs:246-250).
    np.testing.assert_array_equal(out, v)


def test_preprocess_query_only_normalizes_cosine(rng):
    v = rng.standard_normal((2, 8)).astype(np.float32) * 3.0
    np.testing.assert_array_equal(
        np.asarray(preprocess_query(v, DistanceType.L2)), v
    )
    out = np.asarray(preprocess_query(v, DistanceType.COSINE))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_l2_nonnegative_on_duplicates(rng):
    a = rng.standard_normal((4, 12)).astype(np.float32)
    d = np.asarray(distance_matrix(a, a, DistanceType.L2))
    assert (d >= 0).all()
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-4)
