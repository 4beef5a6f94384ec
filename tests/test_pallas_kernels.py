"""Pallas kernel equivalence tests (interpreter mode on the CPU mesh).

Mirrors the reference's SIMD-vs-scalar equivalence tests
(reference: pgvectorscale/src/access_method/distance/distance_x86.rs:38-64)
— the optimized kernel must agree exactly with the portable formulation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pgvectorscale_tpu.ops.hamming import hamming_distance_matrix
from pgvectorscale_tpu.ops.pallas_hamming import hamming_matrix_pallas


@pytest.mark.parametrize("q,n,w", [(8, 16, 1), (100, 130, 8), (128, 256, 48)])
def test_pallas_hamming_matches_xla(rng, q, n, w):
    qc = jnp.asarray(
        rng.integers(0, 2**32, size=(q, w), dtype=np.uint32)
    )
    cc = jnp.asarray(
        rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    )
    expected = np.asarray(hamming_distance_matrix(qc, cc))
    got = np.asarray(hamming_matrix_pallas(qc, cc, interpret=True))
    np.testing.assert_array_equal(got, expected)
