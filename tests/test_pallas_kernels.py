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


@pytest.mark.parametrize(
    "q,e,r,w", [(8, 1, 3, 1), (100, 2, 65, 8), (130, 4, 17, 8)]
)
def test_pallas_edge_gather_matches_xla(rng, q, e, r, w):
    """The gather-fused kernel agrees with the beam-search cached path
    (graph/search.py: edge_codes gather + tiled-query XOR + popcount sum)."""
    from pgvectorscale_tpu.ops.pallas_hamming import (
        hamming_edge_gather_pallas,
    )

    cap = 500
    edge_codes = jnp.asarray(
        rng.integers(0, 2**32, size=(cap, r * w), dtype=np.uint32)
    )
    sel = jnp.asarray(rng.integers(0, cap, size=(q, e), dtype=np.int32))
    qc = jnp.asarray(rng.integers(0, 2**32, size=(q, w), dtype=np.uint32))

    # XLA reference formulation (the production cached path).
    import jax.lax as lax

    ec = edge_codes[sel]  # [Q, E, R*W]
    qtile = jnp.tile(qc, (1, r))
    x = jnp.bitwise_xor(ec, qtile[:, None, :])

    expected = np.asarray(
        jnp.sum(
            lax.population_count(x).astype(jnp.int32).reshape(q, e, r, w),
            axis=-1,
        ).reshape(q, e * r)
    ).astype(np.float32)

    got = np.asarray(
        hamming_edge_gather_pallas(
            edge_codes, sel, qc, r_max=r, interpret=True
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_fused_gather_gate_counts_axon_as_tpu(monkeypatch):
    """The tunneled TPU's backend NAME is "axon", not "tpu" — the gate must
    enable there (a == "tpu" check silently no-oped the round-4 opt-in on
    the real chip)."""
    from pgvectorscale_tpu.index import _fused_gather_enabled

    monkeypatch.setenv("PGVS_TPU_FUSED_GATHER", "1")
    for backend, expect in (("axon", True), ("tpu", True), ("cpu", False)):
        monkeypatch.setattr("jax.default_backend", lambda b=backend: b)
        assert _fused_gather_enabled() is expect, backend
    monkeypatch.setattr("jax.default_backend", lambda: "axon")
    monkeypatch.setenv("PGVS_TPU_FUSED_GATHER", "0")
    assert _fused_gather_enabled() is False
    monkeypatch.delenv("PGVS_TPU_FUSED_GATHER")
    assert _fused_gather_enabled() is False  # default stays XLA
