"""TPU-only Mosaic lowering tests for the fused gather kernel.

CI runs on CPU where the Pallas kernels execute in interpret mode — a
Mosaic-specific divergence (alignment, DMA ordering, VMEM sizing) on the
compiled path would ship unnoticed behind PGVS_TPU_FUSED_GATHER=1
(round-4 advisor finding).  These tests compare the COMPILED kernel
against the XLA cached-path semantics on production shapes; they skip
anywhere but a real TPU backend.

Run manually on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site \\
    PGVS_TPU_RUN_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -v
(conftest pins JAX to CPU for the main suite; the env knob opts out.)
"""

import os

import numpy as np
import pytest

if os.environ.get("PGVS_TPU_RUN_TPU_TESTS") != "1":
    pytest.skip(
        "TPU-only Mosaic tests (set PGVS_TPU_RUN_TPU_TESTS=1 on a chip)",
        allow_module_level=True,
    )

import jax
import jax.numpy as jnp

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("requires a TPU backend", allow_module_level=True)

from pgvectorscale_tpu.ops.pallas_hamming import hamming_edge_gather_pallas


def _xla_reference(edge_codes, sel, query_codes, r_max):
    """The XLA cached-path semantics from graph/search.py beam_search."""
    q, e = sel.shape
    w = query_codes.shape[1]
    ec = edge_codes[jnp.maximum(sel, 0)][..., : r_max * w]
    qtile = jnp.tile(query_codes, (1, r_max))
    x = jnp.bitwise_xor(ec, qtile[:, None, :])
    pops = jax.lax.population_count(x).astype(jnp.int32)
    return (
        jnp.sum(pops.reshape(q, e, r_max, w), axis=-1)
        .reshape(q, e * r_max)
        .astype(jnp.float32)
    )


@pytest.mark.parametrize(
    "w,r_max,q,e",
    [
        (8, 65, 256, 1),   # 2-bit 128d production shape
        (8, 65, 256, 2),
        (16, 65, 128, 2),  # 4-bit tier
        (32, 65, 128, 2),  # 8-bit tier (wide rows: VMEM tile scaling)
        (24, 65, 128, 2),  # 1-bit 768d
    ],
)
def test_fused_gather_matches_xla_on_mosaic(w, r_max, q, e):
    rng = np.random.default_rng(7)
    cap = 4096
    rw = r_max * w
    rwp = -(-rw // 128) * 128
    edge = rng.integers(0, 2**32, (cap, rw), dtype=np.uint64).astype(
        np.uint32
    )
    # Pre-padded, as _build_edge_codes(pad_to_lanes=True) produces.
    edge_p = np.zeros((cap, rwp), np.uint32)
    edge_p[:, :rw] = edge
    sel = rng.integers(0, cap, (q, e), dtype=np.int32)
    qc = rng.integers(0, 2**32, (q, w), dtype=np.uint64).astype(np.uint32)

    got = np.asarray(
        hamming_edge_gather_pallas(
            jnp.asarray(edge_p), jnp.asarray(sel), jnp.asarray(qc),
            r_max=r_max,
        )
    )
    want = np.asarray(
        _xla_reference(jnp.asarray(edge_p), jnp.asarray(sel),
                       jnp.asarray(qc), r_max)
    )
    np.testing.assert_array_equal(got, want)
