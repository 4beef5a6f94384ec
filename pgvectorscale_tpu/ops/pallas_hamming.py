"""Pallas TPU kernel: tiled XOR+popcount Hamming distance matrix.

The TPU analog of the reference's monomorphized u64 XOR-popcount loops
(reference: pgvectorscale/src/access_method/distance/mod.rs:266-323,
``distance_xor_optimized``).  Computes ``[Q, W] x [N, W] -> [Q, N]`` int32
Hamming distances over packed uint32 codes, tiled (TQ × TN) through VMEM so
the VPU stays fed from on-chip memory instead of streaming HBM per pair.

Status: measured on TPU v5e at [2048, 48] x [100k, 48], the XLA
formulation in ``ops/hamming.py`` is ~2x faster (41 ms vs 86 ms — XLA
fuses xor+popcount+reduce into one pass over the output tiles, while this
kernel's per-word broadcast loop underutilizes the VPU).  The XLA path is
therefore the production path everywhere; this kernel is kept as the
verified custom-kernel baseline for future tuning (an MXU popcount-dot
variant is the promising next step).

Falls back to interpreter mode off-TPU so the same code path is tested on
the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 128
TILE_N = 128


def _hamming_tile_kernel(q_ref, c_ref, out_ref):
    """One (TQ, TN) output tile: accumulate popcount(xor) over code words.

    The word loop is unrolled in Python (W is static and small); a
    lax.fori_loop with dynamic 1-wide slices fails Mosaic compilation on
    some TPU toolchains."""
    w = q_ref.shape[1]
    acc = jnp.zeros((q_ref.shape[0], c_ref.shape[0]), jnp.int32)
    for i in range(w):
        qw = q_ref[:, i : i + 1]  # [TQ, 1] uint32
        cw = c_ref[:, i : i + 1]  # [TN, 1] uint32
        x = jnp.bitwise_xor(qw, jnp.transpose(cw))  # [TQ, TN]
        acc = acc + lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(
    query_codes: jax.Array,  # u32[Q, W]
    codes: jax.Array,  # u32[N, W]
    *,
    interpret: bool = False,
) -> jax.Array:
    """[Q, W] x [N, W] -> [Q, N] int32 Hamming distances (Pallas kernel)."""
    q, w = query_codes.shape
    n, _ = codes.shape
    q_pad = -q % TILE_Q
    n_pad = -n % TILE_N
    qp = jnp.pad(query_codes, ((0, q_pad), (0, 0)))
    cp = jnp.pad(codes, ((0, n_pad), (0, 0)))
    qt, nt = qp.shape[0] // TILE_Q, cp.shape[0] // TILE_N

    out = pl.pallas_call(
        _hamming_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], cp.shape[0]), jnp.int32),
        grid=(qt, nt),
        in_specs=[
            pl.BlockSpec(
                (TILE_Q, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_N, w), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_Q, TILE_N), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * qp.shape[0] * cp.shape[0] * w,
            bytes_accessed=(qp.size + cp.size + qp.shape[0] * cp.shape[0])
            * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, cp)
    return out[:q, :n]


def hamming_matrix(query_codes: jax.Array, codes: jax.Array) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, interpreter elsewhere (tests)."""
    on_tpu = jax.default_backend() == "tpu"
    return hamming_matrix_pallas(query_codes, codes, interpret=not on_tpu)
