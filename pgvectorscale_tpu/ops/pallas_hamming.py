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
    from ..utils.sync import is_tpu_backend

    return hamming_matrix_pallas(
        query_codes, codes, interpret=not is_tpu_backend()
    )


# ---------------------------------------------------------------------------
# Gather-fused edge-code Hamming (the beam-step inner loop).
#
# The beam search's hot read is `edge_codes[sel]` — Q*E rows of R*W packed
# u32 words (~2 KB each) scattered across a [cap, R*W] HBM tensor — XORed
# against the per-query code and popcount-reduced per neighbor
# (graph/search.py beam_search body; reference analog: the per-neighbor
# quantized-distance loop in sbq/mod.rs:139-159).  XLA lowers the gather to
# one serial DMA per row, which measures at ~20 GB/s effective on v5e
# (results/kernels.jsonl edge-code-reads) — 40x under the HBM ceiling,
# latency-bound on 2 KB transfers.
#
# This kernel fuses the gather into the compute: each grid step issues
# TILE_GQ*E row DMAs back-to-back (hundreds in flight, hiding per-DMA
# latency), waits once, then does XOR+popcount on the VPU and reduces the
# W words of each neighbor code with ONE MXU matmul against a 0/1
# segment-sum matrix — so the reduction is free alongside the bandwidth-
# bound load.
# ---------------------------------------------------------------------------

TILE_GQ = 128  # queries per grid step


def _edge_gather_kernel(
    sel_ref,  # SMEM i32[nq_tiles * E * TILE_GQ] (scalar prefetch)
    qtile_ref,  # VMEM u32[TILE_GQ, RWp] query codes tiled to R neighbors
    seg_ref,  # VMEM f32[RWp, seg_out] 0/1 word->neighbor segment matrix
    ec_ref,  # ANY  u32[cap, 1, RW] edge-code cache rows (stays in HBM)
    out_ref,  # VMEM f32[TILE_GQ, E * seg_out]
    scratch_ref,  # VMEM u32[E * TILE_GQ, 1, RWp]
    sem_ref,  # DMA semaphores [E * TILE_GQ]
    *,
    tile_gq: int,
    e: int,
    rw: int,
    seg_out: int,
):
    # Rows carry a singleton middle dim: Mosaic requires slices of TILED
    # (sublane, lane) memref dims to be sublane-aligned, so a (1, RW)
    # slice of a 2D buffer is rejected — with the row as a LEADING dim
    # the per-row slice never cuts a tile.
    i = pl.program_id(0)
    base = i * (e * tile_gq)
    rows = e * tile_gq

    def copy(j):
        row = sel_ref[base + j]
        return pltpu.make_async_copy(
            ec_ref.at[pl.ds(row, 1)],
            scratch_ref.at[pl.ds(j, 1)],
            sem_ref.at[j],
        )

    # Issue every row DMA before waiting on any: the win over the XLA
    # gather is exactly this queue depth (row transfers overlap instead of
    # serializing on per-DMA latency).
    for j in range(rows):
        copy(j).start()
    for j in range(rows):
        copy(j).wait()

    q = qtile_ref[:]  # [TILE_GQ, RWp]
    seg = seg_ref[:]  # [RWp, seg_out]
    for ei in range(e):
        blk = scratch_ref[ei * tile_gq : (ei + 1) * tile_gq, 0, :]
        x = jnp.bitwise_xor(blk, q)
        # Mosaic has no u32->f32 cast; popcount results fit int32 exactly.
        pops = (
            lax.population_count(x).astype(jnp.int32).astype(jnp.float32)
        )
        # Segment-sum the W words of each neighbor code on the MXU: the
        # stale lanes beyond rw hit all-zero seg rows, so scratch reuse
        # across grid steps needs no zeroing.
        out_ref[:, ei * seg_out : (ei + 1) * seg_out] = jnp.dot(
            pops, seg, preferred_element_type=jnp.float32
        )


@functools.partial(
    jax.jit, static_argnames=("r_max", "interpret")
)
def hamming_edge_gather_pallas(
    edge_codes: jax.Array,  # u32[cap, R*W] flat edge-code cache
    sel: jax.Array,  # i32[Q, E] frontier node ids (callers clamp >= 0)
    query_codes: jax.Array,  # u32[Q, W]
    *,
    r_max: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused gather+XOR+popcount+reduce: f32[Q, E*R] neighbor distances.

    Matches the XLA cached-path semantics in graph/search.py (beam_search
    body): result[q, e*R + r] = popcount(edge_codes[sel[q, e], r*W:(r+1)*W]
    ^ query_codes[q])."""
    q, e = sel.shape
    w = query_codes.shape[1]
    rw = r_max * w
    seg_out = -(-r_max // 128) * 128
    rwp = -(-rw // 128) * 128
    # Mosaic DMA slices must be lane-aligned: rows are moved at the padded
    # width, with the tail zeroed by the segment matrix.  Hot-loop callers
    # (beam_search) pre-pad ONCE outside their while_loop; padding here
    # would otherwise re-copy the cache every call.
    assert edge_codes.shape[1] in (rw, rwp)
    if edge_codes.shape[1] != rwp:
        edge_codes = jnp.pad(edge_codes, ((0, 0), (0, rwp - rw)))
    # Scratch rows pad their singleton sublane dim to 8, so the scratch
    # block costs e*tile_gq*8*rwp*4 bytes.  Size tile_gq from a fixed VMEM
    # budget (not just e): the 4/8-bit SBQ tiers widen rwp up to 4x
    # (e.g. 128d 8-bit -> rwp=2176), and a tile sized for 2-bit rows blows
    # Mosaic's VMEM limit exactly in those configs (round-4 advisor
    # finding).  ~8 MB of the ~16 MB VMEM goes to scratch; qtile/seg/out
    # blocks take ~2 MB more at these shapes.
    budget = 8 << 20
    tile_gq = min(TILE_GQ, max(8, (budget // (e * 8 * rwp * 4)) // 8 * 8))

    q_pad = -q % tile_gq
    qp = q + q_pad
    nq_tiles = qp // tile_gq

    # sel rearranged to DMA order: step i, slot j = ei*tile_gq + t reads
    # the row for query (i*tile_gq + t), frontier ei.
    sel_p = jnp.pad(sel, ((0, q_pad), (0, 0)))
    sel_pre = (
        sel_p.reshape(nq_tiles, tile_gq, e)
        .transpose(0, 2, 1)
        .reshape(nq_tiles * e * tile_gq)
    )

    qtile = jnp.pad(
        jnp.tile(query_codes, (1, r_max)), ((0, q_pad), (0, rwp - rw))
    )

    # 0/1 segment matrix: word r*W + w contributes to neighbor r.
    word_idx = jnp.arange(rwp) // w
    seg = (
        (word_idx[:, None] == jnp.arange(seg_out)[None, :])
        & (jnp.arange(rwp)[:, None] < rw)
    ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _edge_gather_kernel,
            tile_gq=tile_gq,
            e=e,
            rw=rw,
            seg_out=seg_out,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nq_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (tile_gq, rwp), lambda i, sel: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (rwp, seg_out), lambda i, sel: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (tile_gq, e * seg_out), lambda i, sel: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((e * tile_gq, 1, rwp), jnp.uint32),
                pltpu.SemaphoreType.DMA((e * tile_gq,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((qp, e * seg_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * e * rwp * seg_out,
            bytes_accessed=(qp * e * rw + qp * rwp + qp * e * seg_out) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sel_pre, qtile, seg, edge_codes[:, None, :])

    return out.reshape(qp, e, seg_out)[:q, :, :r_max].reshape(
        q, e * r_max
    )
