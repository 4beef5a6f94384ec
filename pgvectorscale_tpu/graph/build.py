"""Wave-based Vamana graph construction.

TPU-native replacement for the reference's per-tuple incremental build
(reference: pgvectorscale/src/access_method/build.rs — heap-scan callbacks
calling ``graph.insert`` per tuple, graph/mod.rs:637-717).

The reference inserts one vector at a time: greedy-search the current
graph, α-prune the visited set into a neighbor list, then update backlinks
(each backlink may itself trigger a prune).  On TPU that per-row loop would
leave the MXU idle, so the build is re-architected into *waves*:

1. A wave of B new nodes batch-searches the current graph
   (``beam_search``), yielding each node's visited candidate set — the
   exact analog of ``greedy_search_for_build`` (graph/mod.rs:285-327).
2. One batched ``robust_prune`` turns candidate sets into neighbor lists
   (graph/mod.rs:392-488 semantics, vectorized).
3. Backlinks are applied with a scatter: every edge (new -> nbr) appends
   the reverse edge to ``nbr``'s adjacency row; rows that overflow the
   build-time slack capacity R×1.3 (meta_page.rs:253-255) are re-pruned in
   batches, exactly mirroring ``add_neighbors``'s prune-on-overflow
   (graph/mod.rs:212-266).
4. Wave sizes grow geometrically, so early nodes see a dense enough graph
   for search to be meaningful (the same role as the reference's elected
   worker seeding the first nodes in parallel builds, build.rs:644-676).

``finalize`` trims every adjacency row that exceeds num_neighbors back to
num_neighbors with one last prune pass — the analog of
``finalize_index_build`` (build.rs:905-960).
"""

from __future__ import annotations

import functools
import logging
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import DistanceType, IndexConfig
from ..store import INVALID_ID, GraphArrays, dequant_rows
from .prune import (
    pairwise_distance_matrix_full,
    pairwise_hamming_mxu,
    robust_prune,
    unpack_code_bits,
)
from .search import beam_search, get_start_ids

logger = logging.getLogger("pgvectorscale_tpu")


def _edge_codes_scan(codes: jax.Array, adjacency: jax.Array) -> jax.Array:
    """Neighbor-code cache u32[cap, R*W] built by a lax.scan over row
    chunks (traced inside the wave jit).

    The obvious ``codes[adjacency].reshape(cap, -1)`` materializes a
    [cap, R, W] intermediate whose minor dim W lane-pads to 128 (16x at
    W=8).  Scanning fixed-size chunks bounds that transient to
    ~chunk*R*128*4 bytes while the flat output pads only ~R*W -> multiple
    of 128 ((~23% at R=65, W=8)."""
    cap, r = adjacency.shape
    w = codes.shape[1]
    w_padded = -(-w // 128) * 128
    # ~512 MB padded transient per chunk.
    chunk = min(cap, max(1, (512 << 20) // (r * w_padded * 4)))
    n_iters = -(-cap // chunk)
    out = jnp.zeros((cap, r * w), codes.dtype)
    # Clamped starts: the tail chunk re-covers (identically) the last rows.
    starts = jnp.minimum(
        jnp.arange(n_iters, dtype=jnp.int32) * chunk, cap - chunk
    )

    def body(acc, i0):
        rows = lax.dynamic_slice(adjacency, (i0, 0), (chunk, r))
        vals = codes[jnp.maximum(rows, 0)].reshape(chunk, r * w)
        return lax.dynamic_update_slice(acc, vals, (i0, 0)), None

    out, _ = lax.scan(body, out, starts)
    return out

@jax.jit
def _edge_codes_onepass(codes: jax.Array, adjacency: jax.Array) -> jax.Array:
    cap = adjacency.shape[0]
    return codes[jnp.maximum(adjacency, 0)].reshape(cap, -1)


_edge_codes_scan_jit = jax.jit(_edge_codes_scan)


def build_wave_cache(arrays: GraphArrays) -> Optional[jax.Array]:
    """Snapshot neighbor-code cache u32[cap, R*W] for build traversal.

    The wave step used to rebuild this cache inside EVERY dispatch — at 1M
    rows that is ~2.6 GB of HBM writes per 4096-row wave, ~30% of build
    time.  Wave drivers now build it here every few waves and pass it (with
    the matching adjacency snapshot) into the wave step; traversal runs
    against the consistent snapshot while writes land in the live
    adjacency — the same search-a-snapshot semantics the lockstep sharded
    build already uses.  Gating mirrors the in-jit path: padded-HBM bytes
    decide one-pass gather vs scan-chunked vs no cache."""
    cap, r = arrays.adjacency.shape
    w = arrays.codes.shape[1]
    if w == 0:
        return None
    w_padded = -(-w // 128) * 128
    if cap * r * w_padded * 4 <= BUILD_CACHE_ONEPASS_MAX_BYTES:
        return _edge_codes_onepass(arrays.codes, arrays.adjacency)
    if cap * (-(-(r * w) // 128) * 128) * 4 <= BUILD_CACHE_FLAT_MAX_BYTES:
        return _edge_codes_scan_jit(arrays.codes, arrays.adjacency)
    return None


# Refresh cadence for the snapshot cache: J waves of staleness means the
# last J*wave rows are invisible as traversal HOPS (they still receive
# backlinks, and exact-prune re-scores all candidates full-precision), in
# exchange for 1/J of the cache-rebuild traffic.
BUILD_CACHE_REFRESH_WAVES = 4

# How many overflowing rows one re-prune batch handles (finalize path).
PRUNE_BATCH = 8192
# Build-time neighbor-code cache gates (see _wave_step_jit): a cache whose
# one-shot-gather PADDED intermediate fits uses the fused gather; larger
# caches whose flat form fits use the scan-chunked builder; else no cache.
BUILD_CACHE_ONEPASS_MAX_BYTES = 6 << 30
BUILD_CACHE_FLAT_MAX_BYTES = 4 << 30
# Max distinct overflowing rows handled per wave, in-device (fixed shape).
# Edges rejected beyond this budget are dropped for the wave; the final
# prune + orphan repair make up the difference.
MAX_OVERFLOW_ROWS = 4096
# Multi-frontier width for build-time searches (see beam_search
# expand_factor): same candidate quality, ~4x fewer sequential steps.
BUILD_EXPAND_FACTOR = 4
# While the graph has at most this many nodes, candidate sets come from an
# exact brute-force distance matrix instead of beam search: one MXU/VPU
# batch is cheaper than a traversal at this size and gives ideal Vamana
# candidates for the early waves (whose quality seeds the whole graph).
BRUTE_CANDIDATE_THRESHOLD = 4096
# Cap on reverse edges considered per overflowing row per round (the analog
# of the reference processing one backlink at a time — extra incoming edges
# simply wait for the next round's append).
INCOMING_CAP = 64
# Prune's pairwise-Hamming unpacks codes to 0/1 bits for the MXU
# popcount-dot; above this many bits the unpack is chunked to bound the
# transient [B, C, bits] footprint (16k-dim indexes have 16k-32k bits).
_PAIRWISE_CHUNK_BITS = 4096


def candidate_pair_distances(
    arrays: GraphArrays,
    cand_ids: jax.Array,  # i32[B, C]
    *,
    use_codes: bool,
    code_bits: int,
    distance_type: DistanceType,
    trunc_dims: int,
) -> jax.Array:
    """Pairwise distances among each row's candidates, [B, C, C] f32.

    For SBQ this is Hamming computed on the MXU via the popcount-dot
    identity (prune uses the storage's node-to-node measure — Hamming for
    SbqSpeedupStorage, sbq/mod.rs:161-190).  Plain storage uses the indexed
    prefix (``trunc_dims``) — the reference's plain node stores only the
    index slice (build.rs:548)."""
    safe = jnp.maximum(cand_ids, 0)
    if use_codes:
        codes = arrays.codes[safe]  # [B, C, W]
        if code_bits <= _PAIRWISE_CHUNK_BITS:
            return pairwise_hamming_mxu(unpack_code_bits(codes, code_bits))
        # Wide codes (high-dim indexes, up to 16000 dims -> 500 words):
        # unpacking all bits at once would materialize a [B, C, bits] f32
        # tensor (e.g. 8.5 GB at B=1024, C=130, 16k bits).  Chunk the
        # popcount-dot accumulation over word blocks so the peak unpacked
        # footprint stays [B, C, chunk].  Static Python loop — W is a
        # trace-time constant.
        w = codes.shape[-1]
        wpc = _PAIRWISE_CHUNK_BITS // 32
        dots = jnp.zeros(safe.shape + (safe.shape[-1],), jnp.float32)
        pops = jnp.zeros(safe.shape, jnp.float32)
        for w0 in range(0, w, wpc):
            nb = min(code_bits - w0 * 32, wpc * 32)
            cb = unpack_code_bits(codes[..., w0 : w0 + wpc], nb)
            dots = dots + jnp.einsum(
                "bcd,bed->bce", cb, cb, preferred_element_type=jnp.float32
            )
            pops = pops + jnp.sum(cb, axis=-1)
        return pops[:, :, None] + pops[:, None, :] - 2.0 * dots
    vecs = dequant_rows(arrays.vectors, arrays.vec_scales, safe)[
        ..., :trunc_dims
    ]
    return pairwise_distance_matrix_full(vecs, distance_type)


@functools.partial(
    jax.jit,
    static_argnames=("use_codes", "code_bits", "distance_type", "alphas",
                     "num_neighbors", "labeled", "trunc_dims"),
)
def prune_candidate_sets(
    arrays: GraphArrays,
    node_ids: jax.Array,  # i32[B]
    cand_ids: jax.Array,  # i32[B, C]
    cand_dists: jax.Array,  # f32[B, C]
    node_labels: jax.Array,  # i32[B, Lm]
    *,
    use_codes: bool,
    code_bits: int,
    distance_type: DistanceType,
    alphas: tuple,
    num_neighbors: int,
    labeled: bool,
    trunc_dims: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched add_neighbors-style prune: candidates -> neighbor lists."""
    pair = candidate_pair_distances(
        arrays,
        cand_ids,
        use_codes=use_codes,
        code_bits=code_bits,
        distance_type=distance_type,
        trunc_dims=trunc_dims,
    )
    if labeled:
        cand_labels = arrays.node_labels[jnp.maximum(cand_ids, 0)]
    else:
        b, c = cand_ids.shape
        cand_labels = jnp.zeros((b, c, 0), dtype=jnp.int32)
    return robust_prune(
        node_ids,
        cand_ids,
        cand_dists,
        pair,
        cand_labels,
        node_labels,
        num_neighbors=num_neighbors,
        alphas=alphas,
        labeled=labeled,
    )


@jax.jit
def append_backlinks(
    adjacency: jax.Array,  # i32[cap, R_max]
    edge_dst: jax.Array,  # i32[E] node receiving a reverse edge
    edge_src: jax.Array,  # i32[E] new node (INVALID_ID = no edge)
) -> tuple[jax.Array, jax.Array]:
    """Append reverse edges into free adjacency slots.

    Returns (adjacency, accepted bool[E]).  Edges whose destination row is
    full are rejected and must be handled by a prune round (the analog of
    add_neighbors pruning when the list exceeds max_neighbors,
    graph/mod.rs:212-266).

    Implementation: sort edges by the composite (dst, src) key, compute
    each edge's rank within its dst run, write at position degree[dst] +
    rank when it fits.  The (dst, src) composite makes intra-batch
    duplicate pairs ADJACENT, so the dedup is an O(E) neighbor-equality
    check instead of the O(E^2) broadcast compare it replaced (4.2e10
    predicate evaluations per wave at B=4096, R=50).
    """
    cap, r_max = adjacency.shape
    e = edge_dst.shape[0]

    valid = (edge_src != INVALID_ID) & (edge_dst != INVALID_ID)
    # Drop self loops defensively.
    valid = valid & (edge_src != edge_dst)
    dst = jnp.where(valid, edge_dst, jnp.int32(2**31 - 1))

    # Two-key lexicographic sort by (dst, src).  (A packed 64-bit key
    # would need jax_enable_x64; num_keys=2 avoids the dtype trap.)
    idx = jnp.arange(e, dtype=jnp.int32)
    s_dst, s_src, s_valid, order = lax.sort(
        (dst, edge_src, valid, idx), num_keys=2
    )
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), s_dst[1:] != s_dst[:-1]]
    )
    start_idx = jnp.where(is_start, idx, 0)
    start_idx = lax.associative_scan(jnp.maximum, start_idx)
    rank = idx - start_idx

    # Dedup: reverse edge already present in dst's adjacency row.
    safe_dst = jnp.clip(s_dst, 0, cap - 1)
    rows = adjacency[safe_dst]  # [E, R_max]
    already = jnp.any(rows == s_src[:, None], axis=1)
    s_valid = s_valid & ~already

    # Dedup identical (dst, src) pairs within this batch: the composite
    # sort put them adjacent, keep the first of each run.
    dup = (
        jnp.concatenate(
            [
                jnp.zeros((1,), jnp.bool_),
                (s_dst[1:] == s_dst[:-1]) & (s_src[1:] == s_src[:-1]),
            ]
        )
        & s_valid
    )
    s_valid = s_valid & ~dup

    # Re-rank counting only valid edges.
    grp = jnp.where(s_valid, 1, 0)
    # prefix count of valid edges within the run
    run_prefix = jnp.cumsum(grp) - grp
    run_base = jnp.where(is_start, run_prefix, 0)
    run_base = lax.associative_scan(jnp.maximum, run_base)
    rank = run_prefix - run_base

    degree = jnp.sum(rows != INVALID_ID, axis=1)
    pos = degree + rank
    fits = s_valid & (pos < r_max)

    flat = adjacency.reshape(-1)
    write_idx = jnp.where(
        fits, safe_dst * r_max + jnp.clip(pos, 0, r_max - 1), 0
    )
    updates = jnp.where(fits, s_src, flat[write_idx])
    flat = flat.at[write_idx].set(updates, mode="drop")
    new_adj = flat.reshape(cap, r_max)

    accepted = jnp.zeros((e,), jnp.bool_).at[order].set(fits | already | dup)
    # `already`/`dup` count as handled (nothing left to do for them).
    return new_adj, accepted


class BuildContext:
    """Host-side orchestration state for a build (the analog of BuildState,
    build.rs:59-90)."""

    def __init__(self, config: IndexConfig):
        self.config = config
        self.alphas = _alpha_schedule(config.max_alpha)
        # Optional WriteStats sink (stats.rs:242-265 analog); attached by
        # DiskannIndex.build so wave/prune dispatches are counted.
        self.stats = None

    @property
    def r(self) -> int:
        return self.config.num_neighbors

    @property
    def r_max(self) -> int:
        return self.config.max_neighbors_during_build


def _alpha_schedule(max_alpha: float):
    from .prune import alpha_schedule

    return alpha_schedule(max_alpha)


def insert_wave(
    arrays: GraphArrays,
    ctx: BuildContext,
    node_ids_np: np.ndarray,  # ids of the wave's nodes (already stored)
    *,
    search_list_size: Optional[int] = None,
    n_existing: Optional[int] = None,
    prefix_rows: Optional[int] = None,
    include_existing: bool = False,
    snap_adjacency: Optional[jax.Array] = None,
    snap_edge_codes: Optional[jax.Array] = None,
    donate: bool = False,
) -> GraphArrays:
    """Insert a wave of already-stored nodes into the graph — ONE fused
    device step (search/brute candidates + prune + adjacency write +
    backlinks + in-device overflow prune).

    ``donate=True`` donates ``arrays`` into the device step (the caller
    must drop every reference to it, including any snapshot aliasing its
    adjacency) — see _wave_step_donated_jit.

    Mirrors graph.insert semantics (graph/mod.rs:637-717): for labeled
    vectors a filtered pass from label start nodes plus an unfiltered pass
    from the default start node; candidates from both merge before the
    prune.

    ``n_existing``: number of rows already in the graph (ids < n_existing
    are searchable).  When the graph is small (<= BRUTE_CANDIDATE_THRESHOLD)
    candidates come from an exact brute-force scan instead of beam search.

    ``prefix_rows``: explicit candidate-row prefix for waves whose ids are
    NOT a contiguous suffix (tombstone-reuse inserts): the wave's rows
    already lie inside [0, prefix_rows), so no +wave slack is added.
    Mutually exclusive with ``n_existing``.

    ``include_existing``: merge each node's current neighbors into the
    candidate set — used by refinement passes, where every node re-inserts
    against the finished graph and must not lose good existing edges.

    ``snap_adjacency`` / ``snap_edge_codes``: a consistent (adjacency,
    neighbor-code cache) snapshot from ``build_wave_cache`` — traversal
    runs against the snapshot (skipping the per-dispatch cache rebuild)
    while prune/backlink writes land in the live adjacency.  Both must
    come from the same arrays version.
    """
    config = ctx.config
    b = len(node_ids_np)
    n_real = int((np.asarray(node_ids_np) >= 0).sum())
    l = search_list_size or config.search_list_size
    if prefix_rows is not None:
        assert n_existing is None
        brute = prefix_rows <= BRUTE_CANDIDATE_THRESHOLD
        prefix = int(prefix_rows)
    else:
        brute = (
            n_existing is not None
            and n_existing <= BRUTE_CANDIDATE_THRESHOLD
        )
        prefix = (0 if n_existing is None else int(n_existing)) + n_real
    if ctx.stats is not None:
        ctx.stats.num_waves += 1
    step = _wave_step_donated_jit if donate else _wave_step_jit
    return step(
        arrays,
        jnp.asarray(node_ids_np, dtype=jnp.int32),
        jnp.asarray(prefix, dtype=jnp.int32),
        snap_adjacency=(
            None
            if brute
            or snap_edge_codes is None
            or not config.build_traversal_uses_codes
            else snap_adjacency
        ),
        snap_edge_codes=(
            None
            if brute
            or snap_adjacency is None
            or not config.build_traversal_uses_codes
            else snap_edge_codes
        ),
        search_list_size=l,
        max_iters=_build_max_iters(l),
        brute=brute,
        slice_rows=min(BRUTE_CANDIDATE_THRESHOLD + b, arrays.capacity),
        use_codes=config.build_traversal_uses_codes,
        prune_use_codes=config.build_prune_uses_codes,
        code_bits=config.dims_to_index * config.bits_per_dimension,
        distance_type=config.distance_type,
        alphas=ctx.alphas,
        num_neighbors=config.num_neighbors,
        labeled=config.has_labels,
        include_existing=include_existing,
        trunc_dims=config.dims_to_index,
    )


_WAVE_STEP_STATICS = (
    "search_list_size",
    "max_iters",
    "brute",
    "slice_rows",
    "use_codes",
    "prune_use_codes",
    "code_bits",
    "distance_type",
    "alphas",
    "num_neighbors",
    "labeled",
    "include_existing",
    "trunc_dims",
)


def _wave_step(
    arrays: GraphArrays,
    node_ids: jax.Array,  # i32[B], INVALID_ID padded
    prefix: jax.Array,  # i32 scalar — rows < prefix may be candidates
    snap_adjacency: Optional[jax.Array] = None,  # i32[cap, R] snapshot
    snap_edge_codes: Optional[jax.Array] = None,  # u32[cap, R*W] snapshot
    *,
    search_list_size: int,
    max_iters: int,
    brute: bool,
    slice_rows: int,
    use_codes: bool,
    prune_use_codes: Optional[bool] = None,
    code_bits: int,
    distance_type: DistanceType,
    alphas: tuple,
    num_neighbors: int,
    labeled: bool,
    include_existing: bool = False,
    trunc_dims: int = 0,
) -> GraphArrays:
    """The fused wave step.  One dispatch per wave keeps the build off the
    host (the per-op eager path pays tunnel latency per call).

    ``use_codes`` drives candidate GENERATION (traversal measure);
    ``prune_use_codes`` drives candidate ordering + alpha-occlusion (see
    IndexConfig.build_distance — the exact-prune default regenerates
    candidate distances full-precision before the prune)."""
    if prune_use_codes is None:
        prune_use_codes = use_codes
    b = node_ids.shape[0]
    l = search_list_size
    safe_ids = jnp.maximum(node_ids, 0)
    node_labels = arrays.node_labels[safe_ids]
    # Build-time traversal uses the indexed prefix only (plain+truncated:
    # the reference's plain node stores the index slice, build.rs:548).
    if trunc_dims <= 0:
        trunc_dims = arrays.vectors.shape[-1]
    query_vecs = dequant_rows(arrays.vectors, arrays.vec_scales, safe_ids)[
        :, :trunc_dims
    ].astype(jnp.float32)
    query_codes = arrays.codes[safe_ids]

    if brute:
        # Exact candidates in one batch.  Unlike beam search, brute scoring
        # needs no graph connectivity, so the wave's own rows are included
        # (intra-wave edges form directly; prefix-restricted candidates
        # would never create them).  +1 slack: each node scores itself and
        # robust_prune drops self.
        cand_ids, cand_dists = _brute_candidates(
            arrays,
            node_ids,
            prefix,
            slice_rows=slice_rows,
            num_candidates=min(l + 1, slice_rows),
            use_codes=prune_use_codes,  # exact-prune: exact seed candidates
            distance_type=distance_type,
            trunc_dims=trunc_dims,
        )
    else:
        # Unfiltered pass from the default start node.  Build-time beam
        # searches get a per-wave neighbor-code cache (one contiguous
        # materialization of codes[adjacency]) for the same reason the
        # query path has one: scattered 32-byte code gathers were ~60% of
        # traversal time on TPU.  Size-gated statically by shapes.
        # Tighter gate than the query path: wave buffers (the [B, C, C]
        # prune tensors) coexist with the cache during builds.
        # The one-shot gather's [cap, R, W] intermediate is lane-padded
        # W -> 128 (T(8,128) tiling) — 16x at W=8, which planned 33 GB on
        # a 1M x 128d build and OOMed the 16 GB chip.  Small caches use
        # the fused single gather; big ones fall back to a scan-chunked
        # construction whose transient is bounded, gated on the FLAT
        # (lane-padded) cache size.
        gather_onepass_max = BUILD_CACHE_ONEPASS_MAX_BYTES
        flat_cache_max = BUILD_CACHE_FLAT_MAX_BYTES
        cap, r = arrays.adjacency.shape
        w = arrays.codes.shape[1]
        w_padded = -(-w // 128) * 128
        onepass_bytes = cap * r * w_padded * 4
        flat_bytes = cap * (-(-(r * w) // 128) * 128) * 4
        search_arrays = arrays
        if snap_edge_codes is not None:
            # Driver-provided consistent snapshot (build_wave_cache):
            # traverse it instead of rebuilding the cache per dispatch.
            edge_codes = snap_edge_codes
            search_arrays = arrays._replace(adjacency=snap_adjacency)
        elif use_codes and onepass_bytes <= gather_onepass_max:
            edge_codes = arrays.codes[
                jnp.maximum(arrays.adjacency, 0)
            ].reshape(cap, -1)
        elif use_codes and flat_bytes <= flat_cache_max:
            edge_codes = _edge_codes_scan(arrays.codes, arrays.adjacency)
        else:
            edge_codes = None
        start_ids = jnp.broadcast_to(
            arrays.default_start[None, None], (b, 1)
        ).astype(jnp.int32)
        res = beam_search(
            search_arrays,
            query_vecs,
            query_codes,
            jnp.zeros((b, 0), jnp.int32),
            start_ids,
            search_list_size=l,
            max_iters=max_iters,
            distance_type=distance_type,
            use_codes=use_codes,
            filtered=False,
            expand_factor=min(BUILD_EXPAND_FACTOR, l),
            edge_codes=edge_codes,
        )
        # Visit-history candidates can (rarely) contain a revisited node:
        # a start node evicted from the beam may re-enter when its
        # re-computed distance differs in the last ulp from the init-kernel
        # value.  robust_prune must not see duplicate ids, so dedup always.
        cand_ids, cand_dists = _dedup_candidates(
            res.hist_ids, res.hist_dists
        )

        if labeled:
            # Filtered pass from label start nodes (two-phase insert,
            # graph/mod.rs:652-660).
            label_starts = get_start_ids(arrays, node_labels, b)
            res_f = beam_search(
                search_arrays,
                query_vecs,
                query_codes,
                node_labels,
                label_starts,
                search_list_size=l,
                max_iters=max_iters,
                distance_type=distance_type,
                use_codes=use_codes,
                filtered=True,
                expand_factor=min(BUILD_EXPAND_FACTOR, l),
                edge_codes=edge_codes,
            )
            cand_ids = jnp.concatenate([cand_ids, res_f.hist_ids], axis=1)
            cand_dists = jnp.concatenate(
                [cand_dists, res_f.hist_dists], axis=1
            )
            cand_ids, cand_dists = _dedup_candidates(cand_ids, cand_dists)

    if include_existing:
        # Refinement: keep current neighbors in contention so a re-insert
        # never loses good edges.
        existing = arrays.adjacency[safe_ids]
        if prune_use_codes:
            from ..ops.hamming import hamming_gather

            ex_d = hamming_gather(
                query_codes, arrays.codes, existing
            ).astype(jnp.float32)
        else:
            gathered = dequant_rows(
                arrays.vectors, arrays.vec_scales, jnp.maximum(existing, 0)
            )[..., :trunc_dims].astype(jnp.float32)
            if distance_type == DistanceType.L2:
                diff = gathered - query_vecs[:, None, :]
                ex_d = jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
            else:
                dots = jnp.einsum(
                    "brd,bd->br", gathered, query_vecs,
                    preferred_element_type=jnp.float32,
                )
                ex_d = (
                    -dots
                    if distance_type == DistanceType.INNER_PRODUCT
                    else jnp.maximum(1.0 - dots, 0.0)
                )
        ex_d = jnp.where(existing == INVALID_ID, jnp.inf, ex_d)
        cand_ids = jnp.concatenate([cand_ids, existing], axis=1)
        cand_dists = jnp.concatenate([cand_dists, ex_d], axis=1)
        cand_ids, cand_dists = _dedup_candidates(cand_ids, cand_dists)

    if use_codes and not prune_use_codes and not brute:
        # exact-prune: candidates were GENERATED by Hamming traversal;
        # re-measure them full-precision so the sort order and the
        # alpha-occlusion geometry the prune sees are exact.  One gather +
        # one MXU batch per wave.
        safe_c = jnp.maximum(cand_ids, 0)
        cvecs = dequant_rows(arrays.vectors, arrays.vec_scales, safe_c)[
            ..., :trunc_dims
        ].astype(jnp.float32)
        if distance_type == DistanceType.L2:
            diff = cvecs - query_vecs[:, None, :]
            ex = jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
        else:
            dots = jnp.einsum(
                "bcd,bd->bc", cvecs, query_vecs,
                preferred_element_type=jnp.float32,
            )
            ex = (
                -dots
                if distance_type == DistanceType.INNER_PRODUCT
                else jnp.maximum(1.0 - dots, 0.0)
            )
        cand_dists = jnp.where(cand_ids == INVALID_ID, jnp.inf, ex)

    # --- prune into neighbor lists ---
    nbr_ids, _ = prune_candidate_sets(
        arrays,
        node_ids,
        cand_ids,
        cand_dists,
        node_labels,
        use_codes=prune_use_codes,
        code_bits=code_bits,
        distance_type=distance_type,
        alphas=alphas,
        num_neighbors=num_neighbors,
        labeled=labeled,
        trunc_dims=trunc_dims,
    )

    # --- write the wave rows (padded ids scatter out of bounds -> drop) ---
    pad = arrays.max_degree - nbr_ids.shape[1]
    rows = jnp.pad(nbr_ids, ((0, 0), (0, pad)), constant_values=INVALID_ID)
    write_ids = jnp.where(node_ids >= 0, node_ids, arrays.capacity)
    adjacency = arrays.adjacency.at[write_ids].set(rows, mode="drop")
    arrays = arrays._replace(adjacency=adjacency)

    # --- backlinks ---
    edge_dst = nbr_ids.reshape(-1)
    edge_src = jnp.repeat(node_ids, nbr_ids.shape[1])
    adjacency, accepted = append_backlinks(
        arrays.adjacency, edge_dst, edge_src
    )
    arrays = arrays._replace(adjacency=adjacency)

    # --- in-device overflow prune: rejected edges point at full rows;
    # prune those rows with candidates = existing ∪ incoming (the incoming
    # edge competes in the prune, exactly add_neighbors' overflow path,
    # graph/mod.rs:212-266) ---
    rejected = (
        ~accepted & (edge_dst != INVALID_ID) & (edge_src != INVALID_ID)
    )

    # Skip the overflow machinery entirely when nothing was rejected
    # (typical for later waves) — lax.cond executes only one branch.
    def do_prune(adj):
        return _overflow_prune(
            arrays._replace(adjacency=adj),
            edge_dst,
            edge_src,
            rejected,
            use_codes=prune_use_codes,
            code_bits=code_bits,
            distance_type=distance_type,
            alphas=alphas,
            num_neighbors=num_neighbors,
            labeled=labeled,
            trunc_dims=trunc_dims,
        ).adjacency

    adjacency = lax.cond(
        jnp.any(rejected), do_prune, lambda adj: adj, arrays.adjacency
    )
    return arrays._replace(adjacency=adjacency)


_wave_step_jit = functools.partial(
    jax.jit, static_argnames=_WAVE_STEP_STATICS
)(_wave_step)

# Donated twin for the initial-build loop: without donation every wave
# holds the full store PLUS a fresh adjacency copy — at 5M x 768d the
# store alone is ~9 GB of a 16 GB chip and the duplicate adjacency
# ([5M, 65] i32 lane-padded to 128 = 2.6 GB) OOMed the build.  Donation
# lets XLA reuse the input buffers for pass-through outputs and scatter
# the adjacency in place.  ONLY safe when no one else references the
# store: the initial build loop before the index is ever returned, and
# only on waves with no live adjacency snapshot (the snapshot aliases the
# donated buffer on the wave it is taken).  add()-time waves must NOT
# donate — concurrent readers hold the previous arrays snapshot.
_wave_step_donated_jit = functools.partial(
    jax.jit, static_argnames=_WAVE_STEP_STATICS, donate_argnums=(0,)
)(_wave_step)


_I32_MAX = jnp.int32(2**31 - 1)


def _overflow_prune(
    arrays: GraphArrays,
    edge_dst: jax.Array,  # i32[E]
    edge_src: jax.Array,  # i32[E]
    rejected: jax.Array,  # bool[E]
    *,
    use_codes: bool,
    code_bits: int,
    distance_type: DistanceType,
    alphas: tuple,
    num_neighbors: int,
    labeled: bool,
    trunc_dims: int,
) -> GraphArrays:
    """Fixed-shape, in-device handling of backlink overflow.

    Collects up to MAX_OVERFLOW_ROWS distinct full rows, builds a
    [rows, INCOMING_CAP] incoming table, and prunes each row once with
    candidates = existing ∪ incoming.  Rows beyond the budget drop their
    extra backlinks this wave (repaired by finalize/orphan repair).
    """
    e = edge_dst.shape[0]
    m = min(MAX_OVERFLOW_ROWS, e)

    # Unique rejected dst rows, ascending, INVALID-padded.
    key = jnp.where(rejected, edge_dst, _I32_MAX)
    s = lax.sort(key)
    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]]
    ) & (s != _I32_MAX)
    uniq = jnp.where(is_first, s, _I32_MAX)
    uniq = lax.sort(uniq)[:m]  # unique dst values first, _I32_MAX padding
    row_ids = jnp.where(uniq != _I32_MAX, uniq, INVALID_ID)

    # Incoming table: edge -> (row index via searchsorted, rank in its run).
    order = jnp.argsort(key)
    s_dst = key[order]
    s_src = edge_src[order]
    idx = jnp.arange(e, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), s_dst[1:] != s_dst[:-1]]
    )
    start_idx = jnp.where(is_start, idx, 0)
    start_idx = lax.associative_scan(jnp.maximum, start_idx)
    rank = idx - start_idx

    row_pos = jnp.searchsorted(uniq, s_dst).astype(jnp.int32)
    row_pos = jnp.clip(row_pos, 0, m - 1)
    hit = (uniq[row_pos] == s_dst) & (s_dst != _I32_MAX)
    write_row = jnp.where(hit & (rank < INCOMING_CAP), row_pos, m)
    write_col = jnp.clip(rank, 0, INCOMING_CAP - 1)
    incoming = jnp.full((m, INCOMING_CAP), INVALID_ID, dtype=jnp.int32)
    incoming = incoming.at[write_row, write_col].set(s_src, mode="drop")

    return _prune_rows_core(
        arrays,
        row_ids,
        incoming,
        use_codes=use_codes,
        code_bits=code_bits,
        distance_type=distance_type,
        alphas=alphas,
        num_neighbors=num_neighbors,
        labeled=labeled,
        trunc_dims=trunc_dims,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "slice_rows", "num_candidates", "use_codes", "distance_type",
        "trunc_dims",
    ),
)
def _brute_candidates(
    arrays: GraphArrays,
    node_ids: jax.Array,  # i32[B] (INVALID_ID padding allowed)
    prefix: jax.Array,  # i32 scalar — candidates restricted to ids < prefix
    *,
    slice_rows: int,  # static upper bound on prefix (keeps shapes fixed)
    num_candidates: int,
    use_codes: bool,
    distance_type: DistanceType,
    trunc_dims: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-C candidates over the first ``prefix`` rows, using the
    storage's build-time measure (Hamming for SBQ, full-precision
    otherwise) — one MXU/VPU batch replacing early-wave beam searches.

    ``prefix`` is dynamic (masked), ``slice_rows`` static, so every wave
    reuses one compilation."""
    safe_ids = jnp.maximum(node_ids, 0)
    if use_codes:
        from ..ops.hamming import hamming_distance_matrix

        d = hamming_distance_matrix(
            arrays.codes[safe_ids], arrays.codes[:slice_rows]
        ).astype(jnp.float32)
    else:
        if trunc_dims <= 0:
            trunc_dims = arrays.vectors.shape[-1]
        qv = dequant_rows(arrays.vectors, arrays.vec_scales, safe_ids)[
            :, :trunc_dims
        ].astype(jnp.float32)
        pts = dequant_rows(
            arrays.vectors, arrays.vec_scales, slice(None, slice_rows)
        )[:, :trunc_dims].astype(jnp.float32)
        if distance_type == DistanceType.L2:
            q_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
            c_sq = jnp.sum(pts * pts, axis=-1)[None, :]
            dots = jnp.dot(qv, pts.T, preferred_element_type=jnp.float32)
            d = jnp.maximum(q_sq - 2.0 * dots + c_sq, 0.0)
        else:
            dots = jnp.dot(qv, pts.T, preferred_element_type=jnp.float32)
            d = (
                -dots
                if distance_type == DistanceType.INNER_PRODUCT
                else jnp.maximum(1.0 - dots, 0.0)
            )
    col = jnp.arange(slice_rows, dtype=jnp.int32)[None, :]
    d = jnp.where(col < prefix, d, jnp.inf)
    neg, ids = lax.top_k(-d, num_candidates)
    dists = -neg
    ids = jnp.where(jnp.isfinite(dists), ids.astype(jnp.int32), INVALID_ID)
    return ids, dists


def _dedup_candidates(cand_ids, cand_dists):
    """One copy per id per row.  Sort-by-id + adjacent-equality — O(C log C)
    instead of the O(C^2) broadcast compare.  Output order is by id, which
    is irrelevant: robust_prune re-sorts by distance."""
    b, c = cand_ids.shape
    key = jnp.where(cand_ids == INVALID_ID, _I32_MAX, cand_ids)
    s_ids, s_d = lax.sort((key, cand_dists), dimension=1, num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.bool_), s_ids[:, 1:] == s_ids[:, :-1]],
        axis=1,
    )
    drop = dup | (s_ids == _I32_MAX)
    return (
        jnp.where(drop, INVALID_ID, s_ids),
        jnp.where(drop, jnp.inf, s_d),
    )


def _build_max_iters(l: int) -> int:
    """Visit budget: the reference visits until the top-L beam is all
    visited, which empirically takes ~1.0-1.3x L visits; pad generously."""
    return int(math.ceil(1.5 * l)) + 16


def _prune_rows_batch(
    arrays: GraphArrays,
    ctx: BuildContext,
    row_ids_np: np.ndarray,
    incoming_np: np.ndarray,
) -> GraphArrays:
    config = ctx.config
    return _prune_rows_batch_jit(
        arrays,
        jnp.asarray(row_ids_np),
        jnp.asarray(incoming_np),
        use_codes=config.build_prune_uses_codes,
        code_bits=config.dims_to_index * config.bits_per_dimension,
        distance_type=config.distance_type,
        alphas=ctx.alphas,
        num_neighbors=config.num_neighbors,
        labeled=config.has_labels,
        trunc_dims=config.dims_to_index,
    )


_PRUNE_ROWS_STATICS = ("use_codes", "code_bits", "distance_type", "alphas",
                       "num_neighbors", "labeled", "trunc_dims")


@functools.partial(jax.jit, static_argnames=_PRUNE_ROWS_STATICS)
def _prune_rows_batch_jit(*args, **kwargs) -> GraphArrays:
    return _prune_rows_core(*args, **kwargs)


# Donated twin for finalize-during-build (same rationale as
# _wave_step_donated_jit: at 5M the non-donated adjacency copy alone is
# 2.6 GB of lane-padded HBM per dispatch).
@functools.partial(
    jax.jit, static_argnames=_PRUNE_ROWS_STATICS, donate_argnums=(0,)
)
def _prune_rows_batch_donated_jit(*args, **kwargs) -> GraphArrays:
    return _prune_rows_core(*args, **kwargs)


def _prune_rows_core(
    arrays: GraphArrays,
    row_ids: jax.Array,  # i32[B] (INVALID_ID padding allowed)
    incoming: jax.Array,  # i32[B, W_inc]
    *,
    use_codes: bool,
    code_bits: int,
    distance_type: DistanceType,
    alphas: tuple,
    num_neighbors: int,
    labeled: bool,
    trunc_dims: int = 0,
) -> GraphArrays:
    """Prune rows to num_neighbors with candidates = existing ∪ incoming
    (add_neighbors' overflow path, graph/mod.rs:212-266).  Rows with
    row_id == INVALID_ID (padding) are dropped at the scatter."""
    safe_rows = jnp.maximum(row_ids, 0)
    existing = arrays.adjacency[safe_rows]  # [B, r_max]
    cand_ids = jnp.concatenate([existing, incoming], axis=1)
    cand_ids = jnp.where(
        (row_ids != INVALID_ID)[:, None], cand_ids, INVALID_ID
    )

    # Distances from each row's node to its candidates.
    if use_codes:
        from ..ops.hamming import hamming_gather

        qc = arrays.codes[safe_rows]
        cand_d = hamming_gather(qc, arrays.codes, cand_ids).astype(jnp.float32)
    else:
        if trunc_dims <= 0:
            trunc_dims = arrays.vectors.shape[-1]
        qv = dequant_rows(arrays.vectors, arrays.vec_scales, safe_rows)[
            :, :trunc_dims
        ].astype(jnp.float32)
        gathered = dequant_rows(
            arrays.vectors, arrays.vec_scales, jnp.maximum(cand_ids, 0)
        )[..., :trunc_dims].astype(jnp.float32)
        if distance_type == DistanceType.L2:
            diff = gathered - qv[:, None, :]
            cand_d = jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
        else:
            dots = jnp.einsum(
                "brd,bd->br",
                gathered,
                qv,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            cand_d = (
                -dots
                if distance_type == DistanceType.INNER_PRODUCT
                else jnp.maximum(1.0 - dots, 0.0)
            )
    cand_d = jnp.where(cand_ids == INVALID_ID, jnp.inf, cand_d)

    cand_ids, cand_d = _dedup_candidates(cand_ids, cand_d)

    node_labels = (
        arrays.node_labels[safe_rows]
        if labeled
        else jnp.zeros((row_ids.shape[0], 0), jnp.int32)
    )
    nbr_ids, _ = prune_candidate_sets(
        arrays,
        row_ids,
        cand_ids,
        cand_d,
        node_labels,
        use_codes=use_codes,
        code_bits=code_bits,
        distance_type=distance_type,
        alphas=alphas,
        num_neighbors=num_neighbors,
        labeled=labeled,
        trunc_dims=trunc_dims,
    )
    pad = arrays.max_degree - nbr_ids.shape[1]
    rows = jnp.pad(nbr_ids, ((0, 0), (0, pad)), constant_values=INVALID_ID)
    write_ids = jnp.where(row_ids >= 0, row_ids, arrays.capacity)
    adjacency = arrays.adjacency.at[write_ids].set(rows, mode="drop")
    return arrays._replace(adjacency=adjacency)


@functools.partial(jax.jit, static_argnames=("num_neighbors",))
def _over_rows_device(
    arrays: GraphArrays, *, num_neighbors: int
) -> tuple[jax.Array, jax.Array]:
    """Device-side over-degree row selection: returns (row ids ascending
    with _I32_MAX padding, count).  Only the scalar count crosses to the
    host — pulling the whole adjacency is prohibitive on tunneled TPUs
    (device->host measured ~0.75 MB/s)."""
    cap = arrays.capacity
    row = jnp.arange(cap, dtype=jnp.int32)
    in_graph = row < arrays.count
    deg = jnp.sum(arrays.adjacency != INVALID_ID, axis=1)
    over = in_graph & (deg > num_neighbors)
    order = lax.sort(jnp.where(over, row, _I32_MAX))
    return order, jnp.sum(over, dtype=jnp.int32)


def finalize(
    arrays: GraphArrays, ctx: BuildContext, *, donate: bool = False
) -> GraphArrays:
    """Final prune pass: trim every row with more than num_neighbors
    neighbors down to num_neighbors (finalize_index_build,
    build.rs:905-960), then repair any orphaned nodes.

    ``donate=True`` (initial build only — the caller must hold no other
    reference to ``arrays``) donates the store into each prune batch."""
    config = ctx.config
    order, count = _over_rows_device(
        arrays, num_neighbors=config.num_neighbors
    )
    n_over = int(count)  # the only host transfer: one scalar
    if ctx.stats is not None:
        ctx.stats.num_prunes += n_over
    step = _prune_rows_batch_donated_jit if donate else _prune_rows_batch_jit
    for i in range(0, n_over, PRUNE_BATCH):
        chunk = order[i : i + PRUNE_BATCH]  # static slice, stays on device
        batch = jnp.where(chunk == _I32_MAX, INVALID_ID, chunk)
        if batch.shape[0] < PRUNE_BATCH:
            batch = jnp.pad(
                batch,
                (0, PRUNE_BATCH - batch.shape[0]),
                constant_values=INVALID_ID,
            )
        inc = jnp.full((PRUNE_BATCH, 1), INVALID_ID, dtype=jnp.int32)
        arrays = step(
            arrays,
            batch,
            inc,
            use_codes=config.build_prune_uses_codes,
            code_bits=config.dims_to_index * config.bits_per_dimension,
            distance_type=config.distance_type,
            alphas=ctx.alphas,
            num_neighbors=config.num_neighbors,
            labeled=config.has_labels,
            trunc_dims=config.dims_to_index,
        )
    return repair_orphans(arrays, ctx)


def _reachable_scatter(arrays: GraphArrays) -> jax.Array:
    """Scatter-max BFS: each iteration propagates `seen` across every edge
    with one scatter-max; converges in graph-diameter iterations.

    XLA serializes scatters with potentially-colliding indices, so each
    wave costs O(cap*R) *sequential* updates — fine to ~100k rows, ruinous
    at 5M (~325M serialized updates per wave).  Large graphs dispatch to
    ``_reachable_csr`` instead."""
    cap = arrays.capacity
    row = jnp.arange(cap, dtype=jnp.int32)
    in_graph = row < arrays.count
    start = arrays.default_start
    seen0 = jnp.zeros((cap,), jnp.bool_).at[jnp.maximum(start, 0)].set(
        start >= 0
    )
    targets = jnp.where(
        arrays.adjacency >= 0, arrays.adjacency, cap
    ).reshape(-1)

    def body(state):
        seen, _ = state
        contrib = (seen & in_graph)[:, None] & (arrays.adjacency != INVALID_ID)
        new_seen = seen.at[targets].max(contrib.reshape(-1), mode="drop")
        return new_seen, jnp.any(new_seen != seen)

    def cond(state):
        return state[1]

    seen, _ = lax.while_loop(cond, body, (seen0, jnp.asarray(True)))
    return seen & in_graph


def _reachable_csr(arrays: GraphArrays) -> jax.Array:
    """Pull-BFS over a sorted-by-destination edge list — no scatters.

    Setup (once per call): sort the (dst, src) edge list by dst
    (fully-parallel on TPU) and binary-search per-node segment offsets.
    Per wave: one gather of source seen-flags, one cumsum, and two
    boundary gathers give ``any(seen[in_neighbors(v)])`` for every v at
    HBM-bandwidth cost.  Replaces the scatter wave whose serialized
    updates dominated 5M-scale orphan repair (~minutes/wave)."""
    cap, r = arrays.adjacency.shape
    row = jnp.arange(cap, dtype=jnp.int32)
    in_graph = row < arrays.count
    start = arrays.default_start
    src = jnp.broadcast_to(row[:, None], (cap, r)).reshape(-1)
    # Invalid edges and edges from out-of-graph rows bucket at `cap`,
    # falling off the end of the offset table.
    dst = jnp.where(
        (arrays.adjacency >= 0) & in_graph[:, None], arrays.adjacency, cap
    ).reshape(-1)
    sdst, ssrc = lax.sort((dst, src), num_keys=1)
    off = jnp.searchsorted(sdst, jnp.arange(cap + 1, dtype=jnp.int32))
    seen0 = jnp.zeros((cap,), jnp.bool_).at[jnp.maximum(start, 0)].set(
        start >= 0
    )

    def body(state):
        seen, _ = state
        active = seen[ssrc]
        s = jnp.cumsum(active.astype(jnp.int32))
        s_lo = jnp.where(off[:-1] > 0, s[jnp.maximum(off[:-1] - 1, 0)], 0)
        s_hi = jnp.where(off[1:] > 0, s[jnp.maximum(off[1:] - 1, 0)], 0)
        new_seen = (seen | (s_hi > s_lo)) & in_graph
        return new_seen, jnp.any(new_seen != seen)

    seen, _ = lax.while_loop(lambda s: s[1], body, (seen0, jnp.asarray(True)))
    return seen & in_graph


# Above this many rows the CSR pull-BFS beats the scatter BFS (the scatter
# serializes; CSR is bandwidth-bound).  Env-overridable for tests and for
# re-tuning on other TPU generations.
_CSR_BFS_MIN_CAP = int(os.environ.get("PGVS_TPU_CSR_BFS_MIN_CAP", "300000"))


@jax.jit
def reachable_on_device(arrays: GraphArrays) -> jax.Array:
    """bool[cap] reachability from the default start node, computed
    entirely on device (the capacity is static, so the strategy choice
    costs nothing at runtime)."""
    if arrays.capacity >= _CSR_BFS_MIN_CAP:
        return _reachable_csr(arrays)
    return _reachable_scatter(arrays)


def reachable_mask(adj: np.ndarray, start: int, n: int) -> np.ndarray:
    """bool[n]: reachable from `start` by directed BFS over adjacency rows.

    Vectorized frontier BFS (the analog of debug_count_reachable_nodes,
    graph/debugging.rs:12-50, which the reference tests use to assert full
    connectivity)."""
    seen = np.zeros(n, dtype=bool)
    if start < 0 or n == 0:
        return seen
    seen[start] = True
    frontier = np.asarray([start])
    while frontier.size:
        nbrs = adj[frontier].reshape(-1)
        nbrs = nbrs[nbrs >= 0]
        new = np.unique(nbrs[~seen[nbrs]])
        if new.size == 0:
            break
        seen[new] = True
        frontier = new
    return seen


# Orphans repaired per chain round (static top_k width).  One round fixes
# up to this many orphans with zero extra BFS; graphs with more loop.
_REPAIR_CHAIN_MAX = 4096


@jax.jit
def repair_orphans_device(arrays: GraphArrays) -> GraphArrays:
    """Device-resident orphan repair: ONE reachability BFS, then chain the
    orphans off the start node.

    The BFS yields the orphan mask; ``top_k`` captures up to
    ``_REPAIR_CHAIN_MAX`` orphan ids and the repair writes the chain
    ``start -> o_0 -> o_1 -> ... -> o_{m-1}`` — one in-edge per orphan.
    Slot bookkeeping makes this provably non-destructive:

    - the chain overwrites only the *last* slots of orphan rows.  No path
      from the start node runs through an orphan (that is what orphan
      means), so destroying an orphan's out-edge cannot disconnect any
      reachable node;
    - the one reachable row touched is the start node's last slot, and its
      displaced target ``t`` is re-homed as ``o_0 -> t``, preserving every
      route that used ``start -> t``.

    Hence one round leaves zero of the captured orphans unreachable and
    creates no new orphans — the iterated attach/force/retry cascade the
    previous design needed (up to 32 rounds x 2 BFS each, hours at 5M
    scale) collapses to a single BFS plus O(_REPAIR_CHAIN_MAX) updates.
    Only graphs with more than _REPAIR_CHAIN_MAX orphans loop, removing
    exactly _REPAIR_CHAIN_MAX per round from the carried mask (no re-BFS:
    the proof above guarantees non-captured orphans are the only ones
    left).

    Replaces the host-side repair's full adjacency download (prohibitive
    on tunneled TPUs: a 1M-row graph is ~260 MB at ~0.75 MB/s); the
    host/native path remains as a verification fallback.
    """
    cap, r_max = arrays.adjacency.shape
    row = jnp.arange(cap, dtype=jnp.int32)
    in_graph = (row < arrays.count) & (arrays.default_start >= 0)
    start = jnp.maximum(arrays.default_start, 0)
    k = min(cap, _REPAIR_CHAIN_MAX)

    def cond(state):
        _, orphan, rounds = state
        return jnp.any(orphan) & (rounds < 256)

    def body(state):
        adj, orphan, rounds = state
        vals, idx = lax.top_k(orphan.astype(jnp.int32), k)
        valid = vals > 0
        idx = idx.astype(jnp.int32)
        any_orphan = valid[0]
        head = idx[0]
        t_old = adj[start, r_max - 1]

        # Writes, all to distinct (row, slot) pairs:
        #   (start, R-1) <- head            the chain's entry edge
        #   (head,  R-2) <- t_old           re-home start's displaced edge
        #   (o_i,   R-1) <- o_{i+1}         the chain links
        rows = jnp.concatenate(
            [start[None], idx[:1], idx[: k - 1]]
        )
        slots = jnp.concatenate(
            [
                jnp.asarray([r_max - 1, r_max - 2], jnp.int32),
                jnp.full((k - 1,), r_max - 1, jnp.int32),
            ]
        )
        new_vals = jnp.concatenate([head[None], t_old[None], idx[1:]])
        mask = jnp.concatenate(
            [
                any_orphan[None],
                (any_orphan & (t_old != INVALID_ID))[None],
                valid[1:],
            ]
        )
        adj2 = adj.at[jnp.where(mask, rows, cap), slots].set(
            jnp.where(mask, new_vals, INVALID_ID), mode="drop"
        )
        orphan2 = orphan.at[jnp.where(valid, idx, cap)].set(
            False, mode="drop"
        )
        return adj2, orphan2, rounds + 1

    seen = reachable_on_device(arrays)
    orphan0 = in_graph & ~seen
    adj, _, _ = lax.while_loop(
        cond, body, (arrays.adjacency, orphan0, jnp.zeros((), jnp.int32))
    )
    return arrays._replace(adjacency=adj)


# One-dispatch, zero-pull repair for the streaming-add hot path: when the
# graph is already fully reachable (the common case) the while_loop's
# condition is false on entry and the whole call costs ONE reachability
# BFS on device — no host transfer at all.  Profiling showed the eager
# repair_orphans path spent ~1.6 s per add() in device->host scalar pulls
# (count / default_start / orphan-sum at ~0.4 s each over the tunneled
# link) against ~ms of actual BFS compute.  DiskannIndex.add() re-verifies
# with the pulled/host-fallback path every K batches.
repair_orphans_device_jit = jax.jit(repair_orphans_device)


def repair_orphans(
    arrays: GraphArrays,
    ctx: BuildContext,
    *,
    n: Optional[int] = None,
    start: Optional[int] = None,
) -> GraphArrays:
    """Guarantee every node is reachable from the default start node.

    Batched insertion can orphan a node when every row it linked to prunes
    the backlink away (the reference's serial insert has the same failure
    mode — it *warns* about orphans, graph/mod.rs:706-716; its tests then
    assert full reachability).  We repair instead: each unreachable node u
    gets a forced edge from a reachable node (preferring u's own nearest
    forward neighbor, so the detour stays short), iterating until the BFS
    covers the graph.

    ``n`` / ``start`` let callers that already know the host values skip
    the two device-scalar pulls (~0.4 s each on tunneled TPUs)."""
    if n is None:
        n = int(arrays.count)
    if n == 0:
        return arrays
    if start is None:
        start = int(arrays.default_start)
    if start < 0:
        return arrays

    # Fast path: check reachability ON DEVICE — downloading the adjacency
    # is prohibitive over tunneled TPU links, and orphans are rare.
    seen = reachable_on_device(arrays)
    n_orphans = int(jnp.sum(~seen[:n]))  # one scalar transfer
    if n_orphans == 0:
        return arrays
    # The reference only warns on orphaned inserts (graph/mod.rs:706-716);
    # we repair, but the forced graph surgery must not be silent.
    logger.warning(
        "repairing %d orphaned node(s): forcing edges from reachable "
        "nodes so the full graph stays scannable",
        n_orphans,
    )

    # Device-resident repair first: no adjacency download.
    arrays = repair_orphans_device(arrays)
    seen = reachable_on_device(arrays)
    n_orphans = int(jnp.sum(~seen[:n]))
    if n_orphans == 0:
        return arrays
    logger.warning(
        "device orphan repair left %d orphan(s); falling back to the "
        "host repair path",
        n_orphans,
    )

    adj = np.ascontiguousarray(np.asarray(arrays.adjacency[:n]), dtype=np.int32).copy()

    # Native fast path (C++ host runtime) — required at 50M scale.
    from .. import native

    if native.available():
        forced = native.repair_orphans_inplace(adj, start)
        if forced == 0:
            return arrays
        return arrays._replace(
            adjacency=arrays.adjacency.at[:n].set(jnp.asarray(adj))
        )

    changed = False

    def _free_slot(node):
        free = np.nonzero(adj[node] == INVALID_ID)[0]
        return int(free[0]) if free.size else -1

    for _ in range(64):
        seen = reachable_mask(adj, start, n)
        orphans = np.nonzero(~seen)[0]
        if orphans.size == 0:
            break
        # Chain: a freshly repaired orphan hosts the next one (its row has
        # free slots), so repairs never fight over one full row.
        chain_prev = -1
        for u in orphans:
            host = -1
            host_full = -1
            for w in adj[u]:
                w = int(w)
                if w < 0 or not seen[w]:
                    continue
                if _free_slot(w) >= 0:
                    host = w
                    break
                if host_full < 0:
                    host_full = w
            if host < 0 and chain_prev >= 0 and _free_slot(chain_prev) >= 0:
                host = chain_prev
            if host < 0:
                host = host_full if host_full >= 0 else start
            if host == u:
                continue
            slot = _free_slot(host)
            if slot < 0:
                slot = adj.shape[1] - 1  # overwrite the farthest edge
            adj[host, slot] = u
            seen[u] = True  # exact: host is reachable, so u now is too
            chain_prev = int(u)
            changed = True
    if not changed:
        return arrays
    return arrays._replace(
        adjacency=arrays.adjacency.at[:n].set(jnp.asarray(adj))
    )
