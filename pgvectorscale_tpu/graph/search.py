"""Batched greedy graph search (the Vamana beam search).

TPU-native reformulation of the reference's streaming greedy search
(reference: pgvectorscale/src/access_method/graph/mod.rs —
``greedy_search_streaming_init`` :331-354, ``greedy_search_iterate``
:357-385, ``ListSearchResult::visit_closest`` :153-170).

The reference walks one node at a time with a candidate min-heap and a
sorted visited list.  Here the search is *batched over Q queries at once*
inside one ``lax.while_loop`` with fixed shapes (the CAGRA-style
formulation, PAPERS.md):

- Per query, the beam is a fixed-size top-L array of (distance, id,
  visited-flag) — the merged equivalent of the reference's
  candidates-heap + visited-list.  The termination rule "heap head >=
  visited[pos_limit-1]" (graph/mod.rs:158-166) is equivalent to "every
  beam entry is visited", because the beam holds the L best entries seen.
- Each step visits the best unvisited beam entry, gathers its adjacency
  row, computes candidate distances in one batch (Hamming on packed codes
  for SBQ — sbq/mod.rs:139-159 — or an MXU dot for plain storage), masks
  duplicates and label-filtered candidates (sbq/storage.rs:165-172), and
  merges into the beam with one stable multi-operand sort.
- The visited history (``hist``) doubles as the reference's ``inserted``
  dedup set (graph/mod.rs:77) and as the build-time visited-node
  candidate set returned by ``greedy_search_for_build``
  (graph/mod.rs:285-327).
- Tombstoned (deleted) nodes are traversed but never returned, matching
  vacuum semantics (scan.rs:231).

Queries converge at different step counts; converged queries are frozen by
masks until the whole batch finishes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import DistanceType
from ..labels import overlaps
from ..ops.hamming import hamming_gather
from ..store import (
    INVALID_ID,
    GraphArrays,
    dequant_rows,
    lookup_label_starts,
)

INF = jnp.inf
_I32_MAX = jnp.int32(2**31 - 1)

# Neighbor-code cache budget: cap * R_max * W * 4 bytes must fit alongside
# the store (v5e-class chips have 16 GB HBM; 1M x 768d 1-bit is ~6.2 GB).
EDGE_CODE_CACHE_MAX_BYTES = 8 << 30


def rows_member(sorted_rows: jax.Array, vals: jax.Array) -> jax.Array:
    """Exact membership test of ``vals`` [Q, R] in id-ascending
    ``sorted_rows`` [Q, L] via batched binary search: O(R log L) gathers
    instead of the O(R*L) broadcast compare.  Rows are padded with
    _I32_MAX."""
    q, l = sorted_rows.shape
    # Interval [lo, hi) halves per step; length <= floor(l / 2^k) after k
    # steps, so l.bit_length() steps guarantee convergence to lo == hi.
    steps = l.bit_length()
    lo = jnp.zeros(vals.shape, jnp.int32)
    hi = jnp.full(vals.shape, l, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) // 2
        mv = jnp.take_along_axis(sorted_rows, jnp.minimum(mid, l - 1), axis=1)
        go_right = mv < vals
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    ml = jnp.take_along_axis(sorted_rows, jnp.clip(lo, 0, l - 1), axis=1)
    return (lo < l) & (ml == vals)


def merge_sorted_into_beam(
    beam_d: jax.Array,  # f32[Q, L] ascending
    beam_ids: jax.Array,  # i32[Q, L]
    beam_vis: jax.Array,  # bool[Q, L]
    cand_d: jax.Array,  # f32[Q, E] unsorted (INF for invalid)
    cand_ids: jax.Array,  # i32[Q, E]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Merge candidates into the sorted beam and keep the best L.

    The beam is ascending by construction, so a full ``lax.sort`` of the
    concatenation (O(log^2 n) bitonic passes) is wasted work: sort only
    the candidate block, then run ONE bitonic-merge network (log2(n)
    compare-exchange stages) over [beam ascending | pad | candidates
    descending], which is a bitonic sequence.  Each stage is a reshape +
    elementwise min/max — pure VPU work that XLA fuses.

    Not stable across equal keys (a bitonic network can reorder ties);
    callers must not rely on tie order.
    """
    q, bl = beam_d.shape
    er = cand_d.shape[1]
    cd, cid = lax.sort((cand_d, cand_ids), dimension=1, num_keys=1)
    cd, cid = cd[:, ::-1], cid[:, ::-1]  # descending

    n = 1 << (bl + er - 1).bit_length()
    pad = n - bl - er
    d = jnp.concatenate(
        [beam_d, jnp.full((q, pad), INF, jnp.float32), cd], axis=1
    )
    ids = jnp.concatenate(
        [beam_ids, jnp.full((q, pad), INVALID_ID, jnp.int32), cid], axis=1
    )
    vis = jnp.concatenate(
        [beam_vis, jnp.zeros((q, pad + er), jnp.bool_)], axis=1
    )

    stride = n // 2
    while stride >= 1:
        ds = d.reshape(q, -1, 2, stride)
        is_ = ids.reshape(q, -1, 2, stride)
        vs = vis.reshape(q, -1, 2, stride)
        lo_d, hi_d = ds[:, :, 0, :], ds[:, :, 1, :]
        swap = lo_d > hi_d
        new_lo = jnp.where(swap, hi_d, lo_d)
        new_hi = jnp.where(swap, lo_d, hi_d)
        d = jnp.stack([new_lo, new_hi], axis=2).reshape(q, n)
        lo_i, hi_i = is_[:, :, 0, :], is_[:, :, 1, :]
        ids = jnp.stack(
            [jnp.where(swap, hi_i, lo_i), jnp.where(swap, lo_i, hi_i)],
            axis=2,
        ).reshape(q, n)
        lo_v, hi_v = vs[:, :, 0, :], vs[:, :, 1, :]
        vis = jnp.stack(
            [jnp.where(swap, hi_v, lo_v), jnp.where(swap, lo_v, hi_v)],
            axis=2,
        ).reshape(q, n)
        stride //= 2
    return d[:, :bl], ids[:, :bl], vis[:, :bl]


def merge_sorted_into_window(
    win_d: jax.Array,  # f32[Q, W] ascending
    win_ids: jax.Array,  # i32[Q, W]
    cand_d: jax.Array,  # f32[Q, E] unsorted (INF for invalid)
    cand_ids: jax.Array,  # i32[Q, E]
) -> tuple[jax.Array, jax.Array]:
    """Merge a scored-candidate block into the rescore-window buffer and
    keep the best W — the vis-less twin of ``merge_sorted_into_beam``.

    The window may hold the same id twice (a candidate evicted from the
    beam between two proposals carries the same approximate distance both
    times); callers dedup once at finalize instead of paying a per-step
    membership test against a W-wide buffer."""
    q, wl = win_d.shape
    er = cand_d.shape[1]
    cd, cid = lax.sort((cand_d, cand_ids), dimension=1, num_keys=1)
    cd, cid = cd[:, ::-1], cid[:, ::-1]  # descending

    n = 1 << (wl + er - 1).bit_length()
    pad = n - wl - er
    d = jnp.concatenate(
        [win_d, jnp.full((q, pad), INF, jnp.float32), cd], axis=1
    )
    ids = jnp.concatenate(
        [win_ids, jnp.full((q, pad), INVALID_ID, jnp.int32), cid], axis=1
    )
    stride = n // 2
    while stride >= 1:
        ds = d.reshape(q, -1, 2, stride)
        is_ = ids.reshape(q, -1, 2, stride)
        lo_d, hi_d = ds[:, :, 0, :], ds[:, :, 1, :]
        swap = lo_d > hi_d
        d = jnp.stack(
            [jnp.where(swap, hi_d, lo_d), jnp.where(swap, lo_d, hi_d)],
            axis=2,
        ).reshape(q, n)
        lo_i, hi_i = is_[:, :, 0, :], is_[:, :, 1, :]
        ids = jnp.stack(
            [jnp.where(swap, hi_i, lo_i), jnp.where(swap, lo_i, hi_i)],
            axis=2,
        ).reshape(q, n)
        stride //= 2
    return d[:, :wl], ids[:, :wl]


class SearchResult(NamedTuple):
    beam_ids: jax.Array  # i32[Q, L] sorted by distance
    beam_dists: jax.Array  # f32[Q, L]
    beam_visited: jax.Array  # bool[Q, L]
    hist_ids: jax.Array  # i32[Q, H] visit order
    hist_dists: jax.Array  # f32[Q, H]
    n_visited: jax.Array  # i32[Q]
    n_dist_comps: jax.Array  # i32[Q] (stats: StatsDistanceComparison analog)
    iters: jax.Array  # i32 scalar
    window_ids: jax.Array  # i32[Q, Wn] scored-candidate window ([Q,1] off)
    window_dists: jax.Array  # f32[Q, Wn]


def _candidate_distances(
    arrays: GraphArrays,
    query_vecs: jax.Array,
    query_codes: jax.Array,
    ids: jax.Array,
    *,
    use_codes: bool,
    distance_type: DistanceType,
) -> jax.Array:
    """Distances from each query to its candidate ids: [Q, R] f32."""
    if use_codes:
        return hamming_gather(query_codes, arrays.codes, ids).astype(
            jnp.float32
        )
    safe = jnp.maximum(ids, 0)
    # Traversal uses the indexed prefix: stored vectors are full-width (the
    # heap analog) but plain nodes index only dims_to_index dims — the
    # reference stores the index slice in the node (build.rs:548,
    # plain/storage.rs:240) and rescores full-width later.  The query is
    # already truncated, so slice the gather to the query's width.
    gathered = dequant_rows(arrays.vectors, arrays.vec_scales, safe)[
        ..., : query_vecs.shape[-1]
    ].astype(jnp.float32)  # [Q, R, Dt]
    if distance_type == DistanceType.L2:
        diff = gathered - query_vecs[:, None, :]
        return jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
    dots = jnp.einsum(
        "qrd,qd->qr",
        gathered,
        query_vecs,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if distance_type == DistanceType.INNER_PRODUCT:
        return -dots
    return jnp.maximum(1.0 - dots, 0.0)


def get_start_ids(
    arrays: GraphArrays,
    query_labels: Optional[jax.Array],
    num_queries: int,
) -> jax.Array:
    """Start nodes for each query: default start, plus per-label starts when
    the query carries labels (StartNodes::get_for_node,
    graph/start_nodes.rs)."""
    default = jnp.broadcast_to(
        arrays.default_start[None, None], (num_queries, 1)
    ).astype(jnp.int32)
    if query_labels is None or query_labels.shape[-1] == 0:
        return default
    label_starts = lookup_label_starts(arrays, query_labels)  # [Q, Lq]
    return jnp.concatenate([default, label_starts], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_list_size",
        "max_iters",
        "distance_type",
        "use_codes",
        "filtered",
        "expand_factor",
        "track_hist",
        "window_n",
        "fused_gather",
    ),
)
def beam_search(
    arrays: GraphArrays,
    query_vecs: jax.Array,  # f32[Q, D]
    query_codes: jax.Array,  # u32[Q, W] (W may be 0 when unused)
    query_labels: jax.Array,  # i32[Q, Lq] (Lq may be 0)
    start_ids: jax.Array,  # i32[Q, S]
    *,
    search_list_size: int,
    max_iters: int,
    distance_type: DistanceType,
    use_codes: bool,
    filtered: bool,
    expand_factor: int = 1,
    edge_codes: Optional[jax.Array] = None,  # u32[cap, R*W] flat
    track_hist: bool = True,
    window_n: int = 0,
    fused_gather: bool = False,
) -> SearchResult:
    """Batched greedy beam search.

    ``expand_factor`` (E) is the multi-frontier widening from the
    GPU-graph-search literature (CAGRA, PAPERS.md): each iteration visits
    the E best unvisited beam entries instead of one, cutting the
    sequential while_loop length ~E× at slightly wider per-step batch
    work — the right trade on TPU, where loop iterations are
    latency-bound.  E=1 reproduces the reference's strict best-first
    order (ListSearchResult::visit_closest, graph/mod.rs:153-170);
    ``max_iters`` is the *visit* budget regardless of E.

    ``window_n`` > 0 keeps a side buffer of the best ``window_n`` scored
    candidates seen ANYWHERE in the search (the "scored" rescore-window
    strategy).  This is what the reference's unbounded candidate list
    retains implicitly (ListSearchResult, graph/mod.rs:64-98): a rescore
    window wider than L no longer requires widening the beam — the beam
    stays L-wide (cheap top_k / dedup / merge) while the window buffer
    absorbs every scored candidate via one bitonic merge per step.
    """
    q, s = start_ids.shape
    l = search_list_size
    r_max = arrays.max_degree
    h = max_iters
    e = expand_factor
    assert 1 <= e <= l

    dist_fn = functools.partial(
        _candidate_distances,
        arrays,
        query_vecs,
        query_codes,
        use_codes=use_codes,
        distance_type=distance_type,
    )

    if fused_gather and use_codes and edge_codes is not None:
        # The kernel's row DMAs must be lane-aligned; the cache is built
        # pre-padded when fused gather is on (_build_edge_codes
        # pad_to_lanes), so this is normally a no-op — the fallback pad
        # covers callers handing in an unpadded cache (it re-copies the
        # cache per dispatch, which the pre-padded build exists to avoid).
        rw = edge_codes.shape[1]
        rwp = -(-rw // 128) * 128
        if rwp != rw:
            edge_codes = jnp.pad(edge_codes, ((0, 0), (0, rwp - rw)))

    # ---- init: insert start nodes (deduplicated) into the beam ----
    start_valid = start_ids >= 0
    # Dedup identical start ids within a row (keep first occurrence).
    eq = start_ids[:, :, None] == start_ids[:, None, :]
    earlier = (
        jnp.arange(s, dtype=jnp.int32)[None, :, None]
        > jnp.arange(s, dtype=jnp.int32)[None, None, :]
    )
    dup = jnp.any(eq & earlier & start_valid[:, None, :], axis=-1)
    start_valid = start_valid & ~dup

    start_dists = jnp.where(start_valid, dist_fn(start_ids), INF)
    n_comps0 = jnp.sum(start_valid, axis=1, dtype=jnp.int32)

    pad = l - s if l > s else 0
    init_ids = jnp.concatenate(
        [
            jnp.where(start_valid, start_ids, INVALID_ID),
            jnp.full((q, pad), INVALID_ID, dtype=jnp.int32),
        ],
        axis=1,
    )[:, :l]
    init_dists = jnp.concatenate(
        [start_dists, jnp.full((q, pad), INF, dtype=jnp.float32)], axis=1
    )[:, :l]
    order = jnp.argsort(init_dists, axis=1)
    beam_ids = jnp.take_along_axis(init_ids, order, axis=1)
    beam_dists = jnp.take_along_axis(init_dists, order, axis=1)
    beam_visited = jnp.zeros((q, l), dtype=jnp.bool_)

    # The visit history feeds build-time candidate sets; the query path
    # never reads it, so ``track_hist=False`` shrinks it to a dummy and
    # skips two scatters per iteration.
    h_cap = h if track_hist else 1
    hist_ids = jnp.full((q, h_cap), INVALID_ID, dtype=jnp.int32)
    hist_dists = jnp.full((q, h_cap), INF, dtype=jnp.float32)
    n_visited = jnp.zeros((q,), dtype=jnp.int32)

    # Scored-candidate window buffer, seeded from the (sorted) start-node
    # beam so start nodes are rescore candidates too.
    wn = window_n if window_n > 0 else 1
    win_pad = max(wn - l, 0)
    win_ids = jnp.concatenate(
        [beam_ids, jnp.full((q, win_pad), INVALID_ID, jnp.int32)], axis=1
    )[:, :wn]
    win_dists = jnp.concatenate(
        [beam_dists, jnp.full((q, win_pad), INF, jnp.float32)], axis=1
    )[:, :wn]

    state = (
        beam_ids,
        beam_dists,
        beam_visited,
        hist_ids,
        hist_dists,
        win_ids,
        win_dists,
        n_visited,
        n_comps0,
        jnp.zeros((), dtype=jnp.int32),
    )

    iter_bound = -(-max_iters // e) + 1  # visit budget / frontier width

    def cond(state):
        beam_ids, beam_dists, beam_visited = state[:3]
        n_visited, it = state[7], state[9]
        has_unvisited = jnp.any(
            (beam_ids != INVALID_ID) & ~beam_visited, axis=1
        )
        budget_left = n_visited < h
        return jnp.any(has_unvisited & budget_left) & (it < iter_bound)

    q_idx = jnp.arange(q, dtype=jnp.int32)[:, None]
    er = e * r_max

    def body(state):
        (
            beam_ids,
            beam_dists,
            beam_visited,
            hist_ids,
            hist_dists,
            win_ids,
            win_dists,
            n_visited,
            n_comps,
            it,
        ) = state

        # --- select the E best unvisited beam entries per query
        # (ListSearchResult::visit_closest, graph/mod.rs:153-170;
        # E-wide frontier per CAGRA) ---
        unvisited_d = jnp.where(
            (beam_ids != INVALID_ID) & ~beam_visited, beam_dists, INF
        )
        neg_d, sel_pos = lax.top_k(-unvisited_d, e)  # [Q, E]
        sel_dist = -neg_d
        active = sel_dist < INF  # [Q, E]
        sel_id = jnp.where(
            active,
            jnp.take_along_axis(beam_ids, sel_pos, axis=1),
            INVALID_ID,
        )

        # Visit-budget guard: entries that would overflow the history stay
        # unvisited (they can be picked up after other queries converge).
        rank = jnp.cumsum(active.astype(jnp.int32), axis=1) - 1  # [Q, E]
        pos = n_visited[:, None] + rank
        active = active & (pos < h)
        sel_id = jnp.where(active, sel_id, INVALID_ID)

        # Mark visited (scatter over beam positions; top_k positions are
        # distinct per row).
        beam_visited = beam_visited.at[q_idx, sel_pos].max(active)

        if track_hist:
            # Append to visit history (out-of-budget entries dropped).
            pos_w = jnp.where(active, pos, h)  # h out of bounds -> dropped
            hist_ids = hist_ids.at[q_idx, pos_w].set(sel_id, mode="drop")
            hist_dists = hist_dists.at[q_idx, pos_w].set(
                sel_dist, mode="drop"
            )
        n_visited = n_visited + jnp.sum(active, axis=1, dtype=jnp.int32)

        # --- expand: gather E adjacency rows (storage.visit_lsn analog) ---
        nbrs = arrays.adjacency[jnp.maximum(sel_id, 0)].reshape(q, er)
        valid = (nbrs != INVALID_ID) & jnp.repeat(active, r_max, axis=1)

        # Label-overlap skip for filtered search
        # (sbq/storage.rs:165-172).
        if filtered and query_labels.shape[-1] > 0:
            nbr_labels = arrays.node_labels[jnp.maximum(nbrs, 0)]
            keep = overlaps(nbr_labels, query_labels[:, None, :])
            valid = valid & keep

        # Dedup against the current beam (the `inserted` set,
        # graph/mod.rs:77) — broadcast compare (VPU-friendly; the binary-
        # search variant was measured 10x slower on TPU because per-row
        # dynamic gathers don't vectorize).  No check against the visit
        # history is needed: a visited entry evicted from the beam had L
        # better-or-equal entries at eviction time, the beam only improves,
        # and the merge sort is stable with beam entries first — so it can
        # never re-enter the top L.
        in_beam = jnp.any(nbrs[:, :, None] == beam_ids[:, None, :], axis=-1)
        valid = valid & ~in_beam

        # Candidate distances, aligned with the raw adjacency order.
        # With an edge-code cache the codes arrive in the SAME contiguous
        # rows as the adjacency gather (~R*W*4 bytes per frontier node) —
        # the per-candidate 32-byte scattered gather of `codes[nbrs]` was
        # measured at ~60% of total search time on TPU (tiny rows use a
        # sliver of HBM bandwidth).
        if use_codes and edge_codes is not None and fused_gather:
            # Pallas kernel: the row gather rides hundreds of in-flight
            # DMAs per grid step instead of XLA's serialized ~2 KB row
            # transfers (ops/pallas_hamming.hamming_edge_gather_pallas).
            from ..ops.pallas_hamming import hamming_edge_gather_pallas

            cand_d_raw = hamming_edge_gather_pallas(
                edge_codes,
                jnp.maximum(sel_id, 0),
                query_codes,
                r_max=r_max,
            )
        elif use_codes and edge_codes is not None:
            # Cache rows are FLAT u32[R*W] (see _build_edge_codes: a
            # [R, W] minor pair would pad W up to 128 lanes, 2x HBM).
            # Slice after the gather: a lane-padded cache (fused-gather
            # builds) carries a zero tail past R*W.
            w = query_codes.shape[1]
            ec = edge_codes[jnp.maximum(sel_id, 0)][
                ..., : r_max * w
            ]  # [Q, E, R*W]
            qtile = jnp.tile(query_codes, (1, r_max))  # [Q, R*W]
            x = jnp.bitwise_xor(ec, qtile[:, None, :])
            pops = lax.population_count(x).astype(jnp.int32)
            cand_d_raw = (
                jnp.sum(pops.reshape(q, e, r_max, w), axis=-1)
                .reshape(q, er)
                .astype(jnp.float32)
            )
        else:
            cand_d_raw = dist_fn(nbrs)

        # Dedup within the candidate row.  Narrow rows: the O(er^2)
        # broadcast compare is pure VPU work and beats a sort; wide rows:
        # 2-operand sort by id + adjacent-equality.
        if er <= 192:
            nbr_dup = jnp.any(
                (nbrs[:, :, None] == nbrs[:, None, :])
                & (
                    jnp.arange(er)[None, :, None]
                    > jnp.arange(er)[None, None, :]
                )
                & valid[:, None, :],
                axis=-1,
            )
            valid = valid & ~nbr_dup
            nbrs = jnp.where(valid, nbrs, INVALID_ID)
            cand_d = jnp.where(valid, cand_d_raw, INF)
        else:
            key = jnp.where(valid, nbrs, _I32_MAX)
            s_key, s_d = lax.sort(
                (key, jnp.where(valid, cand_d_raw, INF)),
                dimension=1,
                num_keys=1,
            )
            dup = jnp.concatenate(
                [
                    jnp.zeros((q, 1), jnp.bool_),
                    s_key[:, 1:] == s_key[:, :-1],
                ],
                axis=1,
            )
            valid = (s_key != _I32_MAX) & ~dup
            nbrs = jnp.where(valid, s_key, INVALID_ID)
            cand_d = jnp.where(valid, s_d, INF)
        n_comps = n_comps + jnp.sum(valid, axis=1, dtype=jnp.int32)

        if window_n > 0:
            # Absorb every scored candidate into the rescore window —
            # this is the ONLY state wider than the beam, and its merge
            # is the only per-step cost of the "scored" strategy.
            win_dists, win_ids = merge_sorted_into_window(
                win_dists, win_ids, cand_d, nbrs
            )

        # --- merge into beam: the beam is already ascending, so one
        # bitonic-merge network replaces the full concat-sort ---
        beam_dists, beam_ids, beam_visited = merge_sorted_into_beam(
            beam_dists, beam_ids, beam_visited, cand_d, nbrs
        )

        return (
            beam_ids,
            beam_dists,
            beam_visited,
            hist_ids,
            hist_dists,
            win_ids,
            win_dists,
            n_visited,
            n_comps,
            it + 1,
        )

    state = lax.while_loop(cond, body, state)
    (
        beam_ids,
        beam_dists,
        beam_visited,
        hist_ids,
        hist_dists,
        win_ids,
        win_dists,
        n_visited,
        n_comps,
        it,
    ) = state
    return SearchResult(
        beam_ids=beam_ids,
        beam_dists=beam_dists,
        beam_visited=beam_visited,
        hist_ids=hist_ids,
        hist_dists=hist_dists,
        n_visited=n_visited,
        n_dist_comps=n_comps,
        iters=it,
        window_ids=win_ids,
        window_dists=win_dists,
    )
