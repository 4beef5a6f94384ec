"""Vectorized RobustPrune (α-occlusion pruning).

TPU-native reformulation of the reference's ann-disk-style prune
(reference: pgvectorscale/src/access_method/graph/mod.rs:392-488
``prune_neighbors``), batched over B nodes at once.

Semantics preserved exactly:

- Candidates are sorted by distance with the duplicate-vector tiebreak:
  equal (==0) distances order by id distance ``|cand - node|``
  (neighbor_with_distance.rs:45-95; node ids are our ItemPointer analog).
- α rounds: α = 1.0, then ×1.2 per round while α <= max_alpha and the
  result list is not full (graph/mod.rs:416-484).
- Within a round, candidates are scanned in sorted order; picking candidate
  ``i`` marks it excluded and raises every later candidate ``j``'s occlusion
  factor to max(factor_j, d(j, node) / d(j, i)) — where the division follows
  ``DistanceWithTieBreak::get_factor`` (neighbor_with_distance.rs:55-66):
  zero divisor with zero numerator falls back to the id-distance ratio,
  zero divisor with nonzero numerator is +infinity.
- A candidate is pickable in round α iff its factor <= α.
- Label-aware skip: candidate ``j``'s factor is *not* raised by picked
  neighbor ``i`` unless ``labels_i.contains_intersection(labels_j,
  node_labels)`` — i.e. an existing neighbor only occludes a candidate if
  it covers the candidate's essential labels (graph/mod.rs:452-462).

The sequential greedy structure (each pick occludes later candidates in the
same pass) is preserved with a ``fori_loop`` over (round, position) steps;
each step is O(B*C) masked vector work on precomputed [B, C, C] factor
matrices, so the MXU/VPU do the heavy lifting up front.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..labels import contains_intersection
from ..store import INVALID_ID

_F32_EPS = float(np.finfo(np.float32).eps)
_BIG = jnp.float32(3.0e38)
_UNSELECTED = jnp.int32(2**31 - 1)


def alpha_schedule(max_alpha: float) -> tuple[float, ...]:
    """α rounds: 1.0, ×1.2 while <= max_alpha (graph/mod.rs:416,484)."""
    alphas = []
    a = 1.0
    while a <= max_alpha:
        alphas.append(a)
        a *= 1.2
    return tuple(alphas)


@functools.partial(
    jax.jit,
    static_argnames=("num_neighbors", "alphas", "labeled"),
)
def robust_prune(
    node_ids: jax.Array,  # i32[B]
    cand_ids: jax.Array,  # i32[B, C] (INVALID_ID padding; may contain node)
    cand_dists: jax.Array,  # f32[B, C] distance(candidate, node)
    pair_dists: jax.Array,  # f32[B, C, C] distance(candidate_i, candidate_j)
    cand_labels: jax.Array,  # i32[B, C, Lm] (Lm may be 0)
    node_labels: jax.Array,  # i32[B, Lm]
    *,
    num_neighbors: int,
    alphas: tuple[float, ...],
    labeled: bool,
) -> tuple[jax.Array, jax.Array]:
    """Returns (neighbor_ids i32[B, R], neighbor_dists f32[B, R]) in
    selection order, INVALID_ID / +inf padded."""
    b, c = cand_ids.shape
    r = num_neighbors

    valid = (cand_ids != INVALID_ID) & (cand_ids != node_ids[:, None])
    dists = jnp.where(valid, cand_dists, jnp.inf)

    # Tiebreak: id distance to the node (ip_distance analog,
    # util/mod.rs:166-171).
    tie_q = jnp.abs(cand_ids - node_ids[:, None]).astype(jnp.float32)

    # ---- sort candidates: primary key distance, tiebreak id-distance for
    # zero distances (Ord for DistanceWithTieBreak) ----
    tie_key = jnp.where(dists <= _F32_EPS, tie_q, 0.0)
    _, _, order = lax.sort(
        (dists, tie_key, jnp.arange(c, dtype=jnp.int32)[None, :].repeat(b, 0)),
        dimension=1,
        num_keys=2,
    )
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    dists = jnp.take_along_axis(dists, order, axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)
    tie_q = jnp.take_along_axis(tie_q, order, axis=1)
    pair_dists = jnp.take_along_axis(pair_dists, order[:, :, None], axis=1)
    pair_dists = jnp.take_along_axis(pair_dists, order[:, None, :], axis=2)
    if labeled:
        cand_labels = jnp.take_along_axis(
            cand_labels, order[:, :, None], axis=1
        )

    # ---- precompute the [B, C, C] occlusion-factor matrix:
    # F[i, j] = get_factor(num=d(j, node), div=d(j, i)) ----
    tie_pair = jnp.abs(
        cand_ids[:, :, None] - cand_ids[:, None, :]
    ).astype(jnp.float32)
    num = dists[:, None, :]  # broadcast over i
    div = pair_dists
    tie_ratio = tie_q[:, None, :] / jnp.maximum(tie_pair, 1.0)
    factor = jnp.where(
        div < _F32_EPS,
        jnp.where(num < _F32_EPS, tie_ratio, _BIG),
        num / jnp.maximum(div, _F32_EPS),
    )

    if labeled and cand_labels.shape[-1] > 0:
        # label_ok[i, j]: picked i occludes j only if
        # labels_i ⊇ (labels_j ∩ node_labels) (graph/mod.rs:452-462).
        label_ok = contains_intersection(
            cand_labels[:, :, None, :],  # self = labels_i -> [B, C, 1, Lm]
            cand_labels[:, None, :, :],  # a = labels_j    -> [B, 1, C, Lm]
            node_labels[:, None, None, :],  # b = node labels
        )
    else:
        label_ok = jnp.ones((b, c, c), dtype=jnp.bool_)

    alphas_arr = jnp.asarray(alphas, dtype=jnp.float32)
    n_alphas = len(alphas)
    col = jnp.arange(c, dtype=jnp.int32)

    f0 = jnp.where(valid, 0.0, _BIG)
    sel0 = jnp.full((b, c), _UNSELECTED, dtype=jnp.int32)
    count0 = jnp.zeros((b,), dtype=jnp.int32)

    def step(s, carry):
        f, sel, count = carry
        alpha = alphas_arr[s // c]
        i = s % c
        can_pick = (
            (count < r)
            & (sel[:, i] == _UNSELECTED)
            & (f[:, i] <= alpha)
            & valid[:, i]
        )
        sel = sel.at[:, i].set(jnp.where(can_pick, count, sel[:, i]))
        count = count + can_pick.astype(jnp.int32)
        upd = can_pick[:, None] & (col > i)[None, :] & label_ok[:, i, :]
        f = jnp.where(upd, jnp.maximum(f, factor[:, i, :]), f)
        f = f.at[:, i].set(jnp.where(can_pick, _BIG, f[:, i]))
        return f, sel, count

    _, sel, _ = lax.fori_loop(0, n_alphas * c, step, (f0, sel0, count0))

    # Extract selected candidates in selection order.
    out_ids = jnp.where(sel != _UNSELECTED, cand_ids, INVALID_ID)
    out_d = jnp.where(sel != _UNSELECTED, dists, jnp.inf)
    _, sorted_ids, sorted_d = lax.sort(
        (sel, out_ids, out_d), dimension=1, num_keys=1
    )
    return sorted_ids[:, :r], sorted_d[:, :r]


def pairwise_hamming_mxu(code_bits: jax.Array) -> jax.Array:
    """Pairwise Hamming distances via the MXU.

    code_bits: f32/bf16[B, C, Db] unpacked 0/1 bits.
    hamming(a, b) = pop(a) + pop(b) - 2 * dot(a, b), so one batched matmul
    on the systolic array replaces C^2 xor-popcount loops.
    Returns f32[B, C, C].
    """
    dots = jnp.einsum(
        "bcd,bed->bce", code_bits, code_bits,
        preferred_element_type=jnp.float32,
    )
    pops = jnp.sum(code_bits.astype(jnp.float32), axis=-1)
    return pops[:, :, None] + pops[:, None, :] - 2.0 * dots


def unpack_code_bits(codes: jax.Array, num_bits: int) -> jax.Array:
    """uint32[..., W] packed codes -> f32[..., num_bits] 0/1 bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (codes[..., None] >> shifts) & jnp.uint32(1)
    flat = bits.reshape(*codes.shape[:-1], codes.shape[-1] * 32)
    return flat[..., :num_bits].astype(jnp.float32)


def pairwise_distance_matrix_full(
    vecs: jax.Array,  # f32/bf16[B, C, D]
    distance_type,
) -> jax.Array:
    """Pairwise full-precision distances among candidates, [B, C, C]."""
    from ..config import DistanceType

    vecs = vecs.astype(jnp.float32)
    dots = jnp.einsum(
        "bcd,bed->bce",
        vecs,
        vecs,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if distance_type == DistanceType.INNER_PRODUCT:
        return -dots
    if distance_type == DistanceType.COSINE:
        return jnp.maximum(1.0 - dots, 0.0)
    sq = jnp.sum(vecs * vecs, axis=-1)
    return jnp.maximum(sq[:, :, None] - 2.0 * dots + sq[:, None, :], 0.0)
