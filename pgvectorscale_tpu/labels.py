"""Label sets for filtered search.

TPU-native equivalent of the reference's label machinery
(reference: pgvectorscale/src/access_method/labels/mod.rs).  The reference
stores a sorted, deduplicated ``Vec<i16>`` per node and uses merge-based set
algebra; we store a fixed-width padded int32 list per node (structure of
arrays) so that label tests vectorize on the VPU:

- ``overlaps``            <-> LabelSet::overlaps (labels/mod.rs:124-142)
- ``contains_intersection`` <-> LabelSet::contains_intersection — "is a∩b ⊆
  self" (labels/mod.rs:85-111), used for label-aware pruning
- ``array_overlap``       <-> smallint_array_overlap, the ``&&`` operator
  (access_method/mod.rs:284-317)

Padding sentinel is INT32_MAX, which is outside the smallint label domain.
NULL/empty label arrays become all-sentinel rows (empty sets), matching the
reference's NULL handling (labels/mod.rs:181-238).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LABEL_SENTINEL = np.int32(2**31 - 1)

# Reference labels are Postgres smallint (i16); enforce the same bounds
# (the reference's "label bounds" test, labels/filtering_tests.rs).
LABEL_MIN = -(2**15)
LABEL_MAX = 2**15 - 1


def make_label_array(
    label_sets: Sequence[Optional[Iterable[int]]],
    max_labels: int,
) -> np.ndarray:
    """Host-side: list of per-vector label iterables (or None) ->
    int32[N, max_labels] sorted/deduped/padded rows."""
    n = len(label_sets)
    out = np.full((n, max_labels), LABEL_SENTINEL, dtype=np.int32)
    for row, labels in enumerate(label_sets):
        if labels is None:
            continue
        vals = sorted(set(int(v) for v in labels))
        for v in vals:
            if not (LABEL_MIN <= v <= LABEL_MAX):
                raise ValueError(
                    f"label {v} out of smallint range [{LABEL_MIN}, {LABEL_MAX}]"
                )
        if len(vals) > max_labels:
            raise ValueError(
                f"vector has {len(vals)} labels; index supports at most "
                f"{max_labels} (max_labels_per_vector)"
            )
        out[row, : len(vals)] = np.asarray(vals, dtype=np.int32)
    return out


def is_valid(labels: jax.Array) -> jax.Array:
    """Mask of real (non-padding) entries."""
    return labels != LABEL_SENTINEL


def is_empty(labels: jax.Array) -> jax.Array:
    """True where a label set (last axis) is empty."""
    return jnp.all(labels == LABEL_SENTINEL, axis=-1)


def overlaps(a: jax.Array, b: jax.Array) -> jax.Array:
    """Do label sets share any element?  a: [..., La], b: [..., Lb] ->
    bool[...].  Empty sets overlap nothing (labels/mod.rs:124-142)."""
    eq = a[..., :, None] == b[..., None, :]
    valid = is_valid(a)[..., :, None] & is_valid(b)[..., None, :]
    return jnp.any(eq & valid, axis=(-2, -1))


def contains_intersection(
    self_labels: jax.Array,
    a: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """Is (a ∩ b) ⊆ self_labels?  (labels/mod.rs:85-111).

    Shapes broadcast over leading dims; label axes may differ in width.
    Vacuously true when a ∩ b is empty.
    """
    # For each element of a: is it in b?
    a_in_b = jnp.any(
        (a[..., :, None] == b[..., None, :]) & is_valid(b)[..., None, :],
        axis=-1,
    ) & is_valid(a)
    # For each element of a: is it in self?
    a_in_self = jnp.any(
        (a[..., :, None] == self_labels[..., None, :])
        & is_valid(self_labels)[..., None, :],
        axis=-1,
    )
    # Every element of a that is in b must be in self.
    return jnp.all(~a_in_b | a_in_self, axis=-1)


def array_overlap(left: Sequence[int], right: Sequence[int]) -> bool:
    """Host-side ``&&`` operator (smallint_array_overlap,
    access_method/mod.rs:284-317)."""
    if len(left) <= 10 or len(right) <= 10:
        return any(l == r for l in left for r in right)
    return bool(set(left) & set(right))
