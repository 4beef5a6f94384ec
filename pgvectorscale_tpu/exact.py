"""Exact (brute-force) index.

The analog of the sequential-scan plan Postgres falls back to when the
diskann index is unusable (amcostestimate returns infinite cost without an
ORDER BY — cost_estimate.rs:6-50) and of the seqscan ground truth the
reference's tests compare against.  One MXU distance batch + top-k; exact
by construction, O(N) per query — the right tool below ~100k rows or for
recall measurement.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import DistanceType, IndexConfig
from .distance import preprocess_cosine
from .ops.bruteforce import brute_force_search


class ExactIndex:
    """Flat exact-search index with the same surface as DiskannIndex's
    core (build/add/search/delete/to_external)."""

    def __init__(self, config: IndexConfig):
        self.config = config
        self._vectors: Optional[jax.Array] = None
        self._deleted: Optional[jax.Array] = None
        self.external_ids = np.zeros((0,), dtype=np.int64)

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        config: Optional[IndexConfig] = None,
        *,
        external_ids: Optional[np.ndarray] = None,
    ) -> "ExactIndex":
        vectors = np.asarray(vectors, dtype=np.float32)
        if config is None:
            config = IndexConfig(num_dimensions=vectors.shape[1])
        index = cls(config)
        index.add(vectors, external_ids=external_ids)
        return index

    @property
    def count(self) -> int:
        return 0 if self._vectors is None else self._vectors.shape[0]

    def add(
        self,
        vectors: np.ndarray,
        *,
        external_ids: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        vectors = np.asarray(vectors, dtype=np.float32)
        m = vectors.shape[0]
        if vectors.ndim != 2 or vectors.shape[1] != self.config.num_dimensions:
            raise ValueError("vectors must be [M, num_dimensions]")
        dev = jnp.asarray(vectors)
        if self.config.distance_type == DistanceType.COSINE:
            dev = preprocess_cosine(dev)
        n0 = self.count
        if self._vectors is None:
            self._vectors = dev
            self._deleted = jnp.zeros((m,), dtype=bool)
        else:
            self._vectors = jnp.concatenate([self._vectors, dev], axis=0)
            self._deleted = jnp.concatenate(
                [self._deleted, jnp.zeros((m,), dtype=bool)]
            )
        if external_ids is None:
            base = (
                int(self.external_ids.max()) + 1
                if len(self.external_ids)
                else 0
            )
            external_ids = np.arange(base, base + m, dtype=np.int64)
        self.external_ids = np.concatenate(
            [self.external_ids, np.asarray(external_ids, dtype=np.int64)]
        )
        return np.arange(n0, n0 + m, dtype=np.int32)

    def delete(self, ids: np.ndarray) -> None:
        ids = np.asarray(ids, dtype=np.int32)
        if len(ids) == 0:
            return
        if (ids < 0).any() or (ids >= self.count).any():
            raise ValueError("delete ids out of range")
        self._deleted = self._deleted.at[jnp.asarray(ids)].set(True)

    def search(
        self, queries: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if self.count == 0:
            q = queries.shape[0]
            return (
                np.full((q, k), -1, dtype=np.int32),
                np.full((q, k), np.inf, dtype=np.float32),
            )
        qv = jnp.asarray(queries)
        if self.config.distance_type == DistanceType.COSINE:
            qv = preprocess_cosine(qv)
        ids, dists = brute_force_search(
            qv,
            self._vectors,
            ~self._deleted,
            k=min(k, self.count),
            distance_type=self.config.distance_type,
        )
        ids_np = np.asarray(ids)
        d_np = np.asarray(dists)
        if k > self.count:
            pad = k - self.count
            ids_np = np.pad(ids_np, ((0, 0), (0, pad)), constant_values=-1)
            d_np = np.pad(
                d_np, ((0, 0), (0, pad)), constant_values=np.inf
            )
        # Deleted rows surface as inf distance; mask their ids.
        ids_np = np.where(np.isinf(d_np), -1, ids_np)
        return ids_np, d_np

    def to_external(self, ids: np.ndarray) -> np.ndarray:
        out = np.full(ids.shape, -1, dtype=np.int64)
        mask = ids >= 0
        out[mask] = self.external_ids[ids[mask]]
        return out
