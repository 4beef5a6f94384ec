"""Row-sharded multi-chip index.

The capacity-scaling configuration for corpora larger than one chip's HBM
(BASELINE.md: Cohere-768 50M streaming).  The reference scales the vector
axis with disk-resident pages + compression; the TPU-native analog shards
the store across the device mesh:

- Rows are partitioned round-robin over P shards; each shard holds an
  independent Vamana graph over its rows (codes/adjacency/vectors stacked
  with a leading shard axis, sharded over the mesh's ``n`` axis).
- The SBQ quantizer is trained ONCE globally and shared by all shards —
  the analog of the reference training the quantizer before parallel
  workers launch (build.rs:574-614).
- A query searches all shards simultaneously (``vmap`` over the shard
  axis — XLA SPMD turns the sharded batch dim into per-device compute
  with zero cross-device traffic during traversal) and merges per-shard
  top-k with one small all-gather — collectives ride ICI only at the
  final merge.
- Inserts route round-robin to shards (each shard's insert is the
  single-shard ``aminsert`` path); deletes tombstone in the owning shard.

Per-shard graphs cost P× total traversal work versus one global graph,
but each shard's graph is over N/P rows (shorter searches) and the work
is perfectly parallel — the standard scale-out design for
partitioned ANN serving.
"""

from __future__ import annotations

import functools
import json
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import (
    CHECKPOINT_MAGIC,
    CHECKPOINT_VERSION,
    DistanceType,
    IndexConfig,
    QueryParams,
)
from ..distance import preprocess_cosine
from ..graph.search import beam_search, get_start_ids
from ..index import DiskannIndex, _query_max_iters
from ..labels import make_label_array, overlaps
from ..ops import sbq
from ..store import INVALID_ID, GraphArrays, from_host, to_host


def _stack_arrays(per_shard: list[GraphArrays]) -> GraphArrays:
    """Stack per-shard GraphArrays into leading-axis-P tensors (equal
    capacities required)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_shard)


def _pad_and_stack(shards: list, mesh: Mesh) -> GraphArrays:
    """Equalize per-shard capacities and label-table sizes, then stack."""
    from .. import store
    from ..labels import LABEL_SENTINEL

    cap = max(s.arrays.capacity for s in shards)
    lt = max(s.arrays.label_start_keys.shape[0] for s in shards)
    padded = []
    for s in shards:
        a = store.grow(s.arrays, cap) if s.arrays.capacity < cap else s.arrays
        cur = a.label_start_keys.shape[0]
        if cur < lt:
            a = a._replace(
                label_start_keys=jnp.pad(
                    a.label_start_keys, (0, lt - cur),
                    constant_values=int(LABEL_SENTINEL),
                ),
                label_start_ids=jnp.pad(
                    a.label_start_ids, (0, lt - cur),
                    constant_values=INVALID_ID,
                ),
            )
        padded.append(a)
    return _stack_arrays(padded)


def _shard_leading(tree, mesh: Mesh):
    """Place every leaf with its leading (shard) axis over mesh axis n."""

    def put(x):
        spec = P("n", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "search_list_size",
        "max_iters",
        "distance_type",
        "use_codes",
        "expand_factor",
        "rescore_n",
        "use_exact",
        "filtered",
    ),
)
def _sharded_search_step(
    stacked: GraphArrays,  # leaves [P, ...]
    query_vecs: jax.Array,  # f32[Q, D] (replicated)
    query_codes: jax.Array,  # u32[Q, W]
    query_labels: jax.Array,  # i32[Q, Lq] (Lq == 0 when unfiltered)
    *,
    k: int,
    search_list_size: int,
    max_iters: int,
    distance_type: DistanceType,
    use_codes: bool,
    expand_factor: int,
    rescore_n: int,
    use_exact: bool,
    filtered: bool,
) -> tuple[jax.Array, jax.Array]:
    """All-shard search + exact rescore + cross-shard top-k merge.

    Returns (shard_local_ids i32[Q, k] encoded as shard * cap + local,
    dists f32[Q, k]).  The vmapped body partitions over the sharded
    leading axis; the final merge is the only cross-device step.
    """
    q = query_vecs.shape[0]
    cap = stacked.adjacency.shape[1]

    def per_shard(arrays: GraphArrays):
        starts = get_start_ids(
            arrays, query_labels if filtered else None, q
        )
        res = beam_search(
            arrays,
            query_vecs,
            query_codes,
            query_labels,
            starts,
            search_list_size=search_list_size,
            max_iters=max_iters,
            distance_type=distance_type,
            use_codes=use_codes,
            filtered=filtered,
            expand_factor=expand_factor,
        )
        live = (res.beam_ids != INVALID_ID) & ~arrays.deleted[
            jnp.maximum(res.beam_ids, 0)
        ]
        if filtered and query_labels.shape[-1] > 0:
            node_l = arrays.node_labels[jnp.maximum(res.beam_ids, 0)]
            live = live & overlaps(node_l, query_labels[:, None, :])
        d = jnp.where(live, res.beam_dists, jnp.inf)
        ids = jnp.where(live, res.beam_ids, INVALID_ID)
        d, ids = lax.sort((d, ids), dimension=1, num_keys=1)
        m = min(rescore_n + k, ids.shape[1]) if use_exact else k
        top_ids = ids[:, :m]
        top_d = d[:, :m]
        if use_exact:
            vecs = arrays.vectors[jnp.maximum(top_ids, 0)]
            if distance_type == DistanceType.L2:
                diff = vecs - query_vecs[:, None, :]
                exact = jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0)
            else:
                dots = jnp.einsum(
                    "qmd,qd->qm",
                    vecs,
                    query_vecs,
                    preferred_element_type=jnp.float32,
                )
                exact = (
                    -dots
                    if distance_type == DistanceType.INNER_PRODUCT
                    else jnp.maximum(1.0 - dots, 0.0)
                )
            exact = jnp.where(top_ids == INVALID_ID, jnp.inf, exact)
            exact = jnp.where(top_d == jnp.inf, jnp.inf, exact)
            top_d, top_ids = lax.sort(
                (exact, top_ids), dimension=1, num_keys=1
            )
        return top_ids[:, :k], top_d[:, :k]

    ids_pqk, d_pqk = jax.vmap(per_shard)(stacked)  # [P, Q, k]
    p = ids_pqk.shape[0]
    # Encode global slot = shard * cap + local id; merge across shards.
    shard_off = (
        jnp.arange(p, dtype=jnp.int32)[:, None, None] * cap
    )
    gids = jnp.where(ids_pqk >= 0, ids_pqk + shard_off, INVALID_ID)
    all_ids = jnp.transpose(gids, (1, 0, 2)).reshape(q, p * k)
    all_d = jnp.transpose(d_pqk, (1, 0, 2)).reshape(q, p * k)
    sd, sids = lax.sort((all_d, all_ids), dimension=1, num_keys=1)
    return sids[:, :k], sd[:, :k]


class ShardedDiskannIndex:
    """A DiskANN index row-sharded over a device mesh."""

    def __init__(
        self,
        config: IndexConfig,
        mesh: Mesh,
        stacked: GraphArrays,
        sbq_stats: sbq.SbqStats,
        external_ids: list[np.ndarray],  # per shard
    ):
        self.config = config
        self.mesh = mesh
        self.stacked = stacked
        self.sbq_stats = sbq_stats
        self.external_ids = external_ids
        self._next_shard = 0

    @property
    def num_shards(self) -> int:
        return self.stacked.adjacency.shape[0]

    @property
    def shard_capacity(self) -> int:
        return self.stacked.adjacency.shape[1]

    @property
    def count(self) -> int:
        return int(np.asarray(self.stacked.count).sum())

    # ------------------------------------------------------------------

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        config: IndexConfig,
        mesh: Mesh,
        *,
        labels: Optional[Sequence[Optional[Iterable[int]]]] = None,
        external_ids: Optional[np.ndarray] = None,
    ) -> "ShardedDiskannIndex":
        vectors = np.asarray(vectors, dtype=np.float32)
        n = vectors.shape[0]
        p = mesh.devices.size
        if external_ids is None:
            external_ids = np.arange(n, dtype=np.int64)
        if labels is not None and not config.has_labels:
            raise ValueError(
                "labels passed but config.max_labels_per_vector == 0"
            )
        labels_list = list(labels) if labels is not None else None

        # Global quantizer training (one pass; shards share the stats).
        dev = jnp.asarray(vectors)
        if config.distance_type == DistanceType.COSINE:
            dev = preprocess_cosine(dev)
        stats = (
            sbq.train(dev[:, : config.dims_to_index])
            if config.uses_sbq and n > 0
            else None
        )

        # Round-robin partition, per-shard local builds.  Round-robin keeps
        # every label class represented in every shard, so per-shard label
        # start nodes stay meaningful.
        shards = []
        ext = []
        for s in range(p):
            rows = np.arange(s, n, p)
            sub = DiskannIndex.build(
                vectors[rows],
                config,
                labels=(
                    [labels_list[r] for r in rows]
                    if labels_list is not None
                    else None
                ),
                external_ids=external_ids[rows],
                sbq_stats=stats,
            )
            shards.append(sub)
            ext.append(sub.external_ids)

        stacked = _shard_leading(_pad_and_stack(shards, mesh), mesh)
        if stats is None:
            from ..index import _empty_stats

            stats = _empty_stats(config.dims_to_index)
        return cls(config, mesh, stacked, stats, ext)

    # ------------------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,
        k: int,
        params: Optional[QueryParams] = None,
        *,
        query_labels: Optional[Sequence[Optional[Iterable[int]]]] = None,
        max_label_width: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched top-k over all shards.  Returns (global slot ids, dists);
        map ids with ``to_external``."""
        params = params or QueryParams()
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        config = self.config
        if queries.shape[1] != config.num_dimensions:
            raise ValueError(
                f"query dimension {queries.shape[1]} != index dimension "
                f"{config.num_dimensions}"
            )
        qv = jnp.asarray(queries)
        if config.distance_type == DistanceType.COSINE:
            qv = preprocess_cosine(qv)
        q_indexed = qv[:, : config.dims_to_index]
        if config.uses_sbq:
            qc = sbq.encode(
                q_indexed, self.sbq_stats, config.bits_per_dimension
            )
        else:
            qc = jnp.zeros((queries.shape[0], 0), dtype=jnp.uint32)

        filtered = query_labels is not None
        if filtered:
            width = max_label_width or config.max_labels_per_vector
            ql = jnp.asarray(make_label_array(list(query_labels), width))
        else:
            ql = jnp.zeros((queries.shape[0], 0), dtype=jnp.int32)

        l = max(params.search_list_size, k)
        use_exact = params.rescore > 0 and (
            config.uses_sbq
            or config.dims_to_index < config.num_dimensions
        )
        # Beam wide enough for the rescore window (see DiskannIndex.search).
        beam_width = max(l, params.rescore + k if use_exact else 0)
        ids, dists = _sharded_search_step(
            self.stacked,
            q_indexed if not use_exact else qv,
            qc,
            ql,
            k=k,
            search_list_size=beam_width,
            max_iters=_query_max_iters(l),
            distance_type=config.distance_type,
            use_codes=config.uses_sbq,
            expand_factor=min(params.expand, l),
            rescore_n=params.rescore,
            use_exact=use_exact,
            filtered=filtered,
        )
        return np.asarray(ids), np.asarray(dists)

    def to_external(self, ids: np.ndarray) -> np.ndarray:
        """Global slot ids (shard * cap + local) -> external ids."""
        cap = self.shard_capacity
        out = np.full(ids.shape, -1, dtype=np.int64)
        flat = ids.reshape(-1)
        res = out.reshape(-1)
        for i, g in enumerate(flat):
            if g >= 0:
                res[i] = self.external_ids[g // cap][g % cap]
        return out

    # ------------------------------------------------------------------

    def add(
        self,
        vectors: np.ndarray,
        external_ids: Optional[np.ndarray] = None,
        *,
        labels: Optional[Sequence[Optional[Iterable[int]]]] = None,
    ) -> None:
        """Round-robin insert into shards (single-shard aminsert path per
        shard).  Rebuilds the stacked tensors afterwards."""
        vectors = np.asarray(vectors, dtype=np.float32)
        m = vectors.shape[0]
        if m == 0:
            return
        if external_ids is None:
            base = max(
                (int(e.max()) + 1 for e in self.external_ids if len(e)),
                default=0,
            )
            external_ids = np.arange(base, base + m, dtype=np.int64)
        labels_list = list(labels) if labels is not None else None
        p = self.num_shards
        shards = self._unstack()
        for j, sub in enumerate(shards):
            rows = np.arange((j - self._next_shard) % p, m, p)
            if len(rows):
                sub.add(
                    vectors[rows],
                    external_ids=external_ids[rows],
                    labels=(
                        [labels_list[r] for r in rows]
                        if labels_list is not None
                        else None
                    ),
                )
        self._next_shard = (self._next_shard + m) % p
        self._restack(shards)

    def delete_external(self, ext_ids: np.ndarray) -> None:
        shards = self._unstack()
        for sub in shards:
            sub.delete_external(ext_ids)
        self._restack(shards)

    # ------------------------------------------------------------------
    # Persistence (one file holding every shard + shared state)
    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        host = to_host(self.stacked)
        payload = {
            "magic": np.int64(CHECKPOINT_MAGIC),
            "version": np.int64(CHECKPOINT_VERSION),
            "sharded": np.int64(1),
            "num_shards": np.int64(self.num_shards),
            "config": np.frombuffer(
                json.dumps(self.config.to_dict()).encode(), dtype=np.uint8
            ),
            "sbq_count": np.asarray(self.sbq_stats.count),
            "sbq_mean": np.asarray(self.sbq_stats.mean),
            "sbq_m2": np.asarray(self.sbq_stats.m2),
        }
        for name, leaf in zip(type(host)._fields, host):
            payload[f"stacked_{name}"] = leaf
        for s, ext in enumerate(self.external_ids):
            payload[f"ext_{s}"] = ext
        np.savez_compressed(path, **payload)

    @classmethod
    def load(cls, path: str, mesh: Mesh) -> "ShardedDiskannIndex":
        from ..store import HostArrays

        with np.load(path) as z:
            if int(z["magic"]) != CHECKPOINT_MAGIC:
                raise ValueError("not a pgvectorscale_tpu checkpoint")
            if int(z.get("sharded", 0)) != 1:
                raise ValueError(
                    "not a sharded checkpoint; use DiskannIndex.load"
                )
            if int(z["version"]) > CHECKPOINT_VERSION:
                raise ValueError("checkpoint version newer than supported")
            p = int(z["num_shards"])
            if mesh.devices.size != p:
                raise ValueError(
                    f"checkpoint has {p} shards; mesh has "
                    f"{mesh.devices.size} devices"
                )
            config = IndexConfig.from_dict(
                json.loads(bytes(z["config"]).decode())
            )
            host = HostArrays(
                *[z[f"stacked_{name}"] for name in HostArrays._fields]
            )
            stats = sbq.SbqStats(
                count=jnp.asarray(z["sbq_count"]),
                mean=jnp.asarray(z["sbq_mean"]),
                m2=jnp.asarray(z["sbq_m2"]),
            )
            ext = [z[f"ext_{s}"].copy() for s in range(p)]
        stacked = _shard_leading(from_host(host), mesh)
        return cls(config, mesh, stacked, stats, ext)

    def _unstack(self) -> list[DiskannIndex]:
        host = to_host(self.stacked)
        shards = []
        for s in range(self.num_shards):
            arrays = from_host(
                type(host)(*[leaf[s] for leaf in host])
            )
            shards.append(
                DiskannIndex(
                    self.config, arrays, self.sbq_stats, self.external_ids[s]
                )
            )
        return shards

    def _restack(self, shards: list[DiskannIndex]) -> None:
        self.stacked = _shard_leading(_pad_and_stack(shards, self.mesh), self.mesh)
        self.external_ids = [s.external_ids for s in shards]
