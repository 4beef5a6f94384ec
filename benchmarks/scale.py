"""Beyond-1M single-chip scale benchmark (VERDICT r4 missing #2).

The 50M-per-pod story (docs/DESIGN.md "Memory budget") rested on
arithmetic; this config measures a real half-decade step on the one chip
available: SCALE_N (default 5M) x 768d cosine, SBQ 1-bit, int8 vector
tier — the capacity configuration the budget table says fits ~1.1 KB/row
padded (~9 GB at 5M on a 16 GB v5e).  Emits build time, measured HBM
occupancy, and a recall@10/QPS sweep as JSON lines.

Ground truth is exact and computed CHUNKED against the f32 corpus
(uploaded a slice at a time — the full f32 corpus is 15 GB and can never
co-reside with the index), with a device-side running top-k merge.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/scale.py
Env:  SCALE_N (rows, default 5_000_000), SCALE_Q (queries, default 1024),
      SCALE_WAVE (insert wave rows, default 2048 — at 5M the store holds
      ~9 GB of HBM and a 4096-row wave's exact-prune transients
      ([B, C, 768] f32 gathers + [B, C, C] occlusion) overflow the
      16 GB chip; 2048 halves the transient peak at modest build cost).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

logging.basicConfig(
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    level=logging.INFO,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache_tpu")
)


def _emit(obj):
    print(json.dumps(obj))
    sys.stdout.flush()


def _status(msg):
    stamp = time.strftime("%H:%M:%S")
    print(f"[scale {stamp}] {msg}", file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("SCALE_N", 5_000_000))
    q = int(os.environ.get("SCALE_Q", 1024))
    k = 10

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from pgvectorscale_tpu import (
        DiskannIndex,
        DistanceType,
        IndexConfig,
        QueryParams,
    )
    from pgvectorscale_tpu.distance import distance_matrix, preprocess_cosine
    from pgvectorscale_tpu.io.datasets import synthetic_corpus
    from pgvectorscale_tpu.utils.sync import device_sync

    _emit({"config": "scale", "n": n, "q": q, "dims": 768,
           "bits": 1, "vector_dtype": "int8",
           "device": str(jax.devices()[0])})

    # Corpus is deterministic in (n, q, seed) and costs ~7-15 min of
    # single-core matmul at 5M; cache it on disk so a tunnel outage
    # mid-run doesn't pay generation again on retry.
    t0 = time.perf_counter()
    corpus_cache = f"/tmp/scale_corpus_cohere_{n}_{q}_s42.npz"
    if os.path.exists(corpus_cache):
        z = np.load(corpus_cache)
        vectors, queries = z["v"], z["q"]
        _status(f"corpus loaded from cache in "
                f"{time.perf_counter() - t0:.0f}s")
    else:
        vectors, queries = synthetic_corpus("cohere", n, q, seed=42)
        np.savez(corpus_cache, v=vectors, q=queries)
        _status(f"corpus generated in {time.perf_counter() - t0:.0f}s "
                f"({vectors.nbytes / 1e9:.1f} GB host)")

    # ---- exact ground truth, chunked over corpus rows ----
    # Running top-k state [Q, k] merges each chunk's top-k; only one
    # ~768 MB f32 slice is device-resident at a time.
    dq = preprocess_cosine(jnp.asarray(queries))
    chunk = 262_144

    @jax.jit
    def gt_chunk(best_d, best_i, rows, i0, qs, total):
        d = distance_matrix(qs, preprocess_cosine(rows),
                            DistanceType.COSINE)
        # Tail-pad rows are masked out by GLOBAL id (cosine normalizes any
        # fill value onto the unit sphere, so a magnitude fill can't work).
        col = i0 + jnp.arange(rows.shape[0], dtype=jnp.int64)
        d = jnp.where((col < total)[None, :], d, jnp.inf)
        nd, ni = jax.lax.top_k(-d, k)
        cd = jnp.concatenate([best_d, -nd], axis=1)
        ci = jnp.concatenate([best_i, ni.astype(jnp.int64) + i0], axis=1)
        order = jnp.argsort(cd, axis=1)[:, :k]
        return (
            jnp.take_along_axis(cd, order, axis=1),
            jnp.take_along_axis(ci, order, axis=1),
        )

    # GT is deterministic in (seed, n, q) and costs ~15 min at 5M; cache it
    # on disk so an OOM later in the run (or a parameter retry) does not
    # pay it again.
    gt_cache = f"/tmp/scale_gt_cohere_{n}_{q}_s42.npy"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
        _emit({"phase": "ground-truth", "seconds": 0.0, "cached": True})
    else:
        t0 = time.perf_counter()
        best_d = jnp.full((q, k), jnp.inf, jnp.float32)
        best_i = jnp.full((q, k), -1, jnp.int64)
        total = jnp.asarray(n, jnp.int64)
        for i0 in range(0, n, chunk):
            rows = jnp.asarray(vectors[i0 : i0 + chunk])
            if rows.shape[0] < chunk:  # pad tail: keep one compiled shape
                pad = chunk - rows.shape[0]
                rows = jnp.concatenate(
                    [rows, jnp.ones((pad, rows.shape[1]), jnp.float32)]
                )
            best_d, best_i = gt_chunk(
                best_d, best_i, rows, jnp.asarray(i0, jnp.int64), dq, total
            )
            if (i0 // chunk) % 4 == 0:
                _status(f"gt chunk {i0}/{n}")
        gt = np.asarray(best_i)
        assert (gt < n).all() and (gt >= 0).all()
        np.save(gt_cache, gt)
        _emit({"phase": "ground-truth", "seconds":
               round(time.perf_counter() - t0, 1), "chunk_rows": chunk})

    # ---- build ----
    config = IndexConfig(
        num_dimensions=768,
        distance_type=DistanceType.COSINE,
        num_bits_per_dimension=1,
        vector_dtype="int8",
    )
    wave = int(os.environ.get("SCALE_WAVE", 2048))
    last = [0.0]

    def progress(phase, done, total_rows):
        now = time.perf_counter()
        if now - last[0] > 60 or done >= total_rows:
            last[0] = now
            _status(f"{phase}: {done}/{total_rows}")

    t0 = time.perf_counter()
    index = DiskannIndex.build(
        vectors, config, max_wave=wave, progress_callback=progress
    )
    device_sync(index.arrays.adjacency)
    build_s = time.perf_counter() - t0
    mem = jax.local_devices()[0].memory_stats() or {}
    _emit({
        "phase": "build",
        "n": n,
        "wave": wave,
        "seconds": round(build_s, 1),
        "vectors_per_sec": round(n / build_s, 1),
        "hbm_bytes_in_use": int(mem.get("bytes_in_use", -1)),
        "hbm_gb_in_use": round(mem.get("bytes_in_use", 0) / 2**30, 2),
        "hbm_limit_gb": round(mem.get("bytes_limit", 0) / 2**30, 2),
    })
    del vectors  # 15 GB host

    def recall(ids):
        hits = sum(
            len(set(gt[r]) & set(int(i) for i in ids[r][:k] if i >= 0))
            for r in range(q)
        )
        return hits / (q * k)

    for L, resc, e, strat, vf in [
        (100, 150, 4, "expand", 1.0),
        (150, 300, 2, "expand", 1.0),
        (150, 600, 2, "expand", 2.0),
        (300, 1500, 2, "expand", 2.0),
        (300, 1500, 2, "beam", 2.0),
    ]:
        params = QueryParams(search_list_size=L, rescore=resc, expand=e,
                             window_strategy=strat, visit_factor=vf)
        index.search(queries, k=k, params=params)  # warm/compile
        ts = []
        ids = None
        for _ in range(5):
            t0 = time.perf_counter()
            ids, _d = index.search(queries, k=k, params=params)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _emit({"L": L, "rescore": resc, "expand": e, "strategy": strat,
               "visit_factor": vf,
               "qps": round(q / ts[len(ts) // 2], 1),
               "recall": round(recall(ids), 4),
               "qps_min": round(q / ts[-1], 1),
               "qps_max": round(q / ts[0], 1), "reps": 5})


if __name__ == "__main__":
    main()
