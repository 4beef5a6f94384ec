"""BASELINE.md config #3: Cohere-768-like 1M, SBQ 1-bit + rescore sweep.

Demonstrates the memory-tier story on one chip: 1-bit codes + bf16
full-precision tier + the edge-code cache fit a single 16 GB device
(docs/DESIGN.md "Memory budget").

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/cohere1m.py
Env knobs:   C1M_N (default 1_000_000), C1M_Q (default 2048).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tpu",
    ),
)


def main():
    n = int(os.environ.get("C1M_N", 1_000_000))
    q = int(os.environ.get("C1M_Q", 2048))
    k = 10

    import jax
    import jax.numpy as jnp
    from jax import lax

    # Env var alone is not honored under the axon sitecustomize (jax is
    # imported at interpreter startup); config.update is authoritative.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pgvectorscale_tpu import (
        DiskannIndex,
        DistanceType,
        IndexConfig,
        QueryParams,
    )
    from pgvectorscale_tpu.utils.sync import device_sync
    from pgvectorscale_tpu.distance import preprocess_cosine
    from pgvectorscale_tpu.io.datasets import synthetic_corpus

    vectors, queries = synthetic_corpus("cohere", n, q, seed=42)
    config = IndexConfig(
        num_dimensions=768,
        distance_type=DistanceType.COSINE,
        num_bits_per_dimension=1,
        vector_dtype="bf16",
    )
    t0 = time.perf_counter()
    index = DiskannIndex.build(vectors, config)
    device_sync(index.arrays.adjacency)
    build_s = time.perf_counter() - t0
    print(
        json.dumps(
            {"phase": "build", "n": n, "seconds": round(build_s, 1),
             "vectors_per_sec": round(n / build_s, 1)}
        )
    )
    sys.stdout.flush()

    dv = preprocess_cosine(jnp.asarray(vectors))
    dq = preprocess_cosine(jnp.asarray(queries))

    # Chunk queries: a single [Q, N] score tensor at Q=2048, N=1M is 8 GB
    # and does not fit alongside the index.
    @jax.jit
    def exact_topk(qs, dv):
        dots = jnp.dot(qs, dv.T, preferred_element_type=jnp.float32)
        _, ids = lax.top_k(dots, k)
        return ids

    gt = np.concatenate(
        [
            np.asarray(exact_topk(dq[i : i + 256], dv))
            for i in range(0, q, 256)
        ],
        axis=0,
    )
    del dv, dq

    # Query sub-batches: at 768d the [Qb, rescore, D] rescore gathers are
    # the peak search temp; Qb=512 keeps the search program + the store +
    # the edge-code cache inside 16 GB HBM at 1M rows.
    qb = 512

    def search_all(params):
        out = []
        for i in range(0, q, qb):
            ids, _ = index.search(queries[i : i + qb], k=k, params=params)
            out.append(ids)
        return np.concatenate(out, axis=0)

    for L, resc, e in [(100, 50, 4), (150, 300, 2), (200, 400, 2),
                       (300, 600, 2)]:
        params = QueryParams(search_list_size=L, rescore=resc, expand=e)
        search_all(params)  # warm
        ts, ids = [], None
        for _ in range(5):
            t0 = time.perf_counter()
            ids = search_all(params)
            ts.append(time.perf_counter() - t0)
        hits = sum(
            len(set(gt[r]) & set(int(i) for i in ids[r] if i >= 0))
            for r in range(q)
        )
        print(
            json.dumps(
                {"L": L, "rescore": resc, "expand": e,
                 "qps": round(q / sorted(ts)[len(ts) // 2], 1),
                 "recall": round(hits / (q * k), 4)}
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
