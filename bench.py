"""Headline benchmark: batched ANN query throughput at high recall.

Mirrors the reference's operating point (num_neighbors=50,
search_list_size=100, SBQ 2-bit, rescore=50 — README.md:325-332,388) on a
synthetic low-rank Cohere-like corpus, and reports batched query throughput
on one chip.

Prints ONE JSON line:
  {"metric": "qps@recall", "value": <QPS>, "unit": "queries/sec",
   "vs_baseline": <QPS / 10_000>, ...extras}

``vs_baseline`` is normalized against a nominal 10k QPS for the reference
CPU extension at the same recall on a large multicore box (the reference
publishes only relative numbers vs Pinecone — README.md:17-21 — so this is
the comparison anchor recorded in BASELINE.md).

Environment knobs: BENCH_N (default 100_000), BENCH_Q (default 2048),
BENCH_D (default 128).
"""

import json
import os
import time

import numpy as np

# Persistent compile cache: wave/search kernels have a handful of fixed
# shapes; caching makes repeat bench runs compile-free.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
)


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    q = int(os.environ.get("BENCH_Q", 2048))
    d = int(os.environ.get("BENCH_D", 128))
    k = 10

    import jax
    import jax.numpy as jnp

    from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams
    from pgvectorscale_tpu.distance import preprocess_cosine
    from pgvectorscale_tpu.ops.bruteforce import brute_force_search

    rng = np.random.default_rng(42)
    rank = 48  # realistic effective rank for embedding corpora
    basis = rng.standard_normal((rank, d)).astype(np.float32)
    vectors = rng.standard_normal((n, rank)).astype(np.float32) @ basis
    queries = rng.standard_normal((q, rank)).astype(np.float32) @ basis

    config = IndexConfig(num_dimensions=d, distance_type=DistanceType.COSINE)

    t0 = time.perf_counter()
    index = DiskannIndex.build(vectors, config)
    jax.block_until_ready(index.arrays.adjacency)
    build_s = time.perf_counter() - t0
    build_vps = n / build_s

    params = QueryParams(search_list_size=100, rescore=50)

    # Warmup (compile) then timed runs; median defends against the high
    # run-to-run variance of shared/tunneled TPU access.
    ids, dists = index.search(queries, k=k, params=params)
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        ids, dists = index.search(queries, k=k, params=params)
        samples.append(time.perf_counter() - t0)
    elapsed = sorted(samples)[len(samples) // 2]
    qps = q / elapsed

    # Recall vs exact ground truth (on device).
    dev_vectors = preprocess_cosine(jnp.asarray(vectors))
    dev_queries = preprocess_cosine(jnp.asarray(queries))
    valid = jnp.ones((n,), dtype=bool)
    gt_ids, _ = brute_force_search(
        dev_queries, dev_vectors, valid, k=k,
        distance_type=DistanceType.COSINE,
    )
    gt_ids = np.asarray(gt_ids)
    hits = sum(
        len(set(gt_ids[r]) & set(int(i) for i in ids[r] if i >= 0))
        for r in range(q)
    )
    recall = hits / (q * k)

    print(
        json.dumps(
            {
                "metric": "qps@recall",
                "value": round(qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(qps / 10_000.0, 3),
                "recall_at_10": round(recall, 4),
                "build_vectors_per_sec": round(build_vps, 1),
                "n": n,
                "dims": d,
                "batch": q,
                "device": str(jax.devices()[0].platform),
            }
        )
    )


if __name__ == "__main__":
    main()
