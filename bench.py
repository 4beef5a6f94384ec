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

Environment knobs: BENCH_N (default 100_000), BENCH_Q (default 8192),
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
    q = int(os.environ.get("BENCH_Q", 8192))
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

    # First build absorbs the one-time XLA compiles (wave/ingest/finalize
    # programs — persisted to the compile cache); the second, same-shape
    # build measures steady-state throughput, which is what an operator
    # sees for every build after the first on a warm serving fleet.
    t0 = time.perf_counter()
    index = DiskannIndex.build(vectors, config)
    jax.block_until_ready(index.arrays.adjacency)
    build_cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    index = DiskannIndex.build(vectors, config)
    jax.block_until_ready(index.arrays.adjacency)
    build_s = time.perf_counter() - t0
    build_vps = n / build_s

    # Exact ground truth (on device) for recall measurement.
    dev_vectors = preprocess_cosine(jnp.asarray(vectors))
    dev_queries = preprocess_cosine(jnp.asarray(queries))
    valid = jnp.ones((n,), dtype=bool)
    gt_ids, _ = brute_force_search(
        dev_queries, dev_vectors, valid, k=k,
        distance_type=DistanceType.COSINE,
    )
    gt_ids = np.asarray(gt_ids)

    def measure(params):
        index.search(queries, k=k, params=params)  # warmup/compile
        samples = []
        ids = None
        # Median-of-5 defends against tunneled-TPU run-to-run variance.
        for _ in range(5):
            t0 = time.perf_counter()
            ids, _ = index.search(queries, k=k, params=params)
            samples.append(time.perf_counter() - t0)
        qps = q / sorted(samples)[len(samples) // 2]
        hits = sum(
            len(set(gt_ids[r]) & set(int(i) for i in ids[r] if i >= 0))
            for r in range(q)
        )
        return qps, hits / (q * k)

    # Operating-point sweep: report the fastest point achieving >= 0.9
    # recall@10 (the reference's headline is QPS at high recall;
    # README.md:17-21).  Reference defaults (L=100, rescore=50) included.
    # The 2-bit SBQ quantizer ordering caps recall ~0.70 at rescore=50 on
    # this corpus (measured brute-force ceiling), so the >=0.9 operating
    # points carry a wider rescore window.
    sweep = [
        QueryParams(search_list_size=100, rescore=50),
        QueryParams(search_list_size=100, rescore=200, expand=2),
        QueryParams(search_list_size=150, rescore=200, expand=2),
        QueryParams(search_list_size=150, rescore=300, expand=2),
        QueryParams(search_list_size=200, rescore=400, expand=2),
        QueryParams(search_list_size=300, rescore=700, expand=2),
    ]
    points = []
    for params in sweep:
        qps, recall = measure(params)
        points.append(
            {
                "L": params.search_list_size,
                "rescore": params.rescore,
                "expand": params.expand,
                "qps": round(qps, 1),
                "recall": round(recall, 4),
            }
        )
        if recall >= 0.95:
            break
    passing = [p for p in points if p["recall"] >= 0.9]
    best = (
        max(passing, key=lambda p: p["qps"])
        if passing
        else max(points, key=lambda p: p["recall"])
    )

    print(
        json.dumps(
            {
                "metric": "qps@recall>=0.9",
                "value": best["qps"],
                "unit": "queries/sec",
                "vs_baseline": round(best["qps"] / 10_000.0, 3),
                "recall_at_10": best["recall"],
                "operating_point": {"L": best["L"], "rescore": best["rescore"]},
                "sweep": points,
                "build_vectors_per_sec": round(build_vps, 1),
                "build_cold_vectors_per_sec": round(n / build_cold_s, 1),
                "n": n,
                "dims": d,
                "batch": q,
                "device": str(jax.devices()[0].platform),
            }
        )
    )


if __name__ == "__main__":
    main()
