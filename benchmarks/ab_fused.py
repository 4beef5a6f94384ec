"""A/B: Pallas gather-fused Hamming kernel vs the XLA cached path,
end-to-end QPS at real operating points (VERDICT r4 weak #1 — the kernel
shipped opt-in with only kernel-level receipts).

One process, one build: the flag is set BEFORE the first search so the
edge-code cache is built lane-padded once; both paths then serve from
the same padded cache (the XLA path slices after its gather, free), so
the A/B isolates the traversal kernel.  Median-of-5 per point per arm.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_fused.py
Env:  AB_N (default 100_000), AB_Q (default 4096).
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

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache_tpu")
)
# BEFORE jax/index import: the cache must be built lane-padded.
os.environ["PGVS_TPU_FUSED_GATHER"] = "1"


def _emit(obj):
    print(json.dumps(obj))
    sys.stdout.flush()


def main():
    n = int(os.environ.get("AB_N", 100_000))
    q = int(os.environ.get("AB_Q", 4096))
    k = 10

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_tpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pgvectorscale_tpu import (
        DiskannIndex,
        DistanceType,
        IndexConfig,
        QueryParams,
    )
    from pgvectorscale_tpu.io.datasets import synthetic_corpus
    from pgvectorscale_tpu.utils.sync import device_sync

    vectors, queries = synthetic_corpus("sift", n, q, seed=42)
    config = IndexConfig(num_dimensions=128, distance_type=DistanceType.L2)
    t0 = time.perf_counter()
    index = DiskannIndex.build(vectors, config, refine_passes=1)
    device_sync(index.arrays.adjacency)
    _emit({"config": "ab-fused", "n": n, "q": q,
           "build_seconds": round(time.perf_counter() - t0, 1)})

    points = [
        QueryParams(search_list_size=150, rescore=300, expand=2),
        QueryParams(search_list_size=200, rescore=1500, expand=2,
                    window_strategy="beam"),
    ]
    gt = None  # recall parity check between arms (identical results)
    for params in points:
        row = {"L": params.search_list_size, "rescore": params.rescore,
               "strategy": params.window_strategy}
        arm_ids = {}
        for arm, flag in (("fused", "1"), ("xla", "0")):
            os.environ["PGVS_TPU_FUSED_GATHER"] = flag
            index.search(queries, k=k, params=params)  # warm/compile
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                ids, _d = index.search(queries, k=k, params=params)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            row[f"{arm}_qps"] = round(q / ts[len(ts) // 2], 1)
            row[f"{arm}_qps_min"] = round(q / ts[-1], 1)
            row[f"{arm}_qps_max"] = round(q / ts[0], 1)
            arm_ids[arm] = np.asarray(ids)
        row["results_equal"] = bool(
            (arm_ids["fused"] == arm_ids["xla"]).all()
        )
        row["fused_speedup"] = round(row["fused_qps"] / row["xla_qps"], 3)
        _emit(row)


if __name__ == "__main__":
    main()
