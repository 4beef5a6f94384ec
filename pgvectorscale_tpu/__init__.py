"""pgvectorscale_tpu — TPU-native StreamingDiskANN vector index framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
timescale/pgvectorscale (the `diskann` Postgres index extension):

- StreamingDiskANN / Vamana graph index with streaming queries, inserts,
  and delete/compaction
- Statistical Binary Quantization (1-2 bits/dim) with Hamming search and
  full-precision rescoring
- Label-based filtered search with per-label start nodes
- Device-mesh parallel build and query sharding (the TPU analog of the
  reference's parallel index build)

The reference is a CPU/Postgres storage engine; this framework keeps the
index resident in HBM as flat sharded tensors and batches thousands of
queries per device step.
"""

from .config import (
    DistanceType,
    IndexConfig,
    QueryParams,
    StorageLayout,
)


def __getattr__(name):
    # Lazy import: keeps `import pgvectorscale_tpu.config` cheap and avoids
    # importing jax-heavy modules until the index API is actually used.
    if name in ("DiskannIndex", "SearchIterator"):
        from . import index as _index

        return getattr(_index, name)
    if name == "ShardedDiskannIndex":
        from .parallel.sharded import ShardedDiskannIndex

        return ShardedDiskannIndex
    if name == "create_index":
        from .models import create_index

        return create_index
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__version__ = "0.1.0"

__all__ = [
    "DiskannIndex",
    "DistanceType",
    "IndexConfig",
    "QueryParams",
    "SearchIterator",
    "ShardedDiskannIndex",
    "StorageLayout",
    "create_index",
]
