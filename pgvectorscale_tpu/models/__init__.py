"""Index model families.

The framework's "models" are its index types — the analog of the
reference's storage providers × deployment shapes:

- ``DiskannIndex``         — single-device HBM-resident index (SBQ or
                             plain storage; the SbqSpeedupStorage /
                             PlainStorage analog, storage.rs:144-169)
- ``ShardedDiskannIndex``  — row-sharded multi-chip index over a
                             jax.sharding.Mesh (the scale-out family)
- ``SearchIterator``       — streaming relaxed-order query surface

``create_index`` picks the family from the config + mesh.
"""

from ..index import DiskannIndex, SearchIterator
from ..parallel.sharded import ShardedDiskannIndex


def create_index(vectors, config, *, mesh=None, labels=None, **kw):
    """Build the right index family: sharded when a mesh is given."""
    if mesh is not None and mesh.devices.size > 1:
        return ShardedDiskannIndex.build(
            vectors, config, mesh, labels=labels, **kw
        )
    return DiskannIndex.build(vectors, config, labels=labels, **kw)


__all__ = [
    "DiskannIndex",
    "SearchIterator",
    "ShardedDiskannIndex",
    "create_index",
]
