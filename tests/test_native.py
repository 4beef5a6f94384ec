"""Native host-runtime tests: C++ routines vs NumPy reference."""

import numpy as np
import pytest

from pgvectorscale_tpu import native


def _random_adj(rng, n=200, r=8, p_valid=0.6):
    adj = rng.integers(0, n, size=(n, r)).astype(np.int32)
    mask = rng.random((n, r)) > p_valid
    adj[mask] = -1
    return adj


def test_native_library_builds():
    assert native.available(), "g++ toolchain present; library must build"


def test_bfs_matches_python(rng):
    adj = _random_adj(rng)
    n = adj.shape[0]
    seen_native = native.bfs_reachable(adj, 0)

    # Python reference BFS.
    from collections import deque

    seen = np.zeros(n, dtype=bool)
    seen[0] = True
    dq = deque([0])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v >= 0 and not seen[v]:
                seen[v] = True
                dq.append(int(v))
    np.testing.assert_array_equal(seen_native, seen)


def test_repair_orphans_connects_everything(rng):
    if not native.available():
        pytest.skip("native library unavailable")
    n, r = 300, 6
    adj = _random_adj(rng, n=n, r=r, p_valid=0.3)
    # Disconnect a chunk entirely.
    adj[200:250] = -1
    forced = native.repair_orphans_inplace(adj, 0)
    assert forced > 0
    seen = native.bfs_reachable(adj, 0)
    assert seen.all(), f"{(~seen).sum()} nodes still unreachable"


def test_degrees(rng):
    adj = _random_adj(rng)
    np.testing.assert_array_equal(
        native.degrees(adj), (adj != -1).sum(axis=1)
    )
    valid = adj[adj >= 0]
    np.testing.assert_array_equal(
        native.in_degrees(adj),
        np.bincount(valid, minlength=adj.shape[0]),
    )


def test_csr_roundtrip(rng):
    adj = _random_adj(rng)
    indptr, indices = native.to_csr(adj)
    assert indptr[-1] == (adj != -1).sum()
    for i in range(adj.shape[0]):
        row = adj[i][adj[i] != -1]
        np.testing.assert_array_equal(
            indices[indptr[i] : indptr[i + 1]], row
        )
