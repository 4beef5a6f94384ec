"""Reachability-BFS strategies and the chain orphan repair.

The reference merely *warns* on orphaned inserts (graph/mod.rs:706-716)
and then test-asserts full reachability; we repair.  These tests pin the
two device BFS implementations (scatter-max push vs CSR sort+cumsum pull)
to the host ground truth and prove the chain repair's invariants:
full reachability after one call, no new orphans, bit-determinism, no-op
on healthy graphs, multi-round capture beyond the top_k width, and vmap
compatibility (the sharded build path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pgvectorscale_tpu.graph.build import (
    _REPAIR_CHAIN_MAX,
    _reachable_csr,
    _reachable_scatter,
    reachable_mask,
    reachable_on_device,
    repair_orphans_device,
)
from pgvectorscale_tpu.store import INVALID_ID, GraphArrays


def _mk(adj_np, count=None, start=0):
    cap, _ = adj_np.shape
    return GraphArrays(
        vectors=jnp.zeros((cap, 4), jnp.float32),
        codes=jnp.zeros((cap, 0), jnp.uint32),
        adjacency=jnp.asarray(adj_np, jnp.int32),
        node_labels=jnp.zeros((cap, 0), jnp.int32),
        deleted=jnp.zeros((cap,), jnp.bool_),
        count=jnp.asarray(cap if count is None else count, jnp.int32),
        default_start=jnp.asarray(start, jnp.int32),
        label_start_keys=jnp.zeros((8,), jnp.int32),
        label_start_ids=jnp.zeros((8,), jnp.int32),
        vec_scales=jnp.ones((cap,), jnp.float32),
    )


def _rand_graph(rng, n, r, p_invalid):
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    adj[rng.random((n, r)) < p_invalid] = INVALID_ID
    return adj


@pytest.mark.parametrize("n,r,p", [(257, 4, 0.3), (1024, 7, 0.6), (313, 2, 0.8)])
def test_bfs_strategies_match_host(n, r, p):
    rng = np.random.default_rng(n)
    adj = _rand_graph(rng, n, r, p)
    arrays = _mk(adj)
    want = reachable_mask(adj, 0, n)
    got_scatter = np.asarray(_reachable_scatter(arrays))
    got_csr = np.asarray(_reachable_csr(arrays))
    np.testing.assert_array_equal(got_scatter, want)
    np.testing.assert_array_equal(got_csr, want)


def test_bfs_respects_count_and_empty_start():
    rng = np.random.default_rng(0)
    adj = _rand_graph(rng, 64, 3, 0.2)
    # Rows beyond count are stale garbage and must not contribute.
    arrays = _mk(adj, count=40)
    want = reachable_mask(np.where(adj < 40, adj, INVALID_ID)[:40], 0, 40)
    for fn in (_reachable_scatter, _reachable_csr):
        got = np.asarray(fn(arrays))
        np.testing.assert_array_equal(got[:40], want)
        assert not got[40:].any()
    # Empty graph: start INVALID -> nothing reachable.
    empty = _mk(adj, count=0, start=INVALID_ID)
    for fn in (_reachable_scatter, _reachable_csr):
        assert not np.asarray(fn(empty)).any()


def _assert_fully_reachable(arrays):
    adj = np.asarray(arrays.adjacency)
    n = int(arrays.count)
    seen = reachable_mask(adj[:n], int(arrays.default_start), n)
    assert seen.all(), f"{(~seen).sum()} orphans remain"


def test_chain_repair_fixes_random_orphans():
    rng = np.random.default_rng(1)
    n, r = 400, 6
    adj = _rand_graph(rng, n, r, 0.3)
    # Orphan 30 random nodes: remove every in-edge they have.
    orphans = rng.choice(np.arange(1, n), size=30, replace=False)
    adj[np.isin(adj, orphans)] = INVALID_ID
    before = reachable_mask(adj, 0, n)
    assert not before.all()
    repaired = repair_orphans_device(_mk(adj))
    _assert_fully_reachable(repaired)


def test_chain_repair_fixes_islands():
    # Two disjoint cycles plus a reachable core: islands must attach.
    n, r = 128, 4
    adj = np.full((n, r), INVALID_ID, np.int32)
    adj[:100, 0] = (np.arange(100) + 1) % 100  # core ring, start=0
    adj[100:110, 0] = 100 + (np.arange(10) + 1) % 10  # island 1
    adj[110:128, 0] = 110 + (np.arange(18) + 1) % 18  # island 2
    repaired = repair_orphans_device(_mk(adj))
    _assert_fully_reachable(repaired)


def test_chain_repair_noop_when_healthy():
    n, r = 200, 5
    adj = np.full((n, r), INVALID_ID, np.int32)
    adj[:, 0] = (np.arange(n) + 1) % n
    arrays = _mk(adj)
    repaired = repair_orphans_device(arrays)
    np.testing.assert_array_equal(
        np.asarray(repaired.adjacency), adj
    )


def test_chain_repair_deterministic():
    rng = np.random.default_rng(2)
    adj = _rand_graph(rng, 300, 4, 0.55)
    a = np.asarray(repair_orphans_device(_mk(adj)).adjacency)
    b = np.asarray(repair_orphans_device(_mk(adj.copy())).adjacency)
    np.testing.assert_array_equal(a, b)


def test_chain_repair_preserves_reachable_set():
    """Nothing reachable before the repair may become unreachable."""
    rng = np.random.default_rng(3)
    n = 500
    adj = _rand_graph(rng, n, 5, 0.5)
    before = reachable_mask(adj, 0, n)
    repaired = repair_orphans_device(_mk(adj))
    after = reachable_mask(np.asarray(repaired.adjacency), 0, n)
    assert after.all()
    assert (after | ~before).all()  # superset (trivially, but explicit)


def test_chain_repair_multi_round_beyond_topk_width():
    """More orphans than the top_k capture width forces multiple rounds."""
    n = _REPAIR_CHAIN_MAX + 900
    r = 3
    adj = np.full((n, r), INVALID_ID, np.int32)
    adj[:40, 0] = (np.arange(40) + 1) % 40  # tiny reachable core
    # every other node is an isolated orphan (no in-edges at all)
    repaired = repair_orphans_device(_mk(adj))
    _assert_fully_reachable(repaired)


def test_chain_repair_vmapped_shards():
    rng = np.random.default_rng(4)
    shards = []
    for s in range(4):
        adj = _rand_graph(rng, 160, 4, 0.6)
        shards.append(_mk(adj, start=s))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *shards)
    repaired = jax.vmap(repair_orphans_device)(stacked)
    for s in range(4):
        one = jax.tree.map(lambda x: x[s], repaired)
        _assert_fully_reachable(one)


def test_reachable_on_device_dispatcher_matches():
    rng = np.random.default_rng(5)
    adj = _rand_graph(rng, 222, 4, 0.4)
    arrays = _mk(adj)
    got = np.asarray(reachable_on_device(arrays))
    np.testing.assert_array_equal(got, reachable_mask(adj, 0, 222))
