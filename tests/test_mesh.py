"""Device-mesh parallelism tests.

The analog of the reference's multi-process tests run on one box
(SURVEY.md §4 carry-over): an 8-device virtual CPU mesh validates that
sharded execution is numerically identical to single-device execution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig
from pgvectorscale_tpu.ops import sbq
from pgvectorscale_tpu.parallel.mesh import (
    build_wave_step,
    make_mesh,
    sharded_build_step,
    sharded_search,
)
from pgvectorscale_tpu.graph.prune import alpha_schedule


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(3)
    n, d = 256, 32
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
    )
    return DiskannIndex.build(vectors, config), rng


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8


def test_sharded_search_matches_single_device(small_index):
    index, rng = small_index
    config = index.config
    mesh = make_mesh(8)
    q = 16
    queries = jnp.asarray(
        rng.standard_normal((q, config.num_dimensions)).astype(np.float32)
    )
    qc = sbq.encode(queries, index.sbq_stats, config.bits_per_dimension)
    starts = jnp.broadcast_to(
        index.arrays.default_start[None, None], (q, 1)
    ).astype(jnp.int32)
    kwargs = dict(
        search_list_size=16,
        max_iters=32,
        distance_type=config.distance_type,
        use_codes=True,
        filtered=False,
    )
    from pgvectorscale_tpu.graph.search import beam_search

    res_single = beam_search(
        index.arrays, queries, qc, jnp.zeros((q, 0), jnp.int32), starts,
        **kwargs,
    )
    res_mesh = sharded_search(
        mesh, index.arrays, queries, qc, jnp.zeros((q, 0), jnp.int32),
        starts, **kwargs,
    )
    np.testing.assert_array_equal(
        np.asarray(res_single.beam_ids), np.asarray(res_mesh.beam_ids)
    )
    np.testing.assert_allclose(
        np.asarray(res_single.beam_dists),
        np.asarray(res_mesh.beam_dists),
        rtol=1e-6,
    )


def test_sharded_build_step_matches_single_device(small_index):
    index, rng = small_index
    config = index.config
    mesh = make_mesh(8)
    wave = jnp.asarray(np.arange(32, 48, dtype=np.int32))

    single = build_wave_step(
        index.arrays,
        wave,
        search_list_size=config.search_list_size,
        max_iters=24,
        distance_type=config.distance_type,
        use_codes=config.build_traversal_uses_codes,
        prune_use_codes=config.build_prune_uses_codes,
        alphas=alpha_schedule(config.max_alpha),
        num_neighbors=config.num_neighbors,
        r_max=config.max_neighbors_during_build,
        code_bits=config.dims_to_index * config.bits_per_dimension,
    )
    sharded = sharded_build_step(
        mesh, index.arrays, wave, config, max_iters=24
    )
    np.testing.assert_array_equal(
        np.asarray(single.adjacency), np.asarray(sharded.adjacency)
    )


def test_multihost_degenerate_single_process(monkeypatch):
    """The multi-host code path (parallel/multihost.py) at world size 1:
    initialize_from_env is a no-op, global_mesh spans the local devices,
    hybrid_mesh degenerates to [1, local] — and a ShardedDiskannIndex
    built on the global mesh searches correctly.  (A real multi-process
    world cannot run in this environment; this pins the degenerate path
    and the env contract.)"""
    from pgvectorscale_tpu import QueryParams
    from pgvectorscale_tpu.parallel import multihost
    from pgvectorscale_tpu.parallel.sharded import ShardedDiskannIndex

    monkeypatch.delenv(multihost.COORDINATOR_ENV, raising=False)
    assert multihost.initialize_from_env() is False
    assert multihost.world() == (0, 1)

    mesh = multihost.global_mesh(n_devices=8)
    assert mesh.devices.size == 8 and mesh.axis_names == ("n",)
    hy = multihost.hybrid_mesh()
    assert hy.axis_names == ("host", "q") and hy.devices.shape[0] == 1

    rng = np.random.default_rng(11)
    n, d = 512, 32
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = IndexConfig(
        num_dimensions=d,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
    )
    index = ShardedDiskannIndex.build(vectors, config, mesh=mesh)
    qs = vectors[:16]
    ids, _ = index.search(qs, k=1, params=QueryParams(search_list_size=32,
                                                      rescore=32))
    ext = index.to_external(np.asarray(ids))
    assert [int(i) for i in ext[:, 0]] == list(range(16))


def test_multihost_initialize_env_contract(monkeypatch):
    """With the env set to a >1 world, initialize_from_env must route to
    jax.distributed.initialize with exactly the env's values (stubbed —
    a second process cannot exist here)."""
    from pgvectorscale_tpu.parallel import multihost

    calls = {}

    def fake_init(coordinator_address, num_processes, process_id):
        calls.update(addr=coordinator_address, num=num_processes,
                     pid=process_id)

    monkeypatch.setenv(multihost.COORDINATOR_ENV, "10.0.0.1:8476")
    monkeypatch.setenv(multihost.NUM_PROCESSES_ENV, "4")
    monkeypatch.setenv(multihost.PROCESS_ID_ENV, "2")
    monkeypatch.setattr(multihost.jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(multihost, "_INITIALIZED", False)
    assert multihost.initialize_from_env() is True
    assert calls == {"addr": "10.0.0.1:8476", "num": 4, "pid": 2}
    # Idempotent: a second call does not re-initialize.
    calls.clear()
    assert multihost.initialize_from_env() is True
    assert calls == {}
