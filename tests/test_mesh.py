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
