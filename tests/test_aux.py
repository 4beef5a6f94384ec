"""Auxiliary-subsystem tests: progress phases, cost estimate, checkpoint
migration guard, streaming stats, CLI, datasets IO, debug helpers."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams
from pgvectorscale_tpu.io.datasets import (
    read_fvecs,
    read_ivecs,
    synthetic_corpus,
    write_fvecs,
)


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(5)
    basis = rng.standard_normal((24, 48)).astype(np.float32)
    vectors = rng.standard_normal((400, 24)).astype(np.float32) @ basis
    config = IndexConfig(
        num_dimensions=48,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
    )
    return DiskannIndex.build(vectors, config), vectors


def test_build_progress_phases(rng):
    vectors = rng.standard_normal((300, 16)).astype(np.float32)
    phases = []
    DiskannIndex.build(
        vectors,
        IndexConfig(
            num_dimensions=16,
            distance_type=DistanceType.L2,
            num_neighbors=10,
            search_list_size=16,
        ),
        progress_callback=lambda phase, done, total: phases.append(
            (phase, done, total)
        ),
    )
    names = [p[0] for p in phases]
    # The reference's three phases (ambuildphasename, build.rs:1154-1166).
    assert "training quantizer" in names
    assert "inserting tuples" in names
    assert "finalizing graph" in names
    insert_progress = [p[1] for p in phases if p[0] == "inserting tuples"]
    assert insert_progress[-1] == 300
    assert insert_progress == sorted(insert_progress)


def test_cost_estimate(small_index):
    index, _ = small_index
    est = index.estimate_query_cost(QueryParams(search_list_size=32))
    assert est["expected_node_visits"] > 0
    assert est["expected_distance_comparisons"] >= est["expected_node_visits"]
    assert est["estimated_rows"] >= 1


def test_checkpoint_rejects_unknown_future_version(tmp_path, small_index):
    index, _ = small_index
    path = str(tmp_path / "idx.npz")
    index.save(path)
    # Tamper: bump version beyond supported.
    data = dict(np.load(path))
    data["version"] = np.int64(999)
    np.savez_compressed(path, **data)
    with pytest.raises(ValueError, match="newer than supported"):
        DiskannIndex.load(path)


def test_streaming_stats_populated(small_index):
    index, vectors = small_index
    it = index.search_iter(
        vectors[0], QueryParams(search_list_size=32, rescore=20)
    )
    it.next_batch(10)
    assert it.max_distance > 0.0
    assert it.stats_count > 0


def test_fvecs_roundtrip(tmp_path, rng):
    mat = rng.standard_normal((20, 7)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    write_fvecs(path, mat)
    back = read_fvecs(path)
    np.testing.assert_array_equal(back, mat)
    assert read_fvecs(path, max_rows=5).shape == (5, 7)


def test_ivecs_read(tmp_path):
    mat = np.arange(12, dtype=np.int32).reshape(3, 4)
    out = np.empty((3, 5), dtype=np.int32)
    out[:, 0] = 4
    out[:, 1:] = mat
    path = str(tmp_path / "x.ivecs")
    out.tofile(path)
    np.testing.assert_array_equal(read_ivecs(path), mat)


def test_synthetic_corpora():
    for kind, d in [("sift", 128), ("glove", 100), ("cohere", 768),
                    ("gauss", 128)]:
        base, queries = synthetic_corpus(kind, 50, 5)
        assert base.shape == (50, d)
        assert queries.shape == (5, d)
    with pytest.raises(ValueError):
        synthetic_corpus("nope", 10, 2)


def test_debug_helpers(small_index):
    from pgvectorscale_tpu.debug import (
        count_reachable_nodes,
        degree_histogram,
        to_graphviz,
    )

    index, _ = small_index
    assert count_reachable_nodes(index) == index.count
    hist = degree_histogram(index)
    assert hist["orphans"] == 0
    dot = to_graphviz(index, max_nodes=20)
    assert dot.startswith("digraph") and "->" in dot


def test_build_logging(rng, caplog):
    """Observability parity: build parameters are noticed (build.rs:307-313)
    and completion is reported."""
    import logging

    from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig

    vectors = rng.standard_normal((120, 16)).astype("float32")
    with caplog.at_level(logging.INFO, logger="pgvectorscale_tpu"):
        DiskannIndex.build(
            vectors,
            IndexConfig(
                num_dimensions=16,
                distance_type=DistanceType.L2,
                num_neighbors=10,
                search_list_size=16,
            ),
        )
    text = caplog.text
    assert "building index: 120 vectors" in text
    assert "index build complete" in text


def test_query_stats_debug_dump(small_index, caplog):
    """Opt-in per-query stats dump (amendscan debug1, scan.rs:439-476)."""
    import logging

    import numpy as np

    index, vectors = small_index
    with caplog.at_level(logging.DEBUG, logger="pgvectorscale_tpu"):
        index.search(vectors[:2], k=3)
    assert "query stats" in caplog.text


def test_cli_bench_smoke(tmp_path):
    """CLI end-to-end smoke via subprocess (build -> info -> search)."""
    from pgvectorscale_tpu.io.datasets import synthetic_corpus, write_fvecs

    base, queries = synthetic_corpus("glove", 300, 4, seed=1)
    bp, qp = str(tmp_path / "b.fvecs"), str(tmp_path / "q.fvecs")
    write_fvecs(bp, base)
    write_fvecs(qp, queries)
    idx = str(tmp_path / "i.npz")
    env = {
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "PYTHONPATH": "/root/repo",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/pgvs_tpu_jax_cache",
    }
    r = subprocess.run(
        [sys.executable, "-m", "pgvectorscale_tpu.cli", "build", bp,
         "-o", idx, "--distance", "cosine", "--num-neighbors", "16",
         "--search-list-size", "32"],
        capture_output=True, text=True, timeout=560, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["built"] == 300

    r = subprocess.run(
        [sys.executable, "-m", "pgvectorscale_tpu.cli", "info", idx],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout)
    assert info["reachable"] == 300

    r = subprocess.run(
        [sys.executable, "-m", "pgvectorscale_tpu.cli", "search", idx, qp,
         "-k", "3", "--show", "1"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    first = json.loads(r.stdout.strip().splitlines()[0])
    assert len(first["ids"]) == 3


def test_profiler_trace(tmp_path, rng):
    """jax.profiler hook (SURVEY.md §5 tracing parity): the trace context
    captures a device profile viewable in TensorBoard/XProf."""
    import jax.numpy as jnp

    from pgvectorscale_tpu.stats import profiler_trace

    logdir = str(tmp_path / "trace")
    with profiler_trace(logdir):
        jnp.dot(
            jnp.ones((128, 128)), jnp.ones((128, 128))
        ).block_until_ready()
    prof = os.path.join(logdir, "plugins", "profile")
    assert os.path.isdir(prof) and os.listdir(prof)


def test_auto_visit_factor_resolution():
    """visit_factor=0 (default) resolves against index depth: 1.0 up to
    100k live rows, then 1 + log10(N/1e5) quantized to 0.25 steps and
    clamped at 2.0 (the 1M operating points needed vf=2 — a fixed 1.0
    default silently under-visited deep graphs)."""
    import pytest

    auto = QueryParams()
    assert auto.visit_factor == 0.0
    assert auto.effective_visit_factor(1_000) == 1.0
    assert auto.effective_visit_factor(100_000) == 1.0
    # quantized intermediate step, monotone in N
    mid = auto.effective_visit_factor(300_000)
    assert 1.0 < mid < 2.0 and (4 * mid) == int(4 * mid)
    assert auto.effective_visit_factor(1_000_000) == 2.0
    assert auto.effective_visit_factor(50_000_000) == 2.0  # clamped
    # explicit values pass through untouched at any depth
    assert QueryParams(visit_factor=1.0).effective_visit_factor(10**7) == 1.0
    with pytest.raises(ValueError):
        QueryParams(visit_factor=0.1)
