"""Crash-consistent durability tests (durability.py — GenericXLog analog).

The reference gets abort-safety from Postgres WAL (every page write is
journaled, page.rs:113-124,236-245); here the journal records add/delete
HOST inputs before device mutation, and load() replays them.  The key
test kills a real process with SIGKILL after un-checkpointed mutations
and verifies recovery reproduces the exact index state.
"""

import os
import signal
import subprocess
import sys

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig, QueryParams

_D = 32


def _config():
    return IndexConfig(
        num_dimensions=_D,
        distance_type=DistanceType.L2,
        num_neighbors=16,
        search_list_size=32,
    )


def _corpus(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, _D)).astype(
        np.float32
    )


# Child workload: build -> enable_durability -> add -> delete -> SIGKILL.
# Deterministic (seeded) so the parent can rebuild the expected state.
_CHILD = """
import os, signal, sys
import numpy as np
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pgvs_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from pgvectorscale_tpu import DiskannIndex, DistanceType, IndexConfig

vectors = np.random.default_rng(0).standard_normal((240, 32)).astype(
    np.float32
)
config = IndexConfig(num_dimensions=32, distance_type=DistanceType.L2,
                     num_neighbors=16, search_list_size=32)
index = DiskannIndex.build(vectors[:200], config)
index.enable_durability({path!r})
index.add(vectors[200:220])
index.delete(np.arange(5, dtype=np.int32))
index.add(vectors[220:240])
sys.stdout.write("mutated\\n")
sys.stdout.flush()
os.kill(os.getpid(), signal.SIGKILL)  # crash WITHOUT saving
"""


def test_kill9_recovers_all_committed_mutations(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = str(tmp_path / "durable.npz")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=repo, path=path)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
    assert "mutated" in proc.stdout

    # Recover: checkpoint + journal replay must reproduce the exact state
    # the crashed process had (the suite's determinism invariant makes the
    # replayed index bit-identical to the original mutation sequence).
    recovered = DiskannIndex.load(path)
    vectors = _corpus(240)
    expected = DiskannIndex.build(vectors[:200], _config())
    expected.add(vectors[200:220])
    expected.delete(np.arange(5, dtype=np.int32))
    expected.add(vectors[220:240])

    assert recovered.num_live == expected.num_live == 235
    params = QueryParams(search_list_size=48, rescore=64)
    qs = vectors[100:140]
    ids_r, d_r = recovered.search(qs, k=10, params=params)
    ids_e, d_e = expected.search(qs, k=10, params=params)
    np.testing.assert_array_equal(np.asarray(ids_r), np.asarray(ids_e))
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_e), rtol=0,
                               atol=0)
    # Deleted rows stay deleted through recovery.
    ids, _ = recovered.search(vectors[:5], k=1, params=params)
    assert not (set(int(i) for i in ids[:, 0]) & set(range(5)))


def test_save_truncates_journal(tmp_path):
    path = str(tmp_path / "ck.npz")
    vectors = _corpus(200, seed=1)
    index = DiskannIndex.build(vectors[:150], _config())
    index.enable_durability(path)
    index.add(vectors[150:180])
    index.delete(np.arange(3, dtype=np.int32))
    assert len(index._journal) == 2
    index.checkpoint()
    assert len(index._journal) == 0
    # Post-checkpoint mutations journal afresh and replay on load.
    index.add(vectors[180:200])
    assert len(index._journal) == 1
    loaded = DiskannIndex.load(path)
    assert loaded.num_live == index.num_live == 197


def test_auto_checkpoint_every_bounds_replay(tmp_path):
    path = str(tmp_path / "auto.npz")
    vectors = _corpus(300, seed=2)
    index = DiskannIndex.build(vectors[:200], _config())
    index.enable_durability(path, auto_checkpoint_every=30)
    index.add(vectors[200:220])  # 20 pending, below threshold
    assert len(index._journal) == 1
    index.add(vectors[220:240])  # 40 >= 30 -> consolidates
    assert len(index._journal) == 0
    assert index._dur_pending == 0
    loaded = DiskannIndex.load(path)
    assert loaded.num_live == 240


def test_journal_detached_after_plain_load(tmp_path):
    """load() replays but does not silently keep journaling; a fresh
    enable_durability consolidates and reattaches."""
    path = str(tmp_path / "plain.npz")
    vectors = _corpus(160, seed=3)
    index = DiskannIndex.build(vectors[:150], _config())
    index.enable_durability(path)
    index.add(vectors[150:])
    loaded = DiskannIndex.load(path)
    assert loaded._journal is None
    loaded.enable_durability(path)
    assert len(loaded._journal) == 0  # consolidated into the checkpoint
    assert DiskannIndex.load(path).num_live == 160


def test_corrupt_journal_record_rejected(tmp_path):
    path = str(tmp_path / "bad.npz")
    vectors = _corpus(150, seed=4)
    index = DiskannIndex.build(vectors, _config())
    index.enable_durability(path)
    index.add(_corpus(8, seed=5))
    rec = os.path.join(path + ".journal", sorted(
        os.listdir(path + ".journal"))[0])
    with open(rec, "wb") as f:
        np.savez_compressed(f, magic=np.int64(0),
                            op=np.frombuffer(b"add", dtype=np.uint8))
    with pytest.raises(ValueError, match="corrupt journal record"):
        DiskannIndex.load(path)


def test_sharded_durability_roundtrip(tmp_path):
    """Durability on the sharded class: journal add/delete_external, crash
    (simulated by dropping the object), replay on load reproduces state."""
    import jax

    from pgvectorscale_tpu.parallel.multihost import global_mesh
    from pgvectorscale_tpu.parallel.sharded import ShardedDiskannIndex

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = global_mesh(n_devices=8)
    path = str(tmp_path / "shards.npz")
    vectors = _corpus(320, seed=9)
    index = ShardedDiskannIndex.build(vectors[:256], _config(), mesh=mesh)
    index.enable_durability(path)
    index.add(vectors[256:320])
    index.delete_external(np.arange(10, dtype=np.int64))
    assert len(index._journal) == 2
    del index  # "crash": journal + checkpoint are all that survives

    recovered = ShardedDiskannIndex.load(path, mesh)
    expected = ShardedDiskannIndex.build(vectors[:256], _config(), mesh=mesh)
    expected.add(vectors[256:320])
    expected.delete_external(np.arange(10, dtype=np.int64))
    assert recovered.num_live == expected.num_live == 310
    params = QueryParams(search_list_size=48, rescore=64)
    ids_r, _ = recovered.search(vectors[:32], k=5, params=params)
    ids_e, _ = expected.search(vectors[:32], k=5, params=params)
    np.testing.assert_array_equal(
        recovered.to_external(np.asarray(ids_r)),
        expected.to_external(np.asarray(ids_e)),
    )
