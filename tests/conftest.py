"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing multi-process behavior on a
single box (SURVEY.md §4): multi-chip sharding is validated on
xla_force_host_platform_device_count=8 CPU devices.
"""

import os

# PGVS_TPU_RUN_TPU_TESTS=1 opts the session onto the real chip for the
# TPU-only Mosaic tests (tests/test_pallas_tpu.py); everything else runs
# on the virtual CPU mesh.
_TPU_SESSION = os.environ.get("PGVS_TPU_RUN_TPU_TESTS") == "1"

if not _TPU_SESSION:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not honored when a TPU plugin (axon) is present;
# the config update is authoritative and must run before first backend use.
if not _TPU_SESSION:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the test suite compiles many (shape, static
# arg) variants of the search/prune kernels; caching them across runs cuts
# suite time dramatically.
jax.config.update("jax_compilation_cache_dir", "/tmp/pgvs_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Release live executables/arrays after each test module.

    A full-suite process otherwise accumulates 100+ compiled programs and
    ~20 GB of cached buffers, and jaxlib 0.9.0's CPU client becomes
    unstable in that state (segfaults inside compile/cache-serialization
    paths late in the run — reproduced with the native library disabled,
    MALLOC_CHECK_, a large stack, and single-threaded codegen, so it is
    not our code's memory error).  The on-disk compilation cache makes
    the subsequent re-loads cheap."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
