"""Generate any MISSING historical-checkpoint fixtures.

The analog of the reference's upgrade tests, which build every released
version and verify `ALTER EXTENSION UPDATE` against it
(reference: pgvectorscale/tests/upgrade_test.rs:25-337).  Here every
checkpoint-format bump must leave a fixture behind:

- ``checkpoint_v1.npz``     — round-1 (version 1) format: no
  ``vector_dtype``/``build_distance`` config keys, f32 vectors only.
- ``checkpoint_v2.npz``     — round-2 (version 2) format.
- ``checkpoint_v3.npz``     — version 3 format (int8 tier: per-row
  ``vec_scales``, identity for an f32 index).  All fixtures hold the
  SAME index.
- ``expected.json``         — query results all fixtures must reproduce.

Run from the repo root on CPU:
    JAX_PLATFORMS=cpu python tests/fixtures/make_fixtures.py

Existing fixtures are FROZEN artifacts and are never overwritten — the
whole point is that old files keep loading.  At a format bump, add the
new version's synthesis rule below and re-run; only the new fixture is
written (from the frozen newest fixture, so the index content stays
identical across all versions).
"""

import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def fixture_data():
    """Deterministic tiny corpus + queries shared with test_upgrade.py."""
    rng = np.random.default_rng(1234)
    vectors = rng.standard_normal((64, 16)).astype(np.float32)
    queries = rng.standard_normal((8, 16)).astype(np.float32)
    return vectors, queries


def _path(version: int) -> str:
    return os.path.join(_HERE, f"checkpoint_v{version}.npz")


def _load(version: int) -> dict:
    with np.load(_path(version)) as z:
        return {k: z[k] for k in z.files}


def _write_if_missing(version: int, payload: dict) -> bool:
    path = _path(version)
    if os.path.exists(path):
        print(f"checkpoint_v{version}.npz exists — frozen, not rewritten")
        return False
    np.savez_compressed(path, **payload)
    print(f"wrote checkpoint_v{version}.npz")
    return True


def synth_v1_from_v2() -> dict:
    """Version 1 = version 2 minus the config keys round 2 added."""
    payload = _load(2)
    cfg = json.loads(bytes(payload["config"]).decode())
    cfg.pop("vector_dtype", None)
    cfg.pop("build_distance", None)
    payload["config"] = np.frombuffer(
        json.dumps(cfg).encode(), dtype=np.uint8
    )
    payload["version"] = np.int64(1)
    return payload


def synth_v3_from_v2() -> dict:
    """v3 added the int8-tier ``vec_scales`` array — identity for an f32
    index, the exact content a v2 index re-saved under v3 code holds."""
    payload = _load(2)
    payload["vec_scales"] = np.ones(
        len(payload["vectors"]), dtype=np.float32
    )
    payload["version"] = np.int64(3)
    return payload


def main():
    from pgvectorscale_tpu import (
        DiskannIndex,
        DistanceType,
        IndexConfig,
        QueryParams,
    )
    from pgvectorscale_tpu.config import CHECKPOINT_VERSION

    vectors, queries = fixture_data()

    # Bootstrap only: the v2 fixture is the frozen root all others are
    # synthesized from.  If it is missing entirely (fresh clone of the
    # fixtures dir), rebuild the index and save it under the CURRENT
    # format, then derive v2 — but never overwrite an existing file.
    if not os.path.exists(_path(2)):
        if CHECKPOINT_VERSION != 3:
            raise SystemExit(
                "checkpoint_v2.npz is missing and the current format is "
                f"v{CHECKPOINT_VERSION}; add a synthesis rule instead of "
                "rebuilding"
            )
        config = IndexConfig(
            num_dimensions=16,
            distance_type=DistanceType.L2,
            num_neighbors=10,
            search_list_size=16,
        )
        index = DiskannIndex.build(vectors, config)
        index.save(_path(CHECKPOINT_VERSION))  # native current format
        payload = _load(CHECKPOINT_VERSION)
        payload.pop("vec_scales", None)
        payload["version"] = np.int64(2)
        _write_if_missing(2, payload)

    _write_if_missing(1, synth_v1_from_v2())
    _write_if_missing(3, synth_v3_from_v2())

    expected_path = os.path.join(_HERE, "expected.json")
    if not os.path.exists(expected_path):
        index = DiskannIndex.load(_path(CHECKPOINT_VERSION))
        ids, dists = index.search(
            queries, k=5, params=QueryParams(search_list_size=32, rescore=16)
        )
        with open(expected_path, "w") as f:
            json.dump(
                {
                    "k": 5,
                    "search_list_size": 32,
                    "rescore": 16,
                    "ids": ids.tolist(),
                    "dists": [
                        [round(float(x), 5) for x in row] for row in dists
                    ],
                },
                f,
                indent=1,
            )
        print("wrote expected.json")
    print("fixtures up to date in", _HERE)


if __name__ == "__main__":
    main()
